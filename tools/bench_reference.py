"""Measure the bug-patched reference's torch training throughput on this host
(CPU — no NVIDIA hardware exists in this environment; the reference published
no throughput at all, BASELINE.md). Writes bench_baseline.json consumed by
bench.py's vs_baseline ratio.

Run once: python tools/bench_reference.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, "/root/reference/src")


class _HubStub:
    def state_dict(self):
        return {}


torch.hub.load = lambda *a, **k: _HubStub()

from model import SSD  # noqa: E402


def patched_forward(self, x):
    """B1-fixed dispatch (see tools/gen_goldens.py)."""
    n = x.size(0)
    ys = []
    x = self.normalize(x)
    for name, layer in self.features.items():
        x = layer(x)
        det = name.replace("act", "det")
        if name.startswith("act") and det in self.detectors:
            ys.append(self.detectors[det](x).permute(0, 2, 3, 1).reshape(n, -1, self.num_classes + 4))
    return torch.cat(ys, dim=1)


SSD.forward = patched_forward


def main(batch_size=8, warmup=1, iters=3):
    torch.manual_seed(0)
    net = SSD(num_classes=21)
    net.train()
    defaults = net.default_bboxes
    optimizer = torch.optim.Adam(net.train_params(), lr=1e-3, weight_decay=5e-4)

    rng = np.random.default_rng(0)
    images = torch.from_numpy(rng.uniform(0, 1, (batch_size, 3, 300, 300)).astype(np.float32))
    targets = np.zeros((batch_size, 6, 25), np.float32)
    for i in range(batch_size):
        targets[i, :3, :2] = rng.uniform(0.2, 0.8, (3, 2))
        targets[i, :3, 2:4] = rng.uniform(0.1, 0.4, (3, 2))
        targets[i, np.arange(3), 4 + rng.integers(1, 21, 3)] = 1.0
    targets = torch.from_numpy(targets)

    def step():
        optimizer.zero_grad()
        out = net(images)
        loss = net.loss(out, targets, defaults)
        loss.backward()
        optimizer.step()
        return float(loss)

    for _ in range(warmup):
        loss = step()
    t0 = time.time()
    for _ in range(iters):
        loss = step()
    dt = time.time() - t0
    ips = batch_size * iters / dt
    print(f"reference torch-CPU: {ips:.2f} images/sec (bs={batch_size}, loss={loss:.3f})")

    out = {
        "torch_cpu_images_per_sec": round(ips, 3),
        "note": (
            "bug-patched reference (B1 fixed) full train step, torch CPU on this host; "
            "the reference published no throughput and no NVIDIA hardware exists here"
        ),
        "batch_size": batch_size,
        "host_cpus": __import__("os").cpu_count(),
        "torch": torch.__version__,
    }
    with open(REPO / "bench_baseline.json", "w") as f:
        json.dump(out, f, indent=4)
    print("wrote bench_baseline.json")


if __name__ == "__main__":
    main()
