"""bf16 accuracy-budget pin: the flagship bfloat16 compute path must stay
inside its measured drift envelope vs the f32 reference trajectory.

The CLIs default to --dtype bfloat16 (cli/common.py) while the reference
trains pure f32 torch (reference: src/train.py:97-124 — no AMP anywhere).
tools/bf16_budget.py measured the budget on both backends (BF16_BUDGET.json
for TPU, and the CPU numbers this test pins):

  CPU, 20-step trajectory, bs4 — f32 replay max rel loss drift 3.8e-4;
  bf16 replay max rel loss drift 3.5e-3, post-training eval-mode forward
  max-abs 0.169 / mean 0.032 against the torch golden logits.

This test replays the golden with dtype=bfloat16 (params f32, compute bf16 —
the flagship recipe) and asserts within ~5x headroom of those measurements,
so a regression in the bf16 path (a careless cast, an f32 op silently
dropped to bf16 accumulation, a BN-stats dtype change) fails CI while
ordinary cross-version jitter does not. The f32 arm is pinned far tighter by
tests/test_trajectory.py; this file owns only the reduced-precision budget.
"""

import numpy as np
import pytest

from tools.bf16_budget import drift_row, replay

# Measured on XLA:CPU (tools/bf16_budget.py, /tmp/bf16_cpu.json, round 4):
# max rel drift 3.5e-3 @ step 5, eval maxabs 0.169, eval mean 0.032.
BF16_MAX_LOSS_DRIFT = 0.02
BF16_EVAL_FWD_MAXABS = 0.6
BF16_EVAL_FWD_MEAN = 0.1


@pytest.mark.slow
def test_bf16_trajectory_within_budget(goldens):
    import jax.numpy as jnp

    g = goldens("train_trajectory")
    losses, out_eval = replay(g, jnp.bfloat16)
    rel, row = drift_row(losses, g["losses"])

    assert np.isfinite(losses).all(), "bf16 trajectory produced non-finite losses"
    assert rel.max() < BF16_MAX_LOSS_DRIFT, (
        f"bf16 loss drift {rel.max():.2e} (step {rel.argmax() + 1}) exceeds the "
        f"documented budget {BF16_MAX_LOSS_DRIFT:.0e}; measured baseline was 3.5e-3 — "
        "a bf16-path regression, see BF16_BUDGET.json provenance")

    ev = np.abs(out_eval - g["out_eval_after"])
    assert float(ev.max()) < BF16_EVAL_FWD_MAXABS, f"eval-fwd maxabs {ev.max():.3f}"
    assert float(ev.mean()) < BF16_EVAL_FWD_MEAN, f"eval-fwd mean {ev.mean():.4f}"
