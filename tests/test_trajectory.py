"""Cross-framework TRAINING-TRAJECTORY parity vs the executed reference.

tools/gen_goldens.py ran the bug-patched reference's full train step — Adam over
`train_params()` + per-epoch ExponentialLR (reference: src/train.py:97-124,154;
src/model/ssd.py:181-328) — for 20 steps on deterministic synthetic batches from
kaiming-scaled weights. This test replays the IDENTICAL run through this
framework's Trainer/TrainState/adam_torch stack and pins:

  - the per-step loss sequence (the training signal itself),
  - the per-step learning rates (schedule semantics),
  - step-0 gradient fingerprints (backward parity through all 51 modules),
  - final trainable-param fingerprints (20-step param-space agreement),
  - final BatchNorm running-stat fingerprints + a post-training eval-mode
    forward (BN momentum trajectory).

This is the strongest available proxy for full-dataset mAP parity in a VOC-less
environment: every numeric component the published 0.314 run exercised is
composed here for 20 real optimizer steps.

Drift budget (documented, see assertions): single-step forward parity on this
weight regime is ~3e-6 (test_models.py pinned golden); backward+Adam compose
and the divergence grows multiplicatively with steps. Measured headroom is
>10x under every tolerance below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_torch2_tpu.core.anchors import default_boxes
from object_detection_torch2_tpu.core.multibox import multibox_loss
from object_detection_torch2_tpu.models.convert import ssd_variables_from_torch
from object_detection_torch2_tpu.models.ssd import SSD
from object_detection_torch2_tpu.train.optimizer import adam_torch, exponential_epoch_schedule
from object_detection_torch2_tpu.train.state import TrainState, merge_params
from object_detection_torch2_tpu.train.trainer import Trainer
from object_detection_torch2_tpu.utils.testing import (
    fingerprint_tree,
    synth_scaled_state_dict_from_manifest,
    synth_trajectory_batch,
)


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def trajectory(goldens):
    """Replay the golden run through Trainer; return (golden, per-step losses,
    step-0 grads, final state)."""
    g = goldens("train_trajectory")
    steps, spe, bs = int(g["steps"]), int(g["steps_per_epoch"]), int(g["bs"])
    sd = synth_scaled_state_dict_from_manifest(g["manifest_keys"], g["manifest_shapes"])
    variables = jax.tree.map(jnp.asarray, ssd_variables_from_torch(sd))

    model = SSD(num_classes=21)
    df = jnp.asarray(default_boxes())
    tx = adam_torch(
        exponential_epoch_schedule(float(g["lr"]), float(g["gamma"]), spe),
        weight_decay=float(g["weight_decay"]),
    )
    trainer = Trainer(model, loss_kind="multibox", default_boxes=df)
    state = TrainState.create(variables, tx, SSD.is_trainable)

    # step-0 gradients through the identical loss (bisection aid)
    images0, targets0 = synth_trajectory_batch(0, n=bs)
    x0, t0 = jnp.asarray(_nchw_to_nhwc(images0)), jnp.asarray(targets0)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": merge_params(params, state.frozen), "batch_stats": state.batch_stats},
            x0, train=True, use_batch_stats=True, mutable=["batch_stats"],
        )
        return multibox_loss(out, t0, df)

    grads0 = jax.grad(loss_fn)(state.params)

    losses = []
    for step in range(steps):
        images, targets = synth_trajectory_batch(step, n=bs)
        state, loss = trainer.train_step(
            state, jnp.asarray(_nchw_to_nhwc(images)), jnp.asarray(targets)
        )
        losses.append(float(loss))
    return g, np.array(losses), jax.tree.map(np.asarray, grads0), state


def _fp_delta(keys_g, fp_g, tree, floor: float):
    """Max fingerprint deviation per tensor, relative to max(per-tensor golden
    L2, floor). The floor neutralizes mathematically-inert tensors: conv biases
    that feed BatchNorm have EXACTLY-cancelled gradients (mean subtraction), so
    their golden grad L2 is f32 noise (measured 1e-10..1e-7) and a relative
    measure against it is meaningless — against the floor, their (noise-sized)
    absolute deviation still stays bounded."""
    keys, fp = fingerprint_tree(jax.tree.map(np.asarray, tree))
    assert list(keys) == list(keys_g), "tensor inventory mismatch"
    scale = np.maximum(fp_g[:, 0], floor)
    return np.abs(fp - fp_g).max(axis=1) / scale


def test_loss_trajectory(trajectory):
    g, losses, _, _ = trajectory
    ref = g["losses"]
    # per-step relative drift; budget 100x over the measured ~3e-5 at step 20
    drift = np.abs(losses - ref) / np.maximum(np.abs(ref), 1e-9)
    assert drift.max() < 3e-3, f"loss trajectory drift {drift.max():.2e} at step {drift.argmax()}"
    # step 0 composes only forward+loss — much tighter
    assert drift[0] < 1e-4, f"step-0 loss drift {drift[0]:.2e}"


def test_lr_schedule(trajectory):
    """Per-epoch ExponentialLR semantics: lr used at step s is base*gamma^(s//spe)."""
    g = trajectory[0]
    spe = int(g["steps_per_epoch"])
    sched = exponential_epoch_schedule(float(g["lr"]), float(g["gamma"]), spe)
    ours = np.array([sched(s) for s in range(int(g["steps"]))])
    np.testing.assert_allclose(ours, g["lrs"], rtol=1e-12)


def test_step0_gradients(trajectory):
    """Backward parity through all 51 modules + MultiBox loss. Measured drift:
    ≤1.6e-3 rel on every gradient-carrying tensor (the 1e-3-scale tensors are
    hard-negative-mining boundary effects: a logit within f32 noise of the
    strict-> (k+1)-th threshold toggles a few anchors' CE terms); the layer-11
    branch has EXACTLY zero grads both sides (its 4 anchors never selected in
    batch 0); BN-cancelled conv biases are noise-floor (≤4e-7 abs)."""
    g, _, grads0, _ = trajectory
    rel = _fp_delta(g["grad_fp_keys"], g["grad_fp"], grads0, floor=1e-4)
    assert rel.max() < 5e-3, f"grad fingerprint drift {rel.max():.2e} ({g['grad_fp_keys'][rel.argmax()]})"


def _abs_delta(keys_g, fp_g, tree):
    """(keys, per-tensor max |fingerprint diff|, golden per-tensor L2)."""
    keys, fp = fingerprint_tree(jax.tree.map(np.asarray, tree))
    assert list(keys) == list(keys_g), "tensor inventory mismatch"
    return keys, np.abs(fp - fp_g).max(axis=1), fp_g[:, 0]


def test_final_params(trajectory):
    """20-step param-space agreement, per tensor: |Δfingerprint| ≤
    5e-3·L2 + 1e-2. Measured profile: kernels ≤ 1.2e-3 rel (pure compounding
    of the ≤1.6e-3 per-step grad drift); the loosest tensors are deep BN
    BIASES (4e-3 abs on bn_11_1/bias) — their gradients start near zero, and
    Adam's bias-corrected update of a near-zero gradient is ~sign(g)·lr, so
    f32 noise flips a few elements' signs and each flip walks ±2·lr·steps
    (same mechanism documented in test_parallel's SGD-vs-Adam note). The
    absolute term is ~10 lr-units of that walk; everything else has ≥4x
    headroom under the relative term."""
    g, _, _, state = trajectory
    keys, absd, l2 = _abs_delta(g["param_fp_keys"], g["param_fp"], state.params)
    budget = 5e-3 * l2 + 1e-2
    worst = (absd / budget).argmax()
    assert (absd <= budget).all(), f"param drift {absd[worst]:.2e} > {budget[worst]:.2e} ({keys[worst]})"


def test_final_batch_stats(trajectory):
    """BN running-stat trajectories after 20 train-mode updates. The FROZEN
    trunk (bn_1..5) sees identical inputs both sides, so its stats pin the
    momentum semantics essentially exactly (measured ≤ 1.2e-6); the extras'
    stats track activations of the (slightly diverged, see test_final_params)
    trained layers, compounding to ≤ 6e-2 rel on the deepest."""
    g, _, _, state = trajectory
    keys, absd, l2 = _abs_delta(g["bs_fp_keys"], g["bs_fp"], state.batch_stats)
    trunk = np.array([int(str(k).split("_")[1].split("/")[0]) <= 5 for k in keys])
    assert (absd[trunk] <= 1e-4).all(), "frozen-trunk BN momentum drift"
    budget = 0.1 * l2 + 0.1
    worst = (absd / budget).argmax()
    assert (absd <= budget).all(), f"batch-stats drift {absd[worst]:.2e} > {budget[worst]:.2e} ({keys[worst]})"


def test_eval_forward_after_training(trajectory):
    """Post-training eval-mode (running-stats) forward on batch 0 — the
    composition of 20 steps of param AND BN-momentum updates. Measured:
    maxabs 9.8e-3 / p99 5.5e-3 / mean 6.9e-4 on logits of magnitude ~3 — the
    Adam sign-noise of test_final_params surfacing in the deep heads."""
    g, _, _, state = trajectory
    images0, _ = synth_trajectory_batch(0, n=int(g["bs"]))
    out = SSD(num_classes=21).apply(
        {"params": state.all_params, "batch_stats": state.batch_stats},
        jnp.asarray(_nchw_to_nhwc(images0)), train=False, use_batch_stats=False,
    )
    d = np.abs(np.asarray(out)[:, :128, :] - g["out_eval_after"])
    assert d.max() < 3e-2, f"eval-after maxabs {d.max():.2e}"
    assert d.mean() < 3e-3, f"eval-after mean {d.mean():.2e}"
