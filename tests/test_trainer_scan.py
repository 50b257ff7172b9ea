"""Multi-step-per-dispatch training (`cli/train.py --steps_per_dispatch K`).

`Trainer.train_steps` runs K optimizer steps as ONE compiled program —
`lax.scan` over (K, B, ...) stacked micro-batches — to amortize the ~2.3 ms
per-dispatch latency of remote PJRT runtimes (tools/bench_step_breakdown.py).
The scan body IS `_train_step_impl`, and the fused-augment RNG folds
`state.step` (which increments inside the scan carry), so a K-scan must
reproduce K single dispatches step for step: same per-step losses, same final
params / opt state / batch_stats, same augment randomness. These tests pin
that equivalence single-device and under the 8-device DP mesh, plus the
DataLoader's `stack_steps` grouping that feeds it."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.core.anchors import default_boxes
from object_detection_torch2_tpu.data.loader import DataLoader
from object_detection_torch2_tpu.parallel import batch_sharding, make_mesh, shard_batch
from object_detection_torch2_tpu.train import Trainer, adam_torch
from tests.test_train import TinyDet


def _aug_setup(mesh=None):
    """TinyDet trainer WITH fused augmentation (uint8 in), so the scan test
    covers the step-indexed RNG path, not just the deterministic math."""
    model = TinyDet()
    df = jnp.asarray(default_boxes()[:64])
    trainer = Trainer(model, loss_kind="multibox", default_boxes=df, mesh=mesh, augment=True)
    tx = adam_torch(1e-2)
    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), tx, is_trainable=TinyDet.is_trainable
    )
    return trainer, state


def _stacked_batches(k, b=8):
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, (k, b, 8, 8, 3)).astype(np.uint8)
    targets = np.zeros((k, b, 2, 25), np.float32)
    targets[..., 0, :4] = [0.013, 0.013, 0.15, 0.15]
    targets[..., 0, 9] = 1.0
    return images, targets


def _final_snapshot(state):
    return (
        int(state.step),
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
        jax.tree.map(np.asarray, state.opt_state),
    )


def test_scan_equals_single_dispatches():
    k = 4
    images, targets = _stacked_batches(k)

    trainer_a, state_a = _aug_setup()
    singles = []
    for i in range(k):
        state_a, loss = trainer_a.train_step(state_a, jnp.asarray(images[i]), jnp.asarray(targets[i]))
        singles.append(float(loss))

    trainer_b, state_b = _aug_setup()
    state_b, losses = trainer_b.train_steps(state_b, jnp.asarray(images), jnp.asarray(targets))
    assert losses.shape == (k,)
    np.testing.assert_allclose(np.asarray(losses), singles, rtol=1e-6, atol=1e-7)

    step_a, params_a, bs_a, opt_a = _final_snapshot(state_a)
    step_b, params_b, bs_b, opt_b = _final_snapshot(state_b)
    assert step_a == step_b == k
    for tree_a, tree_b in ((params_a, params_b), (bs_a, bs_b), (opt_a, opt_b)):
        flat_a = jax.tree_util.tree_leaves_with_path(tree_a)
        flat_b = jax.tree_util.tree_leaves_with_path(tree_b)
        for (pa, a), (pb, b) in zip(flat_a, flat_b, strict=True):
            assert pa == pb
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7, err_msg=str(pa))


def test_scan_dp_sharded_equals_unsharded():
    """(K, B, ...) stacks placed with batch_axis=1 over the 8-device mesh:
    scan axis whole, each micro-batch sharded — results match no-mesh."""
    k = 3
    images, targets = _stacked_batches(k)

    trainer1, state1 = _aug_setup()
    state1, losses1 = trainer1.train_steps(state1, jnp.asarray(images), jnp.asarray(targets))

    mesh = make_mesh()
    trainer8, state8 = _aug_setup(mesh=mesh)
    im8, tg8 = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(targets)), batch_axis=1)
    assert im8.sharding == batch_sharding(mesh, batch_axis=1)
    # each device holds the full K axis and a 1-row batch slice
    assert im8.addressable_shards[0].data.shape == (k, 1, 8, 8, 3)
    state8, losses8 = trainer8.train_steps(state8, im8, tg8)

    np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses8), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(state1.params["det_4_3"]["kernel"]),
        np.asarray(state8.params["det_4_3"]["kernel"]),
        rtol=1e-5,
        atol=1e-7,
    )


def test_loader_stack_steps_grouping(tmp_path):
    """DataLoader(stack_steps=K) yields the SAME batches as K consecutive
    single yields, stacked on a new leading axis (epoch tail = shorter stack)."""
    from object_detection_torch2_tpu.data.records import pack_voc
    from tests.test_data import FIXTURE

    rec = pack_voc([FIXTURE], "trainval.txt", tmp_path / "rec", imsize=96, max_gt=8, log_every=0)
    flat = DataLoader(rec, batch_size=1, shuffle=True, seed=5, max_gt=8)
    stacked = DataLoader(rec, batch_size=1, shuffle=True, seed=5, max_gt=8, stack_steps=3)

    singles = [(np.asarray(im), np.asarray(gt)) for im, gt in flat]
    groups = [(np.asarray(im), np.asarray(gt)) for im, gt in stacked]
    assert len(singles) == 4 and len(groups) == 2
    assert groups[0][0].shape == (3, 1, 96, 96, 3)
    assert groups[1][0].shape == (1, 1, 96, 96, 3)  # epoch tail
    recombined = [
        (groups[g][0][i], groups[g][1][i]) for g in range(len(groups)) for i in range(groups[g][0].shape[0])
    ]
    for (im_s, gt_s), (im_g, gt_g) in zip(singles, recombined, strict=True):
        np.testing.assert_array_equal(im_s, im_g)
        np.testing.assert_array_equal(gt_s, gt_g)
