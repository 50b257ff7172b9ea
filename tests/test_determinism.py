"""Reproducibility: identical seeds give identical training trajectories.

The step is a pure function of (state, batch) — augmentation RNG folds
state.step into a fixed base key — so reruns must match bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train import _tiny_setup


def test_same_seed_same_trajectory():
    losses = []
    params = []
    for _ in range(2):
        trainer, state, images, targets = _tiny_setup()
        run_losses = []
        for _ in range(3):
            state, loss = trainer.train_step(state, jnp.asarray(images), jnp.asarray(targets))
            run_losses.append(np.asarray(loss))
        losses.append(run_losses)
        params.append(np.asarray(state.params["det_4_3"]["kernel"]))
    np.testing.assert_array_equal(losses[0], losses[1])
    np.testing.assert_array_equal(params[0], params[1])


def test_uint8_augmented_steps_deterministic():
    """With fused augmentation (RNG from state.step), reruns still match."""
    from object_detection_torch2_tpu.core.anchors import default_boxes
    from object_detection_torch2_tpu.train import Trainer, adam_torch
    from tests.test_train import TinyDet

    def run():
        model = TinyDet()
        trainer = Trainer(
            model, loss_kind="multibox", default_boxes=jnp.asarray(default_boxes()[:64]),
            augment=True, seed=3,
        )
        state = trainer.init_state(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), tx=adam_torch(1e-2),
            is_trainable=TinyDet.is_trainable,
        )
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (4, 8, 8, 3)).astype(np.uint8)
        targets = np.zeros((4, 2, 25), np.float32)
        targets[:, 0, :4] = [0.013, 0.013, 0.15, 0.15]
        targets[:, 0, 9] = 1.0
        out = []
        for _ in range(3):
            state, loss = trainer.train_step(state, jnp.asarray(images), jnp.asarray(targets))
            out.append(np.asarray(loss))
        return out

    np.testing.assert_array_equal(run(), run())
