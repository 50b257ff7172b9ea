"""MultiBox loss parity vs the reference `SSD.loss` (reference: src/model/ssd.py:181-328)."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.core import anchors
from object_detection_torch2_tpu.core.multibox import multibox_loss


def test_loss_parity(goldens):
    g = goldens("loss")
    df = jnp.asarray(anchors.default_boxes())
    loss = jax.jit(multibox_loss)(jnp.asarray(g["outputs"]), jnp.asarray(g["targets"]), df)
    np.testing.assert_allclose(float(loss), float(g["loss"]), rtol=2e-5)


def test_loss_parity_zero_gt_image(goldens):
    """One image has zero GT boxes — its contribution must be exactly 0
    (the where-reciprocal trick, reference: ssd.py:226-227)."""
    g = goldens("loss")
    df = jnp.asarray(anchors.default_boxes())
    loss = jax.jit(multibox_loss)(jnp.asarray(g["outputs"]), jnp.asarray(g["targets0"]), df)
    np.testing.assert_allclose(float(loss), float(g["loss0"]), rtol=2e-5)


def test_loss_all_void_batch():
    """All images with zero GT -> loss exactly 0, and finite gradients."""
    df = jnp.asarray(anchors.default_boxes())
    outputs = jnp.zeros((2, 8732, 25))
    targets = jnp.zeros((2, 4, 25))
    loss, grad = jax.value_and_grad(multibox_loss)(outputs, targets, df)
    assert float(loss) == 0.0
    assert np.isfinite(np.asarray(grad)).all()


def test_loss_gradients_finite(goldens):
    g = goldens("loss")
    df = jnp.asarray(anchors.default_boxes())
    grad = jax.grad(multibox_loss)(jnp.asarray(g["outputs"]), jnp.asarray(g["targets"]), df)
    assert np.isfinite(np.asarray(grad)).all()
