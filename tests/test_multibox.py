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


def test_kth_threshold_radix_select_equals_sort():
    """The radix-select kth_plus_one_threshold must be BITWISE equal to the
    sort+gather formulation on adversarial inputs: duplicates, negatives,
    zeros (+/-0 keys), denormal-scale values, and all k edges."""
    import jax.numpy as jnp

    from object_detection_torch2_tpu.core.multibox import kth_plus_one_threshold

    def sort_ref(x, k):
        sorted_desc = -np.sort(-x, axis=-1)
        kk = np.clip(k, 0, x.shape[-1] - 1)
        return np.take_along_axis(sorted_desc, kk[:, None], axis=-1)[:, 0]

    rng = np.random.default_rng(5)
    n, p = 7, 513
    cases = []
    x = rng.standard_normal((n, p)).astype(np.float32) * 10
    cases.append(x)
    xd = rng.choice(np.float32([-2.5, -1.0, -0.0, 0.0, 1e-30, 3.75, 3.75, 100.0]), (n, p))
    cases.append(xd.astype(np.float32))
    cases.append(np.zeros((n, p), np.float32))
    for x in cases:
        for k in (np.zeros(n, np.int64), np.full(n, 1), np.full(n, p - 1),
                  np.full(n, p + 50), rng.integers(0, p, n)):
            got = np.asarray(kth_plus_one_threshold(jnp.asarray(x), jnp.asarray(k)))
            want = sort_ref(x, np.asarray(k))
            np.testing.assert_array_equal(got, want, err_msg=f"k={k[:3]}")
