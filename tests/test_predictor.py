"""Library-level Predictor: batched detect with ragged final batch."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.infer import Predictor
from object_detection_torch2_tpu.models.ssd import SSD


def test_predictor_ragged_batches():
    model = SSD(num_classes=21)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), train=False)
    pred = Predictor(model, variables, batch_size=2)

    images = np.random.default_rng(0).integers(0, 255, (3, 300, 300, 3)).astype(np.uint8)
    dets = pred.predict(images)
    assert len(dets) == 3  # padding image discarded
    for d in dets:
        assert d.boxes.ndim == 2 and d.boxes.shape[1] == 4
        assert len(d.boxes) == len(d.class_ids) == len(d.scores)
        if len(d.class_ids):
            assert d.class_ids.min() >= 0 and d.class_ids.max() <= 19
            assert (d.scores > 0).all()


def test_predictor_padding_does_not_perturb_real_images():
    """Ragged final batch: pad rows are excluded from BN batch statistics, so a
    real image's detections are identical whether it arrives alone (bs=1, no
    padding) or padded up to a larger static batch (advisor r1; the reference
    forwards ragged batches as-is, src/inference.py:55-65). imsize 264 is the
    smallest valid SSD pyramid (the anchor grid is imsize-generic)."""
    model = SSD(num_classes=21)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 264, 264, 3)), train=False)
    image = np.random.default_rng(1).integers(0, 255, (1, 264, 264, 3)).astype(np.uint8)

    solo = Predictor(model, variables, imsize=264, batch_size=1).predict(image)
    padded = Predictor(model, variables, imsize=264, batch_size=4).predict(image)
    assert len(solo) == len(padded) == 1
    np.testing.assert_array_equal(solo[0].class_ids, padded[0].class_ids)
    # masked-sum-over-padded vs mean-over-ragged reduce in different orders, so
    # stats differ by ~1e-7 rel; exp() in the box decode amplifies that to ~4e-6
    # rel on random-weight logits — equality is mathematical, not bitwise
    np.testing.assert_allclose(solo[0].scores, padded[0].scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(solo[0].boxes, padded[0].boxes, rtol=1e-4, atol=1e-5)


def test_predictor_batches_per_dispatch_equivalence():
    """batches_per_dispatch=K (in-graph scan over K batches, the serving analog
    of --steps_per_dispatch) returns the same detections as K single dispatches
    — covering one full K-stack, a leftover single batch, and a ragged final
    batch through the single-batch program. Running-stats mode so per-image
    math is layout-invariant (selection-identical; values to the scheduling ulp)."""
    model = SSD(num_classes=21)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 264, 264, 3)), train=False)
    images = np.random.default_rng(7).integers(0, 255, (7, 264, 264, 3)).astype(np.uint8)

    kwargs = dict(imsize=264, batch_size=2, use_batch_stats=False)
    base = Predictor(model, variables, **kwargs).predict(images)
    k2 = Predictor(model, variables, batches_per_dispatch=2, **kwargs).predict(images)

    assert len(base) == len(k2) == 7
    for a, b in zip(base, k2):
        np.testing.assert_array_equal(a.class_ids, b.class_ids)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-5)


def test_predictor_d2h_half_matches_f32():
    """d2h_half=True (float16 packed D2H) keeps the same detections as the
    exact f32 path within the documented ~5e-4 relative quantization — the
    dtype conversion happens AFTER all selection (NMS, top-K) on device, so
    class ids and detection counts are identical by construction."""
    model = SSD(num_classes=21)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 264, 264, 3)), train=False)
    images = np.random.default_rng(3).integers(0, 255, (2, 264, 264, 3)).astype(np.uint8)

    kwargs = dict(imsize=264, batch_size=2, use_batch_stats=False)
    exact = Predictor(model, variables, **kwargs).predict(images)
    half = Predictor(model, variables, d2h_half=True, **kwargs).predict(images)

    for a, b in zip(exact, half):
        np.testing.assert_array_equal(a.class_ids, b.class_ids)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-3, atol=1e-3)
