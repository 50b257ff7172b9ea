"""NMS parity vs the reference's greedy per-image loop (reference: src/utils.py:80-116)."""

import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.ops.nms import (
    nms_keep_mask,
    nms_keep_mask_serial,
    non_maximum_suppression,
)


def test_nms_parity(goldens):
    g = goldens("nms")
    out = non_maximum_suppression(jnp.asarray(g["nms_in"]))
    np.testing.assert_allclose(np.asarray(out), g["nms_out"], atol=1e-6)


def test_blocked_equals_serial_random():
    """The blocked/fixpoint formulation must equal the literal greedy loop on
    adversarial random inputs (clusters + multi-block suppression chains)."""
    rng = np.random.default_rng(11)
    n, p = 3, 300  # spans 3 blocks of 128
    boxes = np.zeros((n, p, 4), np.float32)
    centers = rng.uniform(0.1, 0.9, (n, 6, 2))
    pick = rng.integers(0, 6, (n, p))
    boxes[..., :2] = np.take_along_axis(centers, pick[..., None], axis=1) + rng.normal(0, 0.03, (n, p, 2))
    boxes[..., 2:] = rng.uniform(0.05, 0.4, (n, p, 2))
    scores = rng.uniform(-0.2, 1.0, (n, p)).astype(np.float32)  # some invalid (<0)

    for thresh in (0.3, 0.5, 0.7):
        blocked = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh))
        serial = np.asarray(nms_keep_mask_serial(jnp.asarray(boxes), jnp.asarray(scores), thresh))
        np.testing.assert_array_equal(blocked, serial)


def test_blocked_equals_serial_full_anchor_count():
    """Same equivalence at the real P=8732 (68.2 blocks, padded)."""
    rng = np.random.default_rng(12)
    n, p = 2, 8732
    boxes = np.zeros((n, p, 4), np.float32)
    boxes[..., :2] = rng.uniform(0, 1, (n, p, 2))
    boxes[..., 2:] = rng.uniform(0.02, 0.3, (n, p, 2))
    scores = rng.uniform(0, 1, (n, p)).astype(np.float32)
    scores[:, ::3] = 0.0  # a third invalid
    blocked = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores)))
    serial = np.asarray(nms_keep_mask_serial(jnp.asarray(boxes), jnp.asarray(scores)))
    np.testing.assert_array_equal(blocked, serial)


def test_nms_keeps_identical_to_reference_selection(goldens):
    g = goldens("nms")
    ours = np.asarray(non_maximum_suppression(jnp.asarray(g["nms_in"])))
    kept_ours = ours[..., 5:].max(-1) > 0
    kept_ref = g["nms_out"][..., 5:].max(-1) > 0
    np.testing.assert_array_equal(kept_ours, kept_ref)
