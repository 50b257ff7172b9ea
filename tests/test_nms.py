"""NMS parity vs the reference's greedy per-image loop (reference: src/utils.py:80-116)."""

import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.ops.nms import non_maximum_suppression


def test_nms_parity(goldens):
    g = goldens("nms")
    out = non_maximum_suppression(jnp.asarray(g["nms_in"]))
    np.testing.assert_allclose(np.asarray(out), g["nms_out"], atol=1e-6)


def test_nms_keeps_identical_to_reference_selection(goldens):
    g = goldens("nms")
    ours = np.asarray(non_maximum_suppression(jnp.asarray(g["nms_in"])))
    kept_ours = ours[..., 5:].max(-1) > 0
    kept_ref = g["nms_out"][..., 5:].max(-1) > 0
    np.testing.assert_array_equal(kept_ours, kept_ref)
