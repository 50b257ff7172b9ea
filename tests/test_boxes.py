"""Box-math parity vs reference goldens (IoU, decode, match, deltas, smooth-L1, CE, score)."""

import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.core import boxes as B
from object_detection_torch2_tpu.core import multibox as M
from object_detection_torch2_tpu.ops.scores import calc_scores


def test_pairwise_iou(goldens):
    g = goldens("boxmath")
    iou = B.pairwise_iou(jnp.asarray(g["gts"][..., :4]), jnp.asarray(g["boxes_s"]))
    np.testing.assert_allclose(np.asarray(iou), g["iou"], atol=1e-6)


def test_decode(goldens):
    g = goldens("boxmath")
    out = B.decode_boxes(jnp.asarray(g["pred"]), jnp.asarray(g["df"]))
    np.testing.assert_allclose(np.asarray(out), g["decode"], atol=1e-5)


def test_match_mask(goldens):
    g = goldens("boxmath")
    m = B.match_mask(jnp.asarray(g["gts"][..., :4]), jnp.asarray(g["df"]))
    # reference _match returns (N, P, G) bool
    np.testing.assert_array_equal(np.asarray(m), g["match"])


def test_encode_deltas(goldens):
    g = goldens("boxmath")
    d = B.encode_deltas(jnp.asarray(g["gts"][..., :4]), jnp.asarray(g["df"]))
    # XLA-CPU's vectorized f32 log carries ~1e-4 abs error vs torch's libm log
    # (measured); the w/h delta channels inherit it.
    np.testing.assert_allclose(np.asarray(d), g["delta"], atol=2e-4)


def test_smooth_l1():
    x = np.linspace(-3, 3, 13).astype(np.float32)
    out = np.asarray(B.smooth_l1(jnp.asarray(x)))
    expect = np.where(np.abs(x) < 1, 0.5 * x * x, np.abs(x) - 0.5)
    np.testing.assert_allclose(out, expect, atol=1e-7)


def test_pairwise_softmax_ce(goldens):
    g = goldens("boxmath")
    ce = B.pairwise_softmax_ce(jnp.asarray(g["logits"]), jnp.asarray(g["gts"][..., 4:]))
    # MXU-friendly restructuring (sum(gt)*logsumexp - gt@pr) reorders the f32
    # accumulation vs torch's -(gt*log_softmax).sum
    np.testing.assert_allclose(np.asarray(ce), g["ce"], atol=1e-4)


def test_calc_scores(goldens):
    g = goldens("boxmath")
    s = calc_scores(jnp.asarray(g["score_in"]))
    np.testing.assert_allclose(np.asarray(s), g["score"], atol=1e-6)


def test_split_pos_neg(goldens):
    g = goldens("boxmath")
    sp, sn = M.split_pos_neg(jnp.asarray(g["split_pos_in"]), jnp.asarray(g["split_neg_in"]))
    np.testing.assert_array_equal(np.asarray(sp), g["split_pos"])
    np.testing.assert_array_equal(np.asarray(sn), g["split_neg"])


def test_kth_plus_one_threshold(goldens):
    g = goldens("boxmath")
    x = jnp.asarray(g["kth_x"])[None, :].repeat(len(g["kth_k"]), axis=0)
    k = jnp.asarray(g["kth_k"])
    vals = M.kth_plus_one_threshold(x, k)
    np.testing.assert_allclose(np.asarray(vals), g["kth"], atol=1e-7)
