"""Evaluation metric parity: TP assignment + AP vs reference goldens (src/evaluate.py)."""

import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.metrics.ap import APAccumulator, average_precision
from object_detection_torch2_tpu.metrics.assign import detection_matches


def test_average_precision_standalone(goldens):
    g = goldens("eval")
    rows = g["ap_rows"]
    ap = average_precision(rows[:, 0], rows[:, 1], int(g["ap_count"]), strict=False)
    np.testing.assert_allclose(ap, float(g["ap_val"]), rtol=1e-6)


def test_q5_parity_metric_equals_recall():
    """Quirk Q5 (SURVEY.md verified example): anti-correlated scores give
    recall 0.75 under the parity metric vs a lower proper AP."""
    correct = np.array([1, 1, 1, 0, 0, 0], np.float32)
    scores = np.array([0.1, 0.2, 0.3, 0.9, 0.8, 0.7], np.float32)  # TPs scored lowest
    parity = average_precision(correct, scores, count=4, strict=False)
    strict = average_precision(correct, scores, count=4, strict=True)
    np.testing.assert_allclose(parity, 0.75, atol=1e-6)
    assert strict < parity


def test_full_eval_pipeline_parity(goldens):
    """Batched TP assignment + accumulation + per-class AP vs the reference's
    per-image Python loop output."""
    g = goldens("eval")
    matches = detection_matches(jnp.asarray(g["outputs"]), jnp.asarray(g["gts"]), num_classes=20)
    acc = APAccumulator(20)
    acc.update(matches)
    np.testing.assert_array_equal(acc.counts, g["counts"])
    aps, mean = acc.result(strict=False)
    ref_aps = g["aps"]
    mask = np.isfinite(ref_aps)
    # classes the reference collected must match exactly; others are nan on both sides
    np.testing.assert_array_equal(np.isfinite(aps), mask)
    np.testing.assert_allclose(aps[mask], ref_aps[mask], atol=1e-5)


def test_eval_pipeline_batch_split_invariance(goldens):
    """Streaming accumulation over split batches must equal one-shot (parity metric)."""
    g = goldens("eval")
    outputs, gts = jnp.asarray(g["outputs"]), jnp.asarray(g["gts"])
    one = APAccumulator(20)
    one.update(detection_matches(outputs, gts, num_classes=20))
    two = APAccumulator(20)
    two.update(detection_matches(outputs[:1], gts[:1], num_classes=20))
    two.update(detection_matches(outputs[1:], gts[1:], num_classes=20))
    a1, m1 = one.result()
    a2, m2 = two.result()
    np.testing.assert_allclose(
        np.nan_to_num(a1, nan=-1), np.nan_to_num(a2, nan=-1), atol=1e-6
    )
