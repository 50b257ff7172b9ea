"""Batched per-class TP assignment (reference: src/evaluate.py:134-151).

The reference loops per image / per class in Python, compacts detections and
GTs with `get_order` (score-sorted, score > 0 — evaluate.py:31-42), then does
greedy first-claim matching: each detection claims its best-IoU GT if
IoU > 0.5, and only the FIRST (highest-scored) claimant of a GT counts
(`valid.cumsum(0) == valid`, evaluate.py:146-148).

This implementation is one jitted program over the whole batch and all classes:
masked argmax replaces the compaction (relative order of GT columns is
irrelevant to argmax/first-claim), and the first-claim rule becomes an argmax
over the score-sorted rank axis. Results are bit-equal selections to the
reference loop on non-tied scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_detection_torch2_tpu.core.boxes import pairwise_iou


def _matches_one_class(scores_c, gt_present_c, iou):
    """scores_c: (N, P) class scores; gt_present_c: (N, G) bool; iou: (N, P, G)
    -> (correct_sorted (N, P) bool, scores_sorted (N, P)) in descending-score order."""
    order = jnp.argsort(-scores_c, axis=-1)  # score-desc rank order (stable)
    scores_sorted = jnp.take_along_axis(scores_c, order, axis=-1)
    pred_present = scores_sorted > 0.0
    iou_sorted = jnp.take_along_axis(iou, order[..., None], axis=1)  # (N, P, G)

    # best class-GT per prediction (masked argmax == argmax over compacted columns)
    masked_iou = jnp.where(gt_present_c[:, None, :], iou_sorted, -1.0)
    best = jnp.argmax(masked_iou, axis=-1)  # (N, P)
    best_iou = jnp.take_along_axis(masked_iou, best[..., None], axis=-1)[..., 0]
    claim_valid = pred_present & (best_iou > 0.5)

    claims = jax.nn.one_hot(best, iou.shape[-1], dtype=jnp.bool_) & claim_valid[..., None]  # (N, P, G)
    first = jnp.argmax(claims, axis=1)  # (N, G): first-rank claimant (0 if none)
    any_claim = claims.any(axis=1)
    rank = jnp.arange(iou.shape[1])[None, :, None]
    correct = (claims & any_claim[:, None, :] & (first[:, None, :] == rank)).any(-1)
    return correct, scores_sorted


@functools.partial(jax.jit, static_argnames=("num_classes",))
def detection_matches(outputs: jax.Array, gts: jax.Array, num_classes: int = 20):
    """outputs: (N, P, 4+21) post-NMS (decoded boxes + one-class-kept scores),
    gts: (N, G, 4+21) zero-padded.

    Returns dict with, per class c (axis 1):
      correct: (N, C, P) bool  — TP flag per detection, score-desc sorted
      scores:  (N, C, P)       — the matching score column, score-desc sorted
      counts:  (N, C) int      — number of class-c GTs per image
    """
    iou = pairwise_iou(outputs[..., :4], gts[..., :4])  # (N, P, G) (reference: evaluate.py:132)

    def per_class(c):
        scores_c = outputs[..., 5 + c]
        gt_present_c = gts[..., 5 + c] > 0.0
        correct, scores_sorted = _matches_one_class(scores_c, gt_present_c, iou)
        return correct, scores_sorted, gt_present_c.sum(-1)

    correct, scores, counts = jax.vmap(per_class, out_axes=(1, 1, 1))(jnp.arange(num_classes))
    return {"correct": correct, "scores": scores, "counts": counts}
