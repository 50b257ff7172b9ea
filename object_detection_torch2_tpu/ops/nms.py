"""Batched greedy class-agnostic NMS, TPU-native.

Reproduces the reference `non_maximum_suppression` (reference: src/utils.py:80-116):
sort key is the max over NON-void scores `output[:, 5:]`; only entries with key > 0
participate; suppression is class-agnostic at IoU > 0.5 on the decoded boxes; the
result is a 0/1 keep mask applied multiplicatively to ALL score columns
(including void, utils.py:114).

The reference is a per-image Python while-loop (O(P^2), a major hot loop —
SURVEY.md §2.2). Here the whole batch runs as ONE fixed-trip `lax.fori_loop`
inside jit: step i suppresses every later candidate that overlaps candidate i,
vectorized over the batch. IoU rows are computed on the fly, so peak memory is
O(N*P) — no (N, P, P) matrix is ever materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_detection_torch2_tpu.core import boxes as B


def nms_keep_mask(boxes: jax.Array, sort_scores: jax.Array, iou_thresh: float = 0.5) -> jax.Array:
    """Greedy keep mask.

    boxes: (N, P, 4) center-form, sort_scores: (N, P) (entries <= 0 never kept)
    -> bool (N, P) in the ORIGINAL anchor order.
    """
    n, p, _ = boxes.shape
    order = jnp.argsort(-sort_scores, axis=-1)  # descending, stable
    sorted_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    sorted_valid = jnp.take_along_axis(sort_scores, order, axis=1) > 0.0

    later = jnp.arange(p)[None, :]

    def body(i, keep):
        box_i = jax.lax.dynamic_slice_in_dim(sorted_boxes, i, 1, axis=1)  # (N, 1, 4)
        iou_row = B.pairwise_iou(box_i, sorted_boxes)[:, 0, :]  # (N, P)
        alive = jax.lax.dynamic_slice_in_dim(keep, i, 1, axis=1)  # (N, 1)
        suppress = alive & (iou_row > iou_thresh) & (later > i)
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, p, body, sorted_valid)
    return jnp.put_along_axis(jnp.zeros_like(keep_sorted), order, keep_sorted, axis=-1, inplace=False)


@functools.partial(jax.jit, static_argnames=("iou_thresh",))
def non_maximum_suppression(outputs: jax.Array, iou_thresh: float = 0.5) -> jax.Array:
    """outputs: (N, P, 4+C) decoded boxes + one-class-kept scores -> same shape,
    with suppressed anchors' scores (all C columns) zeroed."""
    sort_scores = outputs[..., 5:].max(axis=-1)  # max over non-void classes (utils.py:99)
    keep = nms_keep_mask(outputs[..., :4], sort_scores, iou_thresh)
    scores = outputs[..., 4:] * keep[..., None].astype(outputs.dtype)
    return jnp.concatenate([outputs[..., :4], scores], axis=-1)
