"""Post-processing score computation (reference: src/utils.py:43-55, `calc_score`).

Softmax over all C classes (INCLUDING void), then zero every class except the
argmax — at most one nonzero score per anchor. Anchors whose argmax is the void
class end up with zero in every non-void column, which is what later excludes
them from NMS and rendering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_scores(outputs: jax.Array) -> jax.Array:
    """outputs: (N, P, 4+C) (only [..., 4:] is read) -> (N, P, C) one-class-kept scores."""
    logits = outputs[..., 4:]
    probs = jax.nn.softmax(logits, axis=-1)
    argmax = jnp.argmax(logits, axis=-1)
    mask = jax.nn.one_hot(argmax, logits.shape[-1], dtype=probs.dtype)
    return probs * mask


def top_k_detections(post: jax.Array, k: int, batch_mask: jax.Array | None = None):
    """Device-side detection compaction: (N, P, 4+C) post-NMS -> top-K rows.

    The reference hauls the full (N, 8732, 25) tensor to host per batch
    (reference: src/inference.py:65-69); post-NMS survivors are a few dozen
    rows, so compacting on device cuts D2H traffic ~200x. Rows are ranked by
    their one-class-kept score; void-argmax and NMS-suppressed rows rank as 0
    and are inert (score 0). `batch_mask` (N,) zeroes pad rows of a ragged
    final batch.

    Returns (boxes (N, K, 4), class_ids (N, K) incl. void=0 for empty slots,
    scores (N, K)) — score-descending.
    """
    confs = post[..., 4:]
    class_ids = jnp.argmax(confs, axis=-1)
    scores = jnp.max(confs, axis=-1)
    valid = scores * (class_ids != 0)
    if batch_mask is not None:
        valid = valid * batch_mask[:, None]
    top_scores, idx = jax.lax.top_k(valid, k)  # (N, K)
    boxes = jnp.take_along_axis(post[..., :4], idx[..., None], axis=1)
    classes = jnp.take_along_axis(class_ids, idx, axis=1) * (top_scores > 0)
    return boxes, classes, top_scores


def expand_detections(boxes: jax.Array, class_ids: jax.Array, scores: jax.Array, num_classes: int):
    """Inverse layout of top_k_detections: -> (N, K, 4+C) rows with one-class-kept
    score columns, feeding code that consumes the reference's post-NMS layout
    (e.g. metrics.assign.detection_matches) at K instead of P rows."""
    onehot = jax.nn.one_hot(class_ids, num_classes, dtype=scores.dtype)
    return jnp.concatenate([boxes, onehot * scores[..., None]], axis=-1)
