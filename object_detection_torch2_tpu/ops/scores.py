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
