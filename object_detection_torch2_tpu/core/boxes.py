"""Center-form box math: pairwise IoU, delta encode/decode, smooth-L1, pairwise CE.

All boxes are center-form [cx, cy, w, h], normalized to [0, 1] image coordinates.
Semantics reproduce the reference exactly (file:line cites into /root/reference),
including quirk Q6 (SURVEY.md): there is NO variance scaling in the delta
encode/decode (the SSD paper's 0.1/0.2 factors are absent).

Everything here is pure jax.numpy with static shapes — safe inside jit, vmap,
and shard_map, and fusable by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_iou(t: jax.Array, s: jax.Array) -> jax.Array:
    """Pairwise IoU between two center-form box sets.

    t: (..., T, 4), s: (..., S, 4) -> (..., T, S).

    Zero-intersection pairs return exactly 0 via the reference's
    `where(w*h > 0, iou, w*h)` guard, which also keeps all-zero padded rows
    inert (reference: src/utils.py:58-77).
    """
    t = t[..., :, None, :]
    s = s[..., None, :, :]
    w = jnp.clip(
        jnp.minimum(t[..., 0] + t[..., 2] / 2, s[..., 0] + s[..., 2] / 2)
        - jnp.maximum(t[..., 0] - t[..., 2] / 2, s[..., 0] - s[..., 2] / 2),
        min=0,
    )
    h = jnp.clip(
        jnp.minimum(t[..., 1] + t[..., 3] / 2, s[..., 1] + s[..., 3] / 2)
        - jnp.maximum(t[..., 1] - t[..., 3] / 2, s[..., 1] - s[..., 3] / 2),
        min=0,
    )
    inter = w * h
    union = t[..., 2] * t[..., 3] + s[..., 2] * s[..., 3] - inter
    return jnp.where(inter > 0, inter / union, inter)


def match_mask(gt: jax.Array, df: jax.Array, threshold: float = 0.25) -> jax.Array:
    """Anchor-to-GT matching mask.

    gt: (N, G, 4) ground-truth boxes (zero-padded rows allowed),
    df: (P, 4) default boxes -> bool (N, P, G).

    `IoU > threshold` with threshold 0.25 — NOT the paper's 0.5 (reference:
    src/model/ssd.py:231-250, rationale README.md:38-40). Padded zero-area GT
    rows map to IoU 0 via `where(g_w*g_h > 0, iou, g_w*g_h)` so they never match.
    """
    g = gt[:, None, :, :]   # (N, 1, G, 4)
    d = df[None, :, None, :]  # (1, P, 1, 4)
    w = jnp.clip(
        jnp.minimum(g[..., 0] + g[..., 2] / 2, d[..., 0] + d[..., 2] / 2)
        - jnp.maximum(g[..., 0] - g[..., 2] / 2, d[..., 0] - d[..., 2] / 2),
        min=0,
    )
    h = jnp.clip(
        jnp.minimum(g[..., 1] + g[..., 3] / 2, d[..., 1] + d[..., 3] / 2)
        - jnp.maximum(g[..., 1] - g[..., 3] / 2, d[..., 1] - d[..., 3] / 2),
        min=0,
    )
    g_area = g[..., 2] * g[..., 3]
    d_area = d[..., 2] * d[..., 3]
    inter = w * h
    iou = jnp.where(g_area > 0, inter / (g_area + d_area - inter), g_area)
    return iou > threshold


def encode_deltas(gt: jax.Array, df: jax.Array) -> jax.Array:
    """Box delta ("g-hat") encoding for every (anchor, GT) pair.

    gt: (N, G, 4), df: (P, 4) -> (N, P, G, 4) of
    [(g_cx-d_cx)/d_w, (g_cy-d_cy)/d_h, log(g_w/d_w), log(g_h/d_h)],
    with `where(g > 0, log(...), g)` guards that keep zero-padded GT rows
    finite (reference: src/model/ssd.py:252-272). No variance scaling (Q6).
    """
    g = gt[:, None, :, :]
    d = df[None, :, None, :]
    d_w, d_h = d[..., 2], d[..., 3]
    cx = (g[..., 0] - d[..., 0]) / d_w
    cy = (g[..., 1] - d[..., 1]) / d_h
    g_w, g_h = g[..., 2], g[..., 3]
    w = jnp.where(g_w > 0, jnp.log(jnp.where(g_w > 0, g_w, 1.0) / d_w), g_w)
    h = jnp.where(g_h > 0, jnp.log(jnp.where(g_h > 0, g_h, 1.0) / d_h), g_h)
    return jnp.stack([cx, cy, w, h], axis=-1)


def decode_boxes(pr: jax.Array, df: jax.Array) -> jax.Array:
    """Inverse of the delta encoding: predicted deltas -> center-form boxes.

    pr: (N, P, >=4) (only the first 4 channels are read), df: (P, 4) -> (N, P, 4)
    of [d_w*p_cx + d_cx, d_h*p_cy + d_cy, d_w*e^{p_w}, d_h*e^{p_h}]
    (reference: src/utils.py:19-40, the repo's `calc_coordicate`).
    """
    d = df[None, :, :]
    cx = d[..., 2] * pr[..., 0] + d[..., 0]
    cy = d[..., 3] * pr[..., 1] + d[..., 1]
    w = d[..., 2] * jnp.exp(pr[..., 2])
    h = d[..., 3] * jnp.exp(pr[..., 3])
    return jnp.stack([cx, cy, w, h], axis=-1)


def smooth_l1(x: jax.Array) -> jax.Array:
    """Element-wise smooth-L1: 0.5x^2 for |x|<1 else |x|-0.5 (reference: src/model/ssd.py:274-283)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1, 0.5 * x * x, ax - 0.5)


def pairwise_softmax_ce(pr: jax.Array, gt: jax.Array) -> jax.Array:
    """Pairwise softmax cross-entropy -sum(gt * log_softmax(pr)) over the class axis.

    pr: (N, P, C) logits, gt: (N, G, C) one-hot (all-zero padded rows give 0)
    -> (N, P, G) (reference: src/model/ssd.py:285-298).

    Computed as sum(gt)*logsumexp(pr) - gt @ pr, turning the (N, P, G, C)
    broadcast into an MXU matmul contraction over C.
    """
    lse = jax.nn.logsumexp(pr, axis=-1)  # (N, P)
    gt_sum = jnp.sum(gt, axis=-1)  # (N, G); 1 for real rows, 0 for padding
    # precision=highest: the default lowers f32 contractions to bf16 passes
    # (error ~ bf16 eps = 7.8e-3), far outside parity tolerance
    dot = jnp.einsum("npc,ngc->npg", pr, gt, precision=jax.lax.Precision.HIGHEST)
    return gt_sum[:, None, :] * lse[:, :, None] - dot


def void_softmax_ce(pr: jax.Array, void_index: int = 0) -> jax.Array:
    """Cross-entropy of each anchor against the void one-hot `eye(C)[0]`.

    pr: (N, P, C) -> (N, P) = logsumexp(pr) - pr[..., void_index]
    (reference: src/model/ssd.py:212-213 builds gt_void = eye(C)[0]).
    """
    return jax.nn.logsumexp(pr, axis=-1) - pr[..., void_index]
