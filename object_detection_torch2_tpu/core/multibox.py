"""MultiBox loss (localization + confidence) with hard-negative mining.

Reproduces the reference `SSD.loss` (reference: src/model/ssd.py:181-328) as one
fully-batched, jit-compiled function:

  1. anchor matching mask (N, P, G) at IoU > 0.25;
  2. localization loss: masked smooth-L1 over the 4 delta coords, summed over G;
  3. positive confidence loss: pairwise softmax-CE masked by the match;
  4. negative confidence loss: CE against the void class, masked where no match;
  5. hard-negative mining enforcing pos:neg = 1:3 via `_split_pos_neg` semantics,
     with per-image strict-`>` selection against the (k+1)-th largest value —
     positives are *also* top-k-selected (the reference's hard-positive-mining
     side effect, src/model/ssd.py:222-223);
  6. total = mean over batch of masked sums / pos_num, with pos_num == 0 giving 0
     via the where-reciprocal trick (src/model/ssd.py:226-227).

The reference's per-sample Python `torch.kthvalue` loop (ssd.py:313-328) becomes a
single batched descending sort + gather — no data-dependent control flow, so the
whole loss traces into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from object_detection_torch2_tpu.core import boxes as B


def kth_plus_one_threshold(x: jax.Array, k: jax.Array) -> jax.Array:
    """Per-row (k+1)-th largest value of x; k == 0 gives the row max.

    x: (N, P) float32, k: (N,) int -> (N,).

    Matches `SSD._k_plus_1_th_value` (reference: src/model/ssd.py:313-328):
    `torch.kthvalue(x, len(x)-k)` is the (k+1)-th largest, and the k == 0 branch
    returns the max — which equals the descending-sorted value at index 0.

    Implemented as an exact RADIX SELECT instead of a full sort: floats map to
    order-isomorphic uint32 keys (sign-magnitude -> two's-complement trick),
    then 32 bit-descent rounds each keep the highest threshold T with
    count(key >= T) >= k+1 — which lands EXACTLY on the (k+1)-th largest key,
    ties included (count(key >= v) >= k+1 and count(key >= v+1) <= k). Each
    round is one broadcast compare + row-sum over the VMEM-resident (N, P)
    block, so the whole selection is bandwidth-trivial where a full
    jnp.sort of (N, 8732) pays O(log^2 P) bitonic passes on TPU. Bitwise-equal
    to the sort+gather formulation (pinned by test_multibox.py)."""
    p = x.shape[-1]
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    key = jnp.where(
        (bits >> 31) == 0,
        bits ^ jnp.uint32(0x80000000),  # non-negative: set the high bit
        ~bits,  # negative: flip everything (reverses their order)
    )
    target = (jnp.clip(k, 0, p - 1) + 1).astype(jnp.uint32)  # rank to match

    def body(i, t):
        cand = t | (jnp.uint32(1) << (31 - i))
        cnt = (key >= cand[:, None]).sum(-1).astype(jnp.uint32)
        return jnp.where(cnt >= target, cand, t)

    t = jax.lax.fori_loop(0, 32, body, jnp.zeros(x.shape[:-1], jnp.uint32))
    out_bits = jnp.where((t >> 31) == 1, t ^ jnp.uint32(0x80000000), ~t)
    return jax.lax.bitcast_convert_type(out_bits, jnp.float32)


def split_pos_neg(pos_num: jax.Array, neg_num: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Enforce pos:neg = 1:3 (reference: src/model/ssd.py:300-311).

    If 3*pos > neg then pos <- neg // 3 (neg unchanged), else neg <- 3*pos.
    Verified truth table (SURVEY.md): (10, 8722) -> (10, 30); (4000, 4732) -> (1577, 4732).
    """
    cond = pos_num * 3 > neg_num
    return (
        jnp.where(cond, neg_num // 3, pos_num),
        jnp.where(cond, neg_num, pos_num * 3),
    )


def multibox_loss(
    outputs: jax.Array,
    targets: jax.Array,
    default_boxes: jax.Array,
    alpha: float = 1.0,
    match_threshold: float = 0.25,
) -> jax.Array:
    """Scalar MultiBox loss.

    outputs: (N, P, 4+C) raw head outputs (deltas + class logits),
    targets: (N, G, 4+C) center-form GT + one-hot(C) with void at index 0;
             zero-padded rows are inert,
    default_boxes: (P, 4) anchor table,
    alpha: loc-loss weight (reference default a=1, src/model/ssd.py:181).
    """
    n, p, _ = outputs.shape
    loc = outputs[..., :4]
    cls = outputs[..., 4:]
    gt_boxes = targets[..., :4]
    gt_cls = targets[..., 4:]

    is_match = B.match_mask(gt_boxes, default_boxes, match_threshold)  # (N, P, G) bool
    match_f = is_match.astype(loc.dtype)

    # localization loss (reference: ssd.py:202-204), computed per coordinate so
    # no (N, P, G, 4) tensor ever materializes — the largest loss intermediates
    # stay (N, P, G) and XLA fuses the whole chain into one pass
    g = gt_boxes[:, None, :, :]  # (N, 1, G, 4)
    d = default_boxes[None, :, None, :]  # (1, P, 1, 4)
    sl1_sum = B.smooth_l1(loc[:, :, None, 0] - (g[..., 0] - d[..., 0]) / d[..., 2])
    sl1_sum += B.smooth_l1(loc[:, :, None, 1] - (g[..., 1] - d[..., 1]) / d[..., 3])
    g_w, g_h = g[..., 2], g[..., 3]
    ghat_w = jnp.where(g_w > 0, jnp.log(jnp.where(g_w > 0, g_w, 1.0) / d[..., 2]), g_w)
    ghat_h = jnp.where(g_h > 0, jnp.log(jnp.where(g_h > 0, g_h, 1.0) / d[..., 3]), g_h)
    sl1_sum += B.smooth_l1(loc[:, :, None, 2] - ghat_w)
    sl1_sum += B.smooth_l1(loc[:, :, None, 3] - ghat_h)
    l_loc = (sl1_sum * match_f).sum(-1)  # (N, P)

    # positive confidence loss (reference: ssd.py:208-209)
    ce_pos = B.pairwise_softmax_ce(cls, gt_cls)  # (N, P, G)
    l_conf_pos = (ce_pos * match_f).sum(-1)  # (N, P)

    # negative confidence loss vs the void class (reference: ssd.py:212-215)
    any_match = is_match.sum(-1)  # (N, P) int
    not_match_f = (any_match == 0).astype(loc.dtype)
    l_conf_neg = B.void_softmax_ce(cls) * not_match_f  # (N, P)

    # hard-negative mining (reference: ssd.py:218-223)
    pos_num = (any_match != 0).sum(-1)  # (N,)
    neg_num = p - pos_num
    pos_k, neg_k = split_pos_neg(pos_num, neg_num)

    pos_valid = l_conf_pos > kth_plus_one_threshold(l_conf_pos, pos_k)[:, None]
    neg_valid = l_conf_neg > kth_plus_one_threshold(l_conf_neg, neg_k)[:, None]

    # reduction (reference: ssd.py:226-227): per-image sum / pos_k, 0 when pos_k == 0
    recip = jnp.where(pos_k > 0, 1.0 / jnp.maximum(pos_k, 1).astype(loc.dtype), 0.0)
    per_image = ((alpha * l_loc + l_conf_pos) * pos_valid + l_conf_neg * neg_valid).sum(-1)
    return (per_image * recip).mean()
