"""Pallas TPU kernel: exact greedy class-agnostic NMS, fully VMEM-resident.

The reference's NMS is a per-image Python while-loop (reference:
src/utils.py:90-113, O(P^2) — SURVEY.md §2.2). ops/nms.py replaces it with a
blocked XLA formulation (the production default, ~0.03 ms/batch32 on a v5e);
this kernel expresses the same blocked algorithm as ONE Pallas program so every
intermediate — the candidate boxes, the keep mask, the per-block IoU tiles —
lives in VMEM for the entire pass:

- outer fori over score-sorted 128-wide pivot blocks;
- per block, the in-block IoU tile is computed once into a VMEM scratch
  (stored pivot-major so the sequential greedy reads rows via leading-dim
  `pl.ds` — Mosaic has no dynamic_slice on values);
- the exact in-block greedy runs 128 steps; the "is pivot i still alive"
  scalar is extracted with a masked lane-reduction (no lane-dim dynamic
  indexing);
- kept pivots then suppress all later candidates chunk-by-chunk, each cross
  tile a (N, 128, 128) VMEM temp.

Sorting stays outside the kernel (XLA's sort is fine); the kernel computes the
keep mask over sorted candidates. Bit-identical to the serial greedy loop —
see tests/test_nms_pallas.py and tools/bench_nms.py.

Measured at bs32 x 8732 on a v5e (tools/bench_nms.py): serial 135 ms, this
kernel 38 ms, blocked-XLA 0.03 ms. The kernel's literal 128-step in-block
greedy is inherently serial; the XLA default replaces it with an exact fixpoint
iteration (converges in a few fused (N,B,B) passes) and lets XLA stream the
cross-suppression as full-width ops — which is why the blocked-XLA formulation
REMAINS THE DEFAULT. This kernel is kept as the VMEM-resident reference
implementation of the kernel path (and the three implementations are asserted
bit-identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, tile_ref, *, iou_thresh, num_blocks):
    """Planes (N, Pb) f32 VMEM; keep_ref (N, Pb) f32 out; tile_ref (B, N, B) scratch."""
    n, pb = x1_ref.shape
    keep_ref[:] = valid_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, BLOCK), 1)

    def iou_rect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
        """a*: (..., A, 1)-broadcastable, b*: (..., 1, B) -> IoU (..., A, B)."""
        w = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
        h = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
        inter = w * h
        union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
        return jnp.where(inter > 0, inter / union, 0.0)

    def outer(b, _):
        start = pl.multiple_of(b * BLOCK, BLOCK)
        bx1 = x1_ref[:, pl.ds(start, BLOCK)]
        by1 = y1_ref[:, pl.ds(start, BLOCK)]
        bx2 = x2_ref[:, pl.ds(start, BLOCK)]
        by2 = y2_ref[:, pl.ds(start, BLOCK)]

        # in-block IoU tile, pivot-major: tile[i, n, j] = IoU(box_i, box_j)
        tile_ref[:] = iou_rect(
            bx1.T[:, :, None], by1.T[:, :, None], bx2.T[:, :, None], by2.T[:, :, None],
            bx1[None, :, :], by1[None, :, :], bx2[None, :, :], by2[None, :, :],
        )

        # exact greedy over the block: 128 sequential VMEM-only steps
        def inner(i, _):
            row = tile_ref[pl.ds(i, 1)][0]  # (N, B)
            cur = keep_ref[:, pl.ds(start, BLOCK)]
            alive_i = jnp.sum(cur * jnp.where(lane == i, 1.0, 0.0), axis=1, keepdims=True)
            suppress = (alive_i > 0.0) & (row > iou_thresh) & (lane > i)
            keep_ref[:, pl.ds(start, BLOCK)] = jnp.where(suppress, 0.0, cur)
            return 0

        jax.lax.fori_loop(0, BLOCK, inner, 0)
        kept_blk = keep_ref[:, pl.ds(start, BLOCK)]

        # kept pivots suppress every strictly-later candidate, 128 lanes at a time
        def cross_chunk(q, _):
            @pl.when(q > b)
            def _():
                qs = pl.multiple_of(q * BLOCK, BLOCK)
                cross = iou_rect(
                    bx1[:, :, None], by1[:, :, None], bx2[:, :, None], by2[:, :, None],
                    x1_ref[:, pl.ds(qs, BLOCK)][:, None, :], y1_ref[:, pl.ds(qs, BLOCK)][:, None, :],
                    x2_ref[:, pl.ds(qs, BLOCK)][:, None, :], y2_ref[:, pl.ds(qs, BLOCK)][:, None, :],
                )  # (N, B, B)
                hit = jnp.where(cross > iou_thresh, 1.0, 0.0) * kept_blk[:, :, None]
                killed = jnp.max(hit, axis=1)  # (N, B)
                keep_ref[:, pl.ds(qs, BLOCK)] = jnp.where(killed > 0.0, 0.0, keep_ref[:, pl.ds(qs, BLOCK)])

            return 0

        jax.lax.fori_loop(0, num_blocks, cross_chunk, 0)
        return 0

    jax.lax.fori_loop(0, num_blocks, outer, 0)


@functools.partial(jax.jit, static_argnames=("iou_thresh",))
def nms_keep_mask_pallas(boxes: jax.Array, sort_scores: jax.Array, iou_thresh: float = 0.5) -> jax.Array:
    """Drop-in equivalent of ops.nms.nms_keep_mask computed by the Pallas kernel.

    boxes: (N, P, 4) center-form, sort_scores: (N, P) -> bool (N, P) in original order.
    """
    n, p, _ = boxes.shape
    order = jnp.argsort(-sort_scores, axis=-1)
    sorted_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    sorted_valid = (jnp.take_along_axis(sort_scores, order, axis=1) > 0.0).astype(jnp.float32)

    num_blocks = -(-p // BLOCK)
    pb = num_blocks * BLOCK
    pad = pb - p
    if pad:
        sorted_boxes = jnp.pad(sorted_boxes, ((0, 0), (0, pad), (0, 0)))
        sorted_valid = jnp.pad(sorted_valid, ((0, 0), (0, pad)))

    cx, cy, w, h = (sorted_boxes[..., i] for i in range(4))
    planes = (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)

    keep_sorted = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thresh=iou_thresh, num_blocks=num_blocks),
        out_shape=jax.ShapeDtypeStruct((n, pb), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLOCK, n, BLOCK), jnp.float32)],
    )(*planes, sorted_valid)

    keep_sorted = keep_sorted[:, :p] > 0.0
    return jnp.put_along_axis(jnp.zeros((n, p), jnp.bool_), order, keep_sorted, axis=-1, inplace=False)
