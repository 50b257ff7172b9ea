"""TPU-tuned BatchNorm with single-pass fused statistics.

Profiling the SSD forward on a v5e chip showed flax's BatchNorm
(use_fast_variance=False, f32 dtype) spending ~67% of the whole forward in
`convert_reduce_fusion` ops: a bf16->f32 convert pass plus TWO reduction passes
(mean, then E[(x-mean)^2]) per layer, each re-reading the full activation from
HBM. This module computes mean and mean-of-squares in ONE multi-output fused
reduction (the f32 cast folds into the reduce), then normalizes in a single
fused elementwise kernel that reads bf16 and writes bf16 — cutting BN HBM
traffic roughly 3x. Measured: 18.4 ms -> ~11 ms forward at bs32 bf16.

Drop-in flax-compatible state layout: params {scale, bias} (f32), batch_stats
{mean, var} (f32) — converters and checkpoints are unchanged.

Parity notes vs torch BatchNorm2d (reference uses defaults, e.g. vgg16.py:34):
- normalization uses BIASED batch variance (same as torch train mode);
- running_var is updated with the UNBIASED variance (torch's n/(n-1)
  correction — flax omits it; we match torch);
- momentum: torch 0.1 == this module's default (running = 0.9*running + 0.1*batch).

Numerics trade-off (advisor r1): the single-pass variance E[x^2]-E[x]^2 in
float32 is cancellation-prone when the activation mean dominates the std (it is
clamped at 0). On realistic weights the end-to-end forward validates to ~4e-6
vs torch (tools/validate_interop.py) and the in-suite pinned golden holds 1e-4
(tests/test_models.py), but for parity DEBUGGING on badly-scaled layers set
`two_pass=True` to get torch's shifted two-pass variance E[(x-mean)^2] at the
cost of a second reduction pass over the activation.

Ragged batches (`mask`): serving pads the final short batch to the static batch
size; with batch statistics (the reference-parity mode — quirk Q9) the pad rows
would otherwise perturb the stats and thus the REAL rows' outputs (advisor r1).
Passing `mask` (N,), 1 for real rows, computes the statistics over real rows
only — since convs/pools are per-sample, the real rows' outputs then equal a
ragged-size forward exactly, with no recompile and static shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNormTPU(nn.Module):
    """`fold`: the input carries `fold` spatial phases per logical channel
    (channel slot = q*c + ch, phase-major — the paired-x layout of models/ssd.py
    block 1). Statistics reduce over the phase copies too, so params/stats stay
    (c,) and are bit-compatible with the unpaired layout; the affine is applied
    tiled. fold=1 is the plain layout."""

    use_running_average: bool = False
    momentum: float = 0.9  # keep-fraction of the running stat (flax convention)
    epsilon: float = 1e-5
    dtype: Any = None  # output dtype; None -> input dtype
    two_pass: bool = False  # torch-style shifted variance (parity debugging; slower)
    fold: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        c = x.shape[-1] // self.fold
        reduce_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        def defold(stat_full):
            """(fold*c,) phase-major slot stats -> (c,) logical-channel stats."""
            return stat_full.reshape(self.fold, c).mean(axis=0) if self.fold > 1 else stat_full

        def refold(stat):
            """(c,) -> (fold*c,) tiled back over the phase slots."""
            return jnp.tile(stat, self.fold) if self.fold > 1 else stat

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                n = x.size / c
                # one fused multi-output reduction pass: sum and sum-of-squares
                mean = defold(jnp.mean(xf, axis=reduce_axes))
                if self.two_pass:
                    var = defold(jnp.mean(jax.lax.square(xf - refold(mean)), axis=reduce_axes))
                else:
                    mean_sq = defold(jnp.mean(jax.lax.square(xf), axis=reduce_axes))
                    var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
            else:
                m = mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                per_sample = x.size / (x.shape[0] * c)  # fold*H*W elements per (sample, channel)
                n = jnp.maximum(jnp.sum(m) * per_sample, 1.0)
                mean = defold(jnp.sum(xf * m, axis=reduce_axes)) * (self.fold / n)
                if self.two_pass:
                    var = defold(jnp.sum(jax.lax.square(xf - refold(mean)) * m, axis=reduce_axes)) * (self.fold / n)
                else:
                    mean_sq = defold(jnp.sum(jax.lax.square(xf) * m, axis=reduce_axes)) * (self.fold / n)
                    var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))  # torch running-stat correction
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        out_dtype = self.dtype or x.dtype
        # single fused elementwise kernel: bf16 in -> f32 math -> out dtype
        return (x.astype(jnp.float32) * refold(inv) + refold(shift)).astype(out_dtype)
