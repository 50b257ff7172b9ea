"""Wall-time comparison: Pallas conv12 kernel vs the XLA block-sparse paired conv.

Judge r2 next-round #4 ("make Pallas pay or park it"): the kernel does 4/3 of
the dense FLOPs (all K=128 MXU dots) where the XLA paired formulation does 2x
(half structural zeros). This measures both on the production shape
(bs, 300, 150, 128) bf16, timing loops chained through data dependencies so a
remote runtime cannot hide dispatch/queue artifacts (round-2 lesson).

Usage: python tools/bench_conv12.py [--batch_size 32] [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from object_detection_torch2_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def timed_chain(fn, x, w, b, iters):
    """Each iteration feeds the previous output back in (scaled to keep
    magnitudes stable), forcing true serialization."""
    import jax

    @jax.jit
    def chain(x, w, b):
        def body(i, x):
            y = fn(x, w, b)
            return 0.1 * y + 0.9 * x  # keep shape/scale; data-dependent

        return jax.lax.fori_loop(0, iters, body, x)

    out = chain(x, w, b)
    jax.block_until_ready(out)  # compile+warm
    t0 = time.time()
    out = chain(x, w, b)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0  # ms/iter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.ops.conv12_pallas import _conv12_pallas, _xla_paired, pick_tile_h

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    n, h, wp, c = args.batch_size, 300, 150, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, wp, 2 * c)), dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    tile = pick_tile_h(h, wp)
    print(f"platform={jax.devices()[0].platform} shape={x.shape} dtype={args.dtype} tile_h={tile}")

    def pallas_fn(x, w, b):
        return _conv12_pallas(x, w, b, tile).astype(x.dtype)

    def xla_fn(x, w, b):
        return _xla_paired(x, w, b).astype(x.dtype)

    ms_xla = timed_chain(xla_fn, x, w, b, args.iters)
    ms_pal = timed_chain(pallas_fn, x, w, b, args.iters)

    dense_gflop = 2 * n * h * wp * 2 * 9 * c * c / 1e9  # useful (unpaired) conv FLOPs
    rec = {
        "shape": list(x.shape),
        "dtype": args.dtype,
        "xla_paired_ms": round(ms_xla, 4),
        "pallas_ms": round(ms_pal, 4),
        "speedup": round(ms_xla / ms_pal, 3),
        "useful_gflop": round(dense_gflop, 2),
        "xla_effective_tflops": round(dense_gflop / ms_xla, 1),
        "pallas_effective_tflops": round(dense_gflop / ms_pal, 1),
        "note": "effective TFLOP/s = USEFUL (dense) flops / wall; XLA does 2x useful, pallas 4/3x",
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
