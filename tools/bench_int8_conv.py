"""Does XLA:TPU reach the v5e's 2x int8 MXU rate on this model's conv shapes?

Decision microbench for the int8-frozen-trunk idea (round 4/5): the flagship
recipe freezes the VGG trunk (reference parity: src/train.py freezes nothing,
but our flagship arm trains heads-only per PROOF_PRETRAINED_TRUNK), so trunk
weights are inference-only constants and COULD be served as int8 — v5e peak is
394 TOPS int8 vs 197 TFLOP/s bf16. This tool measures whether
`lax.conv_general_dilated` on s8xs8->s32 actually runs ~2x bf16 on the trunk's
square conv shapes, or whether XLA upcasts / falls off the MXU fast path.
Only if the win is real does the quantization workstream proceed.

Timing: NOTES_ROUND3 tunnel-proof accounting — runtime-trip-count fori_loop
chained through a feedback data dependency (output requantized into the next
input, so no iteration is DCE-able), scalar fetch, k vs 2k differencing.

Usage: python tools/bench_int8_conv.py [--iters 30] [--batch_size 32]
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

# Square (C_in == C_out, SAME pad, stride 1) trunk-representative shapes so the
# output can feed back as the next input: (name, H, C).
SHAPES = [
    ("2_2-like", 150, 128),
    ("3_2-like", 75, 256),
    ("4_2-like", 38, 512),
    ("5_2-like", 19, 512),
]


def conv_gflop(n, h, c):
    return 2.0 * n * h * h * 9 * c * c / 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} bs={args.batch_size}",
          file=sys.stderr, flush=True)

    def timed(chain, x, iters):
        def run(k):
            t0 = time.time()
            v = float(chain(x, k))
            assert v == v, "nan"
            return time.time() - t0

        run(2)
        t1 = min(run(iters) for _ in range(3))
        t2 = min(run(2 * iters) for _ in range(3))
        return (t2 - t1) / iters * 1000.0

    rows = []
    for name, h, c in SHAPES:
        n = args.batch_size
        x8 = jnp.asarray(rng.integers(-127, 127, (n, h, h, c)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)
        xb = jnp.asarray(rng.standard_normal((n, h, h, c)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)

        @jax.jit
        def chain_i8(x, k, w8=w8):
            def body(i, x):
                y = lax.conv_general_dilated(
                    x, w8, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                # requant feedback: arithmetic shift keeps values in int8 range
                # and makes every iteration's conv live
                return lax.shift_right_arithmetic(y, 12).astype(jnp.int8)

            out = lax.fori_loop(0, k, body, x)
            return out.astype(jnp.int32).sum()

        @jax.jit
        def chain_bf(x, k, wb=wb):
            def body(i, x):
                y = lax.conv_general_dilated(
                    x, wb, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                return (y * 0.05).astype(jnp.bfloat16)

            out = lax.fori_loop(0, k, body, x)
            return out.astype(jnp.float32).sum()

        ms_i8 = timed(chain_i8, x8, args.iters)
        ms_bf = timed(chain_bf, xb, args.iters)
        gf = conv_gflop(n, h, c)
        rows.append({
            "shape": name, "hw": h, "c": c, "gflop": round(gf, 1),
            "bf16_ms": round(ms_bf, 3), "int8_ms": round(ms_i8, 3),
            "speedup": round(ms_bf / ms_i8, 2),
            "bf16_tflops": round(gf / ms_bf, 1),
            "int8_tops": round(gf / ms_i8, 1),
        })
        print(f"{name}: bf16 {ms_bf:.3f} ms ({gf/ms_bf:.0f} TF/s) | "
              f"int8 {ms_i8:.3f} ms ({gf/ms_i8:.0f} TOP/s) | "
              f"speedup {ms_bf/ms_i8:.2f}x", file=sys.stderr, flush=True)

    print(json.dumps({"batch_size": args.batch_size, "layers": rows}))


if __name__ == "__main__":
    main()
