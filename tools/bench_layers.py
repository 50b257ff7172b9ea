"""Per-layer forward wall-time attribution for the SSD300 train-mode forward.

Times the REAL model forward truncated after each layer (`SSD.__call__
up_to=`) and differences successive prefixes, so each layer's cost is measured
in its true fusion context (BN reductions fused into conv epilogues, pools
fused into consumers) rather than as an isolated microbench. Tunnel-proof
accounting (NOTES_ROUND3.md): iterations are chained through a data dependency
inside ONE jitted program with a RUNTIME trip count (one compile per prefix),
completion is forced by a scalar fetch, and dispatch/fetch constants cancel by
differencing k vs 2k trip counts.

Per layer it prints: marginal ms, useful conv GFLOP (dense, bs-included),
effective TFLOP/s and MFU vs the v5e bf16 peak — the map of where the forward's
~13.5 ms (bs32) go and which layers sit farthest below roofline.

Measured map (v5e, bs32 bf16, 2026-08-18; element-probe run for the trunk —
valid there because every truncated output is batch-stat-normalized, so the
full prior conv survives DCE — plus the sum-probe run for heads):
trunk+extras ~11.2 ms with convs 2_2..6_1 at 90-110% MFU; heads+concat
0.83 ms; the two structural losses are conv_1_1 (0.74 ms, 7% MFU — BOUND BY
its 368 MB bf16 output write, not FLOPs; floor ~0.46 ms) and conv_2_1
(1.19 ms, 45% — half-lane 64-channel input; extending the paired-x layout
into block 2 nets NEGATIVE: 2_2 already runs 93% dense, staggering it costs
4/3 FLOPs, and the re-pair/unpair shuffles ~92-184 MB). Cross-checks
bench_step_breakdown's 13.69 ms forward. Remaining forward headroom ~1 ms.

Usage: python tools/bench_layers.py [--batch_size 32] [--iters 30]
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

V5E_BF16_PEAK_TFLOPS = 197.0

# (prefix, H_out, W_out, C_in, C_out, k, flop_factor). H/W are the layer's
# OUTPUT resolution — conv_gflop computes dense conv FLOPs at the output grid
# (e.g. 8_2's 10x10), NOT the input grid; the staggered conv_1_2 does 4/3 of
# dense.
PREFIXES = [
    ("1_1", 300, 300, 3, 64, 3, 1.0),
    ("1_2", 300, 300, 64, 64, 3, 4.0 / 3.0),  # staggered 4-tap (incl. pool_1)
    ("2_1", 150, 150, 64, 128, 3, 1.0),
    ("2_2", 150, 150, 128, 128, 3, 1.0),      # incl. pool_2
    ("3_1", 75, 75, 128, 256, 3, 1.0),
    ("3_2", 75, 75, 256, 256, 3, 1.0),
    ("3_3", 75, 75, 256, 256, 3, 1.0),        # incl. pool_3 (M_P -> 38)
    ("4_1", 38, 38, 256, 512, 3, 1.0),
    ("4_2", 38, 38, 512, 512, 3, 1.0),
    ("4_3", 38, 38, 512, 512, 3, 1.0),        # incl. pool_4
    ("5_1", 19, 19, 512, 512, 3, 1.0),
    ("5_2", 19, 19, 512, 512, 3, 1.0),
    ("5_3", 19, 19, 512, 512, 3, 1.0),
    ("6_1", 19, 19, 512, 1024, 3, 1.0),
    ("7_1", 19, 19, 1024, 1024, 1, 1.0),
    ("8_1", 19, 19, 1024, 256, 1, 1.0),
    ("8_2", 10, 10, 256, 512, 3, 1.0),        # stride 2
    ("9_1", 10, 10, 512, 128, 1, 1.0),
    ("9_2", 5, 5, 128, 256, 3, 1.0),          # stride 2
    ("10_1", 5, 5, 256, 128, 1, 1.0),
    ("10_2", 3, 3, 128, 256, 3, 1.0),         # VALID
    ("11_1", 3, 3, 256, 128, 1, 1.0),
    ("11_2", 1, 1, 128, 256, 3, 1.0),         # VALID
    (None, 0, 0, 0, 0, 0, 1.0),               # full forward (heads + concat)
]


def conv_gflop(n, h, w, cin, cout, k, factor):
    return 2.0 * n * h * w * k * k * cin * cout * factor / 1e9


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.models.ssd import SSD

    n = args.batch_size
    model = SSD(num_classes=21, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (n, 300, 300, 3)), jnp.uint8)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((2, 300, 300, 3), jnp.uint8)))()
    print(f"platform={jax.devices()[0].platform} bs={n}", file=sys.stderr, flush=True)

    def time_prefix(up_to):
        @jax.jit
        def chain(x, k):
            def body(i, carry):
                x, s = carry
                out, _ = model.apply(variables, x + (s * 1e-30).astype(x.dtype),
                                     train=True, up_to=up_to, mutable=["batch_stats"])
                # full-tensor reduction, NOT out[0]: a single-element probe lets
                # XLA simplify the heads' concat+slice down to one head and DCE
                # the other five plus the extras feeding them (observed: the
                # FULL-forward prefix measured LESS than the 11_2 prefix). The
                # sum forces every element; its own cost (<0.1 ms even on the
                # 150x150 activations) is the accepted attribution error.
                return x, out.astype(jnp.float32).sum()

            _, s = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))
            return s

        def run(k):
            t0 = time.time()
            v = float(chain(x, k))
            assert v == v, "nan"
            return time.time() - t0

        run(2)  # compile + warm
        t1 = min(run(args.iters) for _ in range(3))
        t2 = min(run(2 * args.iters) for _ in range(3))
        return (t2 - t1) / args.iters * 1000.0

    cum = []
    for spec in PREFIXES:
        ms = time_prefix(spec[0])
        cum.append((spec, ms))
        print(f"prefix {spec[0] or 'FULL':>5}: cumulative {ms:8.3f} ms", file=sys.stderr, flush=True)

    rows = []
    prev = 0.0
    for (name, h, w, cin, cout, k, factor), ms in cum:
        marginal = ms - prev
        prev = ms
        if name is None:
            gf = 0.0
            name = "heads+concat"
        else:
            gf = conv_gflop(n, h, w, cin, cout, k, factor)
        tflops = gf / marginal if marginal > 0 else float("nan")
        rows.append({
            "layer": name,
            "marginal_ms": round(marginal, 3),
            "gflop": round(gf, 1),
            "tflops": round(tflops, 1),
            "mfu_pct": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
        })
    total = cum[-1][1]
    print(json.dumps({"batch_size": n, "forward_ms": round(total, 3), "layers": rows}))
    print(f"\n{'layer':>12} {'ms':>8} {'GFLOP':>8} {'TFLOP/s':>8} {'MFU%':>6}", file=sys.stderr)
    for r in rows:
        print(f"{r['layer']:>12} {r['marginal_ms']:>8.3f} {r['gflop']:>8.1f} "
              f"{r['tflops']:>8.1f} {r['mfu_pct']:>6.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
