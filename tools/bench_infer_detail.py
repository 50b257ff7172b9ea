"""Decompose the inference pipeline cost: device compute vs dispatch/D2H vs NMS.

Measures, in ONE process (so compiles are shared and the persistent cache is
seeded for every other tool):
  A. full pipeline, device-side only (block_until_ready, no host readback)
  B. full pipeline + D2H of the compacted (N,K,·) results (what the CLIs do)
  C. forward+decode+score only (no NMS / top-K)
  D. NMS+top-K only, on a precomputed (N,8732,25) tensor

Usage: python tools/bench_infer_detail.py [--batch_size 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# same persistent compile cache as the CLIs (utils/cache.py default), so this
# tool warms the cache the CLIs actually read (advisor r2)
from object_detection_torch2_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def timed(fn, iters, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0  # ms/iter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_detection_torch2_tpu.core.anchors import default_boxes
    from object_detection_torch2_tpu.core.boxes import decode_boxes
    from object_detection_torch2_tpu.data.augment import to_tensor_batch
    from object_detection_torch2_tpu.infer import build_detection_pipeline
    from object_detection_torch2_tpu.models.ssd import SSD
    from object_detection_torch2_tpu.ops import calc_scores, non_maximum_suppression, top_k_detections

    model = SSD(num_classes=21, dtype=getattr(jnp, args.dtype))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), train=False)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (args.batch_size, 300, 300, 3)).astype(np.uint8))
    df = jnp.asarray(default_boxes())

    results = {}
    t_comp0 = time.time()

    # C. forward + decode + score (no NMS), three BN regimes
    @jax.jit
    def fwd_only(variables, images_u8):
        out = model.apply(variables, to_tensor_batch(images_u8), train=False,
                          use_batch_stats=True, mutable=["batch_stats"])[0]
        return jnp.concatenate([decode_boxes(out, df), calc_scores(out)], axis=-1)

    results["fwd_decode_score_ms"] = round(timed(fwd_only, args.iters, variables, images), 2)
    print("C done", time.time() - t_comp0, file=sys.stderr, flush=True)

    @jax.jit
    def fwd_masked(variables, images_u8):
        mask = (jnp.arange(images_u8.shape[0]) < args.batch_size).astype(jnp.float32)
        out = model.apply(variables, to_tensor_batch(images_u8), train=False,
                          use_batch_stats=True, batch_mask=mask, mutable=["batch_stats"])[0]
        return jnp.concatenate([decode_boxes(out, df), calc_scores(out)], axis=-1)

    results["fwd_masked_bn_ms"] = round(timed(fwd_masked, args.iters, variables, images), 2)
    print("C2 done", file=sys.stderr, flush=True)

    @jax.jit
    def fwd_running(variables, images_u8):
        out = model.apply(variables, to_tensor_batch(images_u8), train=False,
                          use_batch_stats=False)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.concatenate([decode_boxes(out, df), calc_scores(out)], axis=-1)

    results["fwd_running_stats_ms"] = round(timed(fwd_running, args.iters, variables, images), 2)
    print("C3 done", file=sys.stderr, flush=True)

    post = fwd_only(variables, images)
    post = jax.block_until_ready(post)

    # D. NMS + top-K on the precomputed tensor
    @jax.jit
    def nms_only(post):
        kept = non_maximum_suppression(post, iou_thresh=0.5)
        return top_k_detections(kept, 200)

    results["nms_topk_ms"] = round(timed(nms_only, args.iters, post), 2)
    print("D done", file=sys.stderr, flush=True)

    # A/B. full fused pipeline
    run = build_detection_pipeline(model, use_batch_stats=True)

    def device_only(variables, images):
        return run(variables, images, args.batch_size)

    results["pipeline_device_ms"] = round(timed(device_only, args.iters, variables, images), 2)
    print("A done", file=sys.stderr, flush=True)

    def with_d2h(variables, images):
        packed, n_valid = run(variables, images, args.batch_size)
        return np.asarray(packed)

    out = with_d2h(variables, images)  # warm
    t0 = time.time()
    for _ in range(args.iters):
        out = with_d2h(variables, images)
    results["pipeline_with_d2h_ms"] = round((time.time() - t0) / args.iters * 1000, 2)

    # E. raw dispatch+D2H latency floor through this runtime: a trivial program
    @jax.jit
    def tiny(x):
        return x + 1

    xs = jnp.zeros((8,), jnp.float32)
    tiny(xs).block_until_ready()
    t0 = time.time()
    for _ in range(args.iters):
        _ = np.asarray(tiny(xs))
    results["dispatch_d2h_floor_ms"] = round((time.time() - t0) / args.iters * 1000, 2)

    # E2. async dispatch rate (no per-iter fetch): how fast can the host QUEUE
    # work? If this floor matches the per-call timings above, those measured
    # dispatch overhead, not device compute.
    t0 = time.time()
    out = None
    for _ in range(args.iters * 5):
        out = tiny(xs)
    out.block_until_ready()
    results["async_dispatch_floor_ms"] = round((time.time() - t0) / (args.iters * 5) * 1000, 2)

    # F. TRUE device time of the forward: 10 chained forwards inside ONE
    # program (no per-iteration dispatch), reported per-forward.
    @jax.jit
    def fwd_x10(variables, images_u8):
        x = to_tensor_batch(images_u8)

        def body(_, carry):
            s, x = carry
            # thread s into the input so XLA cannot hoist the loop-invariant body
            out = model.apply(variables, x + s * 1e-12, train=False, use_batch_stats=True,
                              mutable=["batch_stats"])[0]
            return s + out.sum().astype(jnp.float32) * 1e-12, x
        s, _ = jax.lax.fori_loop(0, 10, body, (jnp.float32(0), x))
        return s

    def fwd_x10_run(variables, images):
        return fwd_x10(variables, images)

    results["fwd_device_ms_per_fwd"] = round(timed(fwd_x10_run, max(args.iters // 4, 3), variables, images) / 10, 2)

    results["batch_size"] = args.batch_size
    results["platform"] = jax.devices()[0].platform
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
