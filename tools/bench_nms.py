"""NMS implementation shoot-out on the current device (BASELINE config #1/#5 shape).

Compares the three exact greedy implementations at the real problem size
(bs32 x 8732 anchors): serial loop, blocked XLA (default, with the round-3
compacted top_k fast path), Pallas VMEM kernel.

Timing is DIFFERENCED-QUEUE (k vs 2k queued dispatches, completion forced by a
value-dependent host fetch): through the dev-tunnel runtime block_until_ready
does not reliably block, which flattered this tool's round-2 numbers by ~200x
on the sparse regime (0.03 ms claimed vs 7.65 ms honest in-pipeline pre-fix —
NOTES_ROUND3.md).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.ops import nms as nms_mod
    from object_detection_torch2_tpu.ops.nms_pallas import nms_keep_mask_pallas

    print("platform:", jax.devices()[0].platform, flush=True)
    n, p = 32, 8732
    rng = np.random.default_rng(0)
    boxes = np.zeros((n, p, 4), np.float32)
    boxes[..., :2] = rng.uniform(0, 1, (n, p, 2))
    boxes[..., 2:] = rng.uniform(0.02, 0.3, (n, p, 2))
    scores = rng.uniform(0, 1, (n, p)).astype(np.float32)
    scores[:, ::2] = 0.0
    boxes_d, scores_d = jnp.asarray(boxes), jnp.asarray(scores)

    # sparse scores = trained-model regime (the early exits fire); the original
    # half-positive scores are the dense/worst-case regime
    scores_sparse = np.zeros_like(scores)
    keep_idx = rng.choice(p, 40, replace=False)
    scores_sparse[:, keep_idx] = rng.uniform(0.1, 1.0, (n, 40)).astype(np.float32)
    sparse_d = jnp.asarray(scores_sparse)

    def timed(f, sc, iters=8):
        """k vs 2k queued dispatches; a value-dependent scalar fetch bounds the
        whole queue (tunnel-proof — block_until_ready is not)."""

        def queue_n(m):
            t0 = time.time()
            out = None
            for _ in range(m):
                out = f(boxes_d, sc)
            float(out.sum())
            return time.time() - t0

        queue_n(2)  # compile + warm
        t1 = min(queue_n(iters) for _ in range(3))
        t2 = min(queue_n(2 * iters) for _ in range(3))
        return (t2 - t1) / iters * 1000

    impls = [
        ("blocked-xla", nms_mod.nms_keep_mask),
        ("pallas", nms_keep_mask_pallas),
        ("serial", nms_mod.nms_keep_mask_serial),
    ]
    if jax.devices()[0].platform != "tpu":  # the Pallas kernel is TPU-only
        impls = [(n, f) for n, f in impls if n != "pallas"]
    results = {}
    for name, fn in impls:
        f = jax.jit(fn)
        t0 = time.time()
        r = f(boxes_d, scores_d)
        r.block_until_ready()
        compile_t = time.time() - t0
        times = {}
        for regime, sc in [("dense", scores_d), ("sparse", sparse_d)]:
            iters = 2 if name == "serial" else 8  # the serial loop is ~160 ms/iter
            times[regime] = timed(f, sc, iters)
        results[name] = np.asarray(f(boxes_d, scores_d))
        print(f"{name:12s}: compile {compile_t:5.1f}s   dense {times['dense']:8.2f} ms/batch32   "
              f"sparse {times['sparse']:7.2f} ms   kept {int(results[name].sum())}", flush=True)

    np.testing.assert_array_equal(results["blocked-xla"], results["serial"])
    if "pallas" in results:
        np.testing.assert_array_equal(results["pallas"], results["serial"])
    print(f"all {len(results)} implementations bit-identical")


if __name__ == "__main__":
    main()
