#!/usr/bin/env python
"""Benchmark: SSD300 training throughput (images/sec/chip), full device pipeline.

Measures the flagship configuration from BASELINE.json (config #4 shape): the
complete jitted train step — device-side augmentation (uint8 in), forward,
MultiBox loss with hard-negative mining, backward, torch-semantics Adam update,
BN stat update — at batch 32, bfloat16 compute, data-parallel over all
available chips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is img/s/chip divided by the reference's estimated A100
throughput (tools/baseline_a100.py: XLA-measured train FLOPs/image x A100
TF32 roofline x cuDNN-VGG MFU band, stored with full derivation in
bench_baseline.json). The north star is >=8x A100 on a v5e-8, i.e.
vs_baseline >= 1.0 per chip. The reference published no throughput and no
NVIDIA hardware exists here, so the A100 number is an analytical bound
cross-checked against published SSD300-torch GPU runs; the same-host
torch-CPU measurement is kept in bench_baseline.json for provenance only.
Diagnostics go to stderr.
"""

import json
import sys
import time
from pathlib import Path


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_detection_torch2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from object_detection_torch2_tpu.core.anchors import default_boxes
    from object_detection_torch2_tpu.models.ssd import SSD
    from object_detection_torch2_tpu.parallel import make_mesh, shard_batch
    from object_detection_torch2_tpu.train import Trainer, adam_torch, exponential_epoch_schedule

    platform = jax.devices()[0].platform
    n_dev = len(jax.devices())
    on_tpu = platform == "tpu"
    batch_size = 32 if on_tpu else 8
    warmup, iters = (3, 20) if on_tpu else (1, 3)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"platform={platform} devices={n_dev} batch={batch_size} dtype={dtype.__name__}")

    mesh = make_mesh()
    model = SSD(num_classes=21, dtype=dtype)
    # augment=True fuses jitter/flip/erase into the train-step program: ONE host
    # dispatch per step (dispatch latency dominates through remote runtimes)
    trainer = Trainer(model, loss_kind="multibox", default_boxes=default_boxes(), mesh=mesh, augment=True)
    tx = adam_torch(exponential_epoch_schedule(1e-3, 0.95, 518), weight_decay=5e-4)
    state = trainer.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), tx)

    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 255, (batch_size, 300, 300, 3)).astype(np.uint8)
    targets = np.zeros((batch_size, 64, 25), np.float32)
    n_boxes = rng.integers(1, 6, batch_size)
    for i in range(batch_size):
        g = n_boxes[i]
        targets[i, :g, :2] = rng.uniform(0.2, 0.8, (g, 2))
        targets[i, :g, 2:4] = rng.uniform(0.1, 0.4, (g, 2))
        targets[i, np.arange(g), 4 + rng.integers(1, 21, g)] = 1.0
    images_u8, targets = shard_batch(mesh, (jnp.asarray(images_u8), jnp.asarray(targets)))

    t0 = time.time()
    for i in range(warmup):
        state, loss = trainer.train_step(state, images_u8, targets)
    loss.block_until_ready()
    log(f"compile+warmup {time.time()-t0:.1f}s, loss={float(loss):.4f}")

    t0 = time.time()
    for i in range(iters):
        state, loss = trainer.train_step(state, images_u8, targets)
    loss.block_until_ready()
    dt = time.time() - t0
    images_per_sec = batch_size * iters / dt
    per_chip = images_per_sec / n_dev
    log(f"{iters} steps in {dt:.2f}s -> {images_per_sec:.1f} img/s total, {per_chip:.1f} img/s/chip")

    vs_baseline = None
    band = None
    baseline_path = Path(__file__).parent / "bench_baseline.json"
    if baseline_path.exists():
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("a100_estimate_images_per_sec") or base.get("torch_cpu_images_per_sec")
        if ref:
            vs_baseline = per_chip / ref
        # the A100 figure is an ESTIMATE with a stated uncertainty band
        # (BASELINE.md derivation); carry the band, not just the center
        rng = base.get("a100_estimate_range_images_per_sec")
        if rng:
            band = [round(per_chip / rng[1], 2), round(per_chip / rng[0], 2)]

    print(
        json.dumps(
            {
                "metric": f"SSD300 train images/sec/chip (bs{batch_size}, {dtype.__name__}, {platform} x{n_dev})",
                "value": round(per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "vs_baseline_band": band,
                "baseline_note": "vs an ANALYTICAL A100 roofline estimate (839 img/s, band 582-1097; BASELINE.md)"
                                 if band else None,
            }
        )
    )


if __name__ == "__main__":
    main()
