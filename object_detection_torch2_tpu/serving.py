"""Portable serving artifacts: the detection pipeline as serialized StableHLO.

The reference's only deployment story is "clone the repo and run
inference.py" (reference: src/inference.py:13-103 — model construction,
weights load, and the post-processing Python loops are all required at the
serving site). The TPU-native analog is `jax.export`: the WHOLE pipeline —
normalize, SSD forward, decode, score, NMS, top-K compaction — is traced once
into a single StableHLO program with the trained weights embedded as
constants, serialized to one file, and reloadable WITHOUT this package's
model code (any JAX of a compatible calling-convention version can
deserialize and run it, on the platforms baked in at export time).

Why this shape:
- weights-as-constants makes the artifact self-contained (one file to ship)
  and lets XLA constant-fold/fuse through them at AOT compile time;
- the artifact carries the same (packed (N,K,6), n_valid) contract as
  `build_detection_pipeline`, so `unpack_detections` / `Detections` work
  unchanged on its output;
- multi-platform lowering (default tpu+cpu) means one artifact serves on TPU
  and still smoke-tests on a CPU host.

Limits (documented, asserted): fixed batch size (serving uses fixed batches;
ragged tails are masked via n_real exactly like the live pipeline) and no
mesh sharding inside the artifact — shard OUTSIDE by running one artifact
per data-parallel replica (serving replicas need no collectives; BN
batch-stat mode's cross-batch coupling stays within the replica's batch,
identical to a single-device run of that batch).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp

FORMAT = "object_detection_torch2_tpu/detection-pipeline"
VERSION = 1


def export_detection_pipeline(model, variables, path, *, batch_size: int,
                              use_batch_stats: bool = False, imsize: int = 300,
                              iou_thresh: float = 0.5, max_detections: int = 200,
                              platforms: tuple = ("tpu", "cpu"),
                              d2h_half: bool = False) -> dict:
    """Serialize the full detection pipeline (weights embedded) to `path`.

    Writes two files: `<path>` (the StableHLO bytes) and `<path>.json` (the
    calling contract: input/output shapes, platforms, knobs). Returns the
    metadata dict. Call signature of the artifact:
    (images_u8 (N,H,W,3) uint8, n_real () int32) -> (packed (N,K,6), n_valid (N,)).
    """
    from object_detection_torch2_tpu.infer import build_detection_pipeline

    # nms_dense_backend="xla": the artifact must lower on any host for any
    # platform list, and Pallas→Mosaic lowering requires a live TPU backend
    # ("Only interpret mode is supported on CPU backend"), so the portable
    # artifact always carries the blocked-XLA dense NMS fallback. The dense
    # path is the rare (>1024 positives/image) branch; live TPU serving via
    # Predictor/CLI still gets the kernel (ops/nms.py DENSE_BACKEND).
    run = build_detection_pipeline(
        model, use_batch_stats=use_batch_stats, imsize=imsize,
        iou_thresh=iou_thresh, max_detections=max_detections, d2h_half=d2h_half,
        nms_dense_backend="xla",
    )
    variables = jax.tree.map(jnp.asarray, variables)

    def serve(images_u8, n_real):
        return run(variables, images_u8, n_real)

    exported = jax.export.export(jax.jit(serve), platforms=list(platforms))(
        jax.ShapeDtypeStruct((batch_size, imsize, imsize, 3), jnp.uint8),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    meta = {
        "format": FORMAT,
        "version": VERSION,
        "batch_size": batch_size,
        "imsize": imsize,
        "max_detections": max_detections,
        "iou_thresh": iou_thresh,
        "use_batch_stats": use_batch_stats,
        "d2h_half": d2h_half,
        "platforms": list(platforms),
        "bytes": len(data),
    }
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(meta, indent=1))
    return meta


def load_detection_pipeline(path):
    """Deserialize an exported pipeline -> (callable, metadata).

    The callable takes (images_u8 (N,H,W,3) uint8, n_real () int32) and
    returns (packed, n_valid) — feed it to `infer.unpack_detections`. Needs
    only JAX (no model code, no weights file)."""
    path = Path(path)
    exported = jax.export.deserialize(path.read_bytes())
    meta_path = path.with_suffix(path.suffix + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}

    def run(images_u8, n_real):
        return exported.call(jnp.asarray(images_u8), jnp.asarray(n_real, jnp.int32))

    return run, meta
