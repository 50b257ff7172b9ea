"""Evaluation entry point (reference: src/evaluate.py:74-187).

VOC2007 test -> same device pipeline as inference through NMS, then batched
first-claim TP assignment + per-class AP. The parity metric (default) matches
the reference's recall-equivalent "average precision" (quirk Q5) so results
compare directly against the published 0.314 mAP; --strict_ap computes proper
score-ranked AP as well. Writes the reference's markdown report.

The whole device side — forward, decode, score, NMS, top-K compaction, and the
TP-assignment matcher — is ONE compiled program per batch; only the compacted
(N, C, K) match tensors come back to host (K=200 vs the former P=8732 — ~45x
less D2H per batch). Ragged final batches are masked (pad rows excluded from
BN batch statistics and from detections/GTs) rather than recompiled.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from object_detection_torch2_tpu.cli import common
from object_detection_torch2_tpu.data.loader import DataLoader
from object_detection_torch2_tpu.data.records import RecordDataset
from object_detection_torch2_tpu.data.voc import PascalVOCDataset
from object_detection_torch2_tpu.infer import build_detection_pipeline
from object_detection_torch2_tpu.metrics.ap import APAccumulator
from object_detection_torch2_tpu.metrics.assign import detection_matches
from object_detection_torch2_tpu.ops import expand_detections
from object_detection_torch2_tpu.parallel import mesh as mesh_lib
from object_detection_torch2_tpu.utils.hostsync import FetchPipeline
from object_detection_torch2_tpu.utils.report import write_report


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_args(parser, batch_size_default=2)
    parser.add_argument("--strict_ap", action="store_true", help="also report proper score-ranked AP")
    parser.add_argument("--max_detections", type=int, default=200,
                        help="device-side top-K compaction bound (post-NMS survivors)")
    parser.add_argument("--batches_per_dispatch", type=int, default=1,
                        help="evaluate K batches per compiled dispatch (in-graph scan; "
                             "per-batch semantics unchanged — the serving analog of "
                             "train's --steps_per_dispatch; leftover batches run single)")
    parser.add_argument("--d2h_half", action="store_true",
                        help="fetch match scores as float16 (~5e-4 quantization) — halves "
                             "the per-batch device->host payload, which bounds throughput "
                             "through bandwidth-limited runtimes; default f32 is bit-exact")
    common.add_serving_args(parser)
    return parser.parse_args(argv)


def build_eval_pipeline(model, use_batch_stats: bool, imsize: int, num_classes: int,
                        max_detections: int = 200, mesh=None, d2h_half: bool = False):
    """(variables, images_u8, gts, n_real) -> (detection_matches dict at K rows,
    n_valid) as one jitted program.

    mesh: optional data-parallel Mesh — images/GTs shard over the batch axis,
    variables replicate; the TP-assignment matcher is per-image math, so GSPMD
    splits it over chips with no collectives (only the BN batch stats reduce
    globally). Sharded output ≡ single-device (tests/test_parallel.py).

    Like the detection pipeline, the runner also accepts K-STACKED input —
    images (K, N, H, W, 3), gts (K, N, G, 25), n_real (K,) — scanning K batches
    inside ONE compiled program (--batches_per_dispatch) with per-micro-batch
    semantics unchanged; results gain a leading K axis."""
    # The inner detect is built mesh=None (run_dp below shards via input
    # placement instead), so it cannot see whether the batch is sharded —
    # pass the shard_map-wrapped dense-NMS backend whenever THIS pipeline has
    # a mesh (GSPMD cannot partition a bare Pallas dense branch, see
    # build_detection_pipeline).
    from object_detection_torch2_tpu.ops.nms import sharded_dense_backend

    detect = build_detection_pipeline(model, use_batch_stats, imsize, max_detections=max_detections,
                                      nms_dense_backend=sharded_dense_backend(mesh) if mesh is not None else None)

    def body(variables, images_u8, gts, n_real):
        packed, n_valid = detect(variables, images_u8, n_real)
        boxes, classes, scores = packed[..., :4], packed[..., 4].astype(jnp.int32), packed[..., 5]
        compact = expand_detections(boxes, classes, scores, num_classes + 1)
        mask = (jnp.arange(gts.shape[0]) < n_real).astype(gts.dtype)
        matches = detection_matches(compact, gts * mask[:, None, None], num_classes=num_classes)
        if d2h_half:  # halve the largest D2H leaf (scores); `correct` is already bool
            matches = {**matches, "scores": matches["scores"].astype(jnp.float16)}
        return matches, n_valid

    run1 = jax.jit(body)

    @jax.jit
    def runk(variables, images_u8, gts, n_real):
        return jax.lax.scan(
            lambda c, xs: (c, body(variables, *xs)), None, (images_u8, gts, n_real)
        )[1]

    def run(variables, images_u8, gts, n_real):
        if images_u8.ndim == 5:
            return runk(variables, images_u8, gts, jnp.asarray(n_real))
        return run1(variables, images_u8, gts, n_real)

    if mesh is None:
        return run

    def run_dp(variables, images_u8, gts, n_real):
        # shard_batch/replicate = device_put single-process; multi-process they
        # assemble global arrays from each process's local data (--distributed)
        return run(
            mesh_lib.replicate(mesh, variables),
            mesh_lib.shard_batch(mesh, images_u8, batch_axis=images_u8.ndim - 4),
            mesh_lib.shard_batch(mesh, gts, batch_axis=gts.ndim - 3),
            n_real,
        )

    return run_dp


def main(argv=None):
    args = parse_args(argv)
    common.enable_cli_caches()
    weights_path = Path(args.result_dir) / "detection" / args.weights
    out_dir = Path(args.result_dir) / "detection"
    proc, nproc = common.init_serving_distributed(args)
    mesh = common.serving_mesh(args)
    # per-process rows of each global batch (--distributed: the DataLoader
    # yields this process's contiguous slice; single-process: the whole batch)
    local_bs = args.batch_size // nproc

    if args.records_dir:
        dataset = RecordDataset(args.records_dir)
    else:
        dataset = PascalVOCDataset(
            "detection", args.data_dirs or common.DEFAULT_TEST_DIRS, "test.txt", args.imsize
        )
    loader = DataLoader(dataset, args.batch_size, max_gt=args.max_gt, drop_last=False,
                        num_workers=args.num_workers)

    model, variables, labelmap = common.build_ssd(args, weights_path)
    if args.full_int8:
        model, variables = common.apply_full_int8(
            args, model, variables, common.calib_image_batches(loader, args.calib_batches))
    elif args.trunk_int8:
        model, variables = common.apply_trunk_int8(args, model, variables)
    variables = jax.tree.map(jnp.asarray, variables)

    num_classes = len(labelmap)
    run = build_eval_pipeline(
        model, args.bn_mode == "batch", args.imsize, num_classes, args.max_detections, mesh=mesh,
        d2h_half=args.d2h_half,
    )
    acc = APAccumulator(num_classes)

    truncated = False

    def drain(done):
        nonlocal truncated
        matches, n_valid, stacked = done
        # local_rows = np.asarray single-process; multi-process it fetches only
        # THIS process's rows of the batch-sharded global match tensors (pad
        # rows are inert: zero GTs, zero scores — they contribute nothing)
        axis = 1 if stacked else 0  # (K, N, ...) stacks shard axis 1
        matches = jax.tree.map(lambda x: mesh_lib.local_rows(x, axis), matches)
        n_valid = mesh_lib.local_rows(n_valid, axis)
        if stacked:  # K-stacked dispatch: accumulate each micro-batch's matches
            for k in range(n_valid.shape[0]):
                acc.update(jax.tree.map(lambda x: x[k], matches))
        else:
            acc.update(matches)
        truncated |= int(np.max(n_valid)) > args.max_detections

    # per-batch progress (reference: evaluate.py:118-121 tqdm); auto-disabled on
    # non-TTY. Pipelined (utils.hostsync.FetchPipeline): each batch's match
    # tensors start their async D2H at dispatch and are accumulated two batches
    # later, overlapping device compute with the host round trip. With
    # --batches_per_dispatch K, K padded batches are stacked and scanned inside
    # one program (leftover batches at the end run through the single program).
    pipe = FetchPipeline()
    group: list[tuple] = []

    def dispatch_group():
        imgs = jnp.asarray(np.stack([g[0] for g in group]))
        gts_s = jnp.asarray(np.stack([g[1] for g in group]))
        reals = np.asarray([g[2] for g in group], np.int32)
        matches, n_valid = run(variables, imgs, gts_s, reals)
        group.clear()
        return pipe.push((matches, n_valid, True))

    remaining = len(dataset)
    for images_u8, gts in tqdm(loader, total=len(loader), unit="batch",
                               disable=None if proc == 0 else True):
        images_u8 = np.asarray(images_u8)
        gts = np.asarray(gts, np.float32)
        # n_real is the GLOBAL real count (the mask in the jitted pipeline is
        # over global rows); multi-process, the loader yields only this
        # process's slice, so the count comes from the deterministic
        # contiguous order (shuffle=False, drop_last=False), not len(slice)
        real = images_u8.shape[0] if nproc == 1 else min(args.batch_size, remaining)
        remaining -= min(args.batch_size, remaining)
        images_u8 = common.pad_rows(images_u8, local_bs)
        gts_p = common.pad_rows(gts, local_bs)
        if args.batches_per_dispatch > 1:
            group.append((images_u8, gts_p, real))
            done = dispatch_group() if len(group) == args.batches_per_dispatch else None
        else:
            matches, n_valid = run(variables, jnp.asarray(images_u8), jnp.asarray(gts_p), real)
            done = pipe.push((matches, n_valid, False))
        if done is not None:
            drain(done)
    for images_u8, gts_p, real in group:  # tail: single-batch program, no recompile
        matches, n_valid = run(variables, jnp.asarray(images_u8), jnp.asarray(gts_p), real)
        done = pipe.push((matches, n_valid, False))
        if done is not None:
            drain(done)
    for done in pipe.flush():
        drain(done)
    if truncated:
        print(f"warning: >{args.max_detections} post-NMS detections in a batch; "
              "lowest-scored were dropped (raise --max_detections)")

    if nproc > 1:  # all-gather the per-process accumulator state; every
        # process then computes the identical global result
        from object_detection_torch2_tpu.metrics.ap import merge_accumulators_across_processes

        acc = merge_accumulators_across_processes(acc)

    aps, mean_ap = acc.result(strict=False)
    strict_mean = strict_aps = None
    if args.strict_ap:
        strict_aps, strict_mean = acc.result(strict=True)
    if proc == 0:
        print("mAP (reference parity metric):", round(mean_ap, 4))
        if strict_mean is not None:
            print("mAP (strict, score-ranked):", round(strict_mean, 4))
        path = write_report(out_dir, vars(args), aps, mean_ap, labelmap)
        print("report:", path)
        print("Finished Evaluate")
    return aps, mean_ap, strict_mean, strict_aps


if __name__ == "__main__":
    main()
