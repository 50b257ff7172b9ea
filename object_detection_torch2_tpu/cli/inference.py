"""Inference entry point (reference: src/inference.py:13-103).

VOC2007 test -> jitted forward + decode + score -> batched NMS -> device-side
top-K compaction -> PIL rendering of boxes/labels (void skipped) saved as
result/detection/{n:06}.png. The whole device side (forward through NMS and
compaction) is ONE compiled program per batch (infer.build_detection_pipeline);
only (N, K, 6) comes back to host (~200x less D2H than the reference's full
(N, 8732, 25) haul, src/inference.py:65-69), and rendering reads the host
uint8 batch directly instead of round-tripping images through the device.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np
from tqdm import tqdm

from object_detection_torch2_tpu.cli import common
from object_detection_torch2_tpu.data.loader import DataLoader
from object_detection_torch2_tpu.data.records import RecordDataset
from object_detection_torch2_tpu.data.voc import PascalVOCDataset
from object_detection_torch2_tpu.infer import build_detection_pipeline, unpack_detections
from object_detection_torch2_tpu.parallel import mesh as mesh_lib
from object_detection_torch2_tpu.utils.hostsync import FetchPipeline
from object_detection_torch2_tpu.utils.render import hls_palette, render_detections_compact, save_detections


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_args(parser, batch_size_default=2)
    parser.add_argument("--max_detections", type=int, default=200,
                        help="device-side top-K compaction bound (post-NMS survivors)")
    parser.add_argument("--batches_per_dispatch", type=int, default=1,
                        help="run K batches per compiled dispatch (in-graph scan; "
                             "per-batch semantics unchanged — the serving analog of "
                             "train's --steps_per_dispatch; leftover batches run single)")
    parser.add_argument("--d2h_half", action="store_true",
                        help="fetch packed detections as float16 (~5e-4 quantization, "
                             "≲0.15 px at 300) — halves the per-batch device->host payload, "
                             "which bounds throughput through bandwidth-limited runtimes; "
                             "default f32 is bit-exact")
    parser.add_argument("--export_pipeline", type=str, default=None,
                        help="instead of running inference, serialize the whole pipeline "
                             "(weights embedded) to this path as a portable StableHLO "
                             "serving artifact (serving.py; reloadable without model code) "
                             "and exit")
    parser.add_argument("--export_platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering platforms baked into "
                             "--export_pipeline artifacts")
    common.add_serving_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    common.enable_cli_caches()
    weights_path = Path(args.result_dir) / "detection" / args.weights
    out_dir = Path(args.result_dir) / "detection"
    proc, nproc = common.init_serving_distributed(args)
    mesh = common.serving_mesh(args)
    # per-process rows of each global batch (--distributed: the DataLoader
    # yields this process's contiguous slice — global rows
    # [proc*local_bs, (proc+1)*local_bs); each process renders only those,
    # with globally-consistent output numbering)
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
    variables = jax.tree.map(jax.numpy.asarray, variables)

    if args.export_pipeline:
        from object_detection_torch2_tpu.serving import export_detection_pipeline

        meta = export_detection_pipeline(
            model, variables, args.export_pipeline,
            batch_size=args.batch_size, use_batch_stats=args.bn_mode == "batch",
            imsize=args.imsize, max_detections=args.max_detections,
            platforms=tuple(p.strip() for p in args.export_platforms.split(",") if p.strip()),
            d2h_half=args.d2h_half,
        )
        print(f"exported {meta['bytes'] / 1e6:.1f} MB pipeline artifact to "
              f"{args.export_pipeline} (platforms {meta['platforms']})")
        return

    run = build_detection_pipeline(
        model, args.bn_mode == "batch", args.imsize, max_detections=args.max_detections, mesh=mesh,
        d2h_half=args.d2h_half,
    )
    palette = hls_palette(len(labelmap) + 1)

    truncated = False

    def drain(pending):
        nonlocal truncated
        # lists of per-micro-batch local images, packed (K, N, Kdet, 6) or
        # (N, Kdet, 6), n_valid, metas [(global_real, base)], stacked flag.
        # local_rows = np.asarray single-process; multi-process it fetches only
        # THIS process's rows (its devices' shards) of each global batch —
        # exactly the rows whose images it holds. Output numbering is global:
        # base (images in previous batches) + this process's row offset.
        images_k, packed_k, n_valid, metas, stacked = pending
        axis = 1 if stacked else 0
        packed_k = mesh_lib.local_rows(packed_k, batch_axis=axis)
        nv = mesh_lib.local_rows(n_valid, batch_axis=axis)
        if not stacked:
            packed_k, nv = packed_k[None], nv[None]
        truncated |= int(np.max(nv)) > args.max_detections
        for images_u8, packed, (_, base) in zip(images_k, packed_k, metas):
            boxes, classes, scores = unpack_detections(packed)
            for i in range(images_u8.shape[0]):  # unpadded local slice = local real rows
                img = render_detections_compact(
                    images_u8[i], boxes[i], classes[i], scores[i], labelmap, args.imsize, palette
                )
                save_detections(out_dir, base + proc * local_bs + i + 1, img)

    # per-batch progress (reference: inference.py:56-59 tqdm); auto-disabled on
    # non-TTY. Pipelined (utils.hostsync.FetchPipeline): each batch's packed
    # results start their async D2H at dispatch and are rendered two batches
    # later, overlapping device compute, the host round trip, and PIL work.
    # With --batches_per_dispatch K, K padded batches are stacked and scanned
    # inside one program (leftovers at the end run through the single program).
    pipe = FetchPipeline()
    group: list[tuple] = []

    def dispatch_group():
        stacked = np.stack([g[1] for g in group])
        metas = [g[2] for g in group]
        packed, n_valid = run(variables, stacked, np.asarray([m[0] for m in metas], np.int32))
        item = ([g[0] for g in group], packed, n_valid, metas, True)
        group.clear()
        return pipe.push(item)

    remaining = len(dataset)
    base = 0  # images completed in previous global batches (output numbering)
    for images_u8, _ in tqdm(loader, total=len(loader), unit="batch",
                             disable=None if proc == 0 else True):
        images_u8 = np.asarray(images_u8)
        # n_real is the GLOBAL real count (the pipeline's mask is over global
        # rows); multi-process the loader yields only this process's slice, so
        # it comes from the deterministic contiguous order, not len(slice)
        real = images_u8.shape[0] if nproc == 1 else min(args.batch_size, remaining)
        remaining -= min(args.batch_size, remaining)
        meta = (real, base)
        base += real
        padded = common.pad_rows(images_u8, local_bs)
        if args.batches_per_dispatch > 1:
            group.append((images_u8, padded, meta))
            done = dispatch_group() if len(group) == args.batches_per_dispatch else None
        else:
            packed, n_valid = run(variables, padded, real)
            done = pipe.push(([images_u8], packed, n_valid, [meta], False))
        if done is not None:
            drain(done)
    for images_u8, padded, meta in group:  # tail: single-batch program, no recompile
        packed, n_valid = run(variables, padded, meta[0])
        done = pipe.push(([images_u8], packed, n_valid, [meta], False))
        if done is not None:
            drain(done)
    for done in pipe.flush():
        drain(done)
    if truncated:
        print(f"warning: >{args.max_detections} post-NMS detections in a batch; "
              "lowest-scored were dropped (raise --max_detections)")
    print("Finished Inference")


if __name__ == "__main__":
    main()
