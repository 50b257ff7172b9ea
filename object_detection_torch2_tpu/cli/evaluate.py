"""Evaluation entry point (reference: src/evaluate.py:74-187).

VOC2007 test -> same device pipeline as inference through NMS, then batched
first-claim TP assignment + per-class AP. The parity metric (default) matches
the reference's recall-equivalent "average precision" (quirk Q5) so results
compare directly against the published 0.314 mAP; --strict_ap computes proper
score-ranked AP as well. Writes the reference's markdown report.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.cli import common
from object_detection_torch2_tpu.cli.inference import build_postprocess
from object_detection_torch2_tpu.data.loader import DataLoader
from object_detection_torch2_tpu.data.records import RecordDataset
from object_detection_torch2_tpu.data.voc import PascalVOCDataset
from object_detection_torch2_tpu.metrics.ap import APAccumulator
from object_detection_torch2_tpu.metrics.assign import detection_matches
from object_detection_torch2_tpu.utils.report import write_report


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_args(parser, batch_size_default=2)
    parser.add_argument("--strict_ap", action="store_true", help="also report proper score-ranked AP")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        jax.distributed.initialize()  # multi-host: same mesh, DCN between hosts
    weights_path = Path(args.result_dir) / "detection" / args.weights
    out_dir = Path(args.result_dir) / "detection"

    if args.records_dir:
        dataset = RecordDataset(args.records_dir)
    else:
        dataset = PascalVOCDataset(
            "detection", args.data_dirs or common.DEFAULT_TEST_DIRS, "test.txt", args.imsize
        )
    loader = DataLoader(dataset, args.batch_size, max_gt=args.max_gt, drop_last=False)

    model, variables, labelmap = common.build_ssd(args, weights_path)
    variables = jax.tree.map(jnp.asarray, variables)
    run = build_postprocess(model, args.bn_mode == "batch", args.imsize)

    num_classes = len(labelmap)
    acc = APAccumulator(num_classes)
    matches_fn = jax.jit(lambda o, g: detection_matches(o, g, num_classes=num_classes))

    for images_u8, gts in loader:
        images_u8 = np.asarray(images_u8)
        gts = np.asarray(gts, np.float32)
        images_u8, real = common.pad_batch(images_u8, args.batch_size)
        gts_p, _ = common.pad_batch(gts, args.batch_size)
        if real < args.batch_size:
            gts_p[real:] = 0  # padded images contribute no GTs/dets (scores copied but gts zeroed)
        outputs, _ = run(variables, jnp.asarray(images_u8))
        if real < args.batch_size:
            outputs = outputs.at[real:, :, 4:].set(0.0)
        acc.update(matches_fn(outputs, jnp.asarray(gts_p)))

    aps, mean_ap = acc.result(strict=False)
    print("mAP (reference parity metric):", round(mean_ap, 4))
    if args.strict_ap:
        strict_aps, strict_mean = acc.result(strict=True)
        print("mAP (strict, score-ranked):", round(strict_mean, 4))

    path = write_report(out_dir, vars(args), aps, mean_ap, labelmap)
    print("report:", path)
    print("Finished Evaluate")
    return aps, mean_ap


if __name__ == "__main__":
    main()
