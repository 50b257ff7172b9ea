"""Inference entry point (reference: src/inference.py:13-103).

VOC2007 test -> jitted forward + decode + score -> batched NMS -> PIL rendering
of boxes/labels (void skipped) saved as result/detection/{n:06}.png. The whole
device side (forward through NMS) is one compiled pipeline per batch.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.cli import common
from object_detection_torch2_tpu.core.anchors import default_boxes, feature_grids_for
from object_detection_torch2_tpu.core.boxes import decode_boxes
from object_detection_torch2_tpu.data.augment import to_tensor_batch
from object_detection_torch2_tpu.data.loader import DataLoader
from object_detection_torch2_tpu.data.records import RecordDataset
from object_detection_torch2_tpu.data.voc import PascalVOCDataset
from object_detection_torch2_tpu.ops import calc_scores, non_maximum_suppression
from object_detection_torch2_tpu.utils.render import hls_palette, render_detections, save_detections


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_args(parser, batch_size_default=2)
    return parser.parse_args(argv)


def build_postprocess(model, use_batch_stats: bool, imsize: int = 300):
    df = jnp.asarray(default_boxes(feature_grids_for(imsize)))

    @jax.jit
    def run(variables, images_u8):
        images = to_tensor_batch(images_u8)
        out = model.apply(
            variables, images, train=False, use_batch_stats=use_batch_stats,
            mutable=["batch_stats"] if use_batch_stats else [],
        )
        out = out[0] if isinstance(out, tuple) else out
        decoded = decode_boxes(out, df)
        scores = calc_scores(out)
        post = jnp.concatenate([decoded, scores], axis=-1)
        return non_maximum_suppression(post), images

    return run


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
    palette = hls_palette(len(labelmap) + 1)

    n = 1
    for images_u8, _ in loader:
        images_u8, real = common.pad_batch(np.asarray(images_u8), args.batch_size)
        outputs, images = run(variables, jnp.asarray(images_u8))
        outputs, images = np.asarray(outputs), np.asarray(images)
        for i in range(real):
            img = render_detections(
                images[i], outputs[i, :, :4], outputs[i, :, 4:], labelmap, args.imsize, palette
            )
            save_detections(out_dir, n, img)
            n += 1
    print("Finished Inference")


if __name__ == "__main__":
    main()
