"""Serve from a StableHLO pipeline artifact alone — no model code, no weights.

Demonstrates (and smoke-tests) the deployment story of serving.py: the
artifact produced by `inference.py --export_pipeline` carries the whole
forward→NMS→top-K program with weights embedded, so the serving site needs
only JAX, the artifact file, and this thin driver (image IO + rendering).
The reference has no analog — its serving site needs the full repo, torch,
and the weights checkpoint (reference: src/inference.py:13-103).

Usage:
  python tools/serve_artifact.py --artifact pipe.shlo \
      --data_dirs <voc-root> [--out_dir result/served] [--limit N]

Output: one rendered PNG per image (same renderer as cli/inference.py) and a
detections.json with [image_index, class_name, score, cx, cy, w, h] rows.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact", type=str, required=True)
    parser.add_argument("--data_dirs", type=str, nargs="+", default=None,
                        help="VOC roots (test.txt split); omit with --records_dir")
    parser.add_argument("--records_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="result/served")
    parser.add_argument("--limit", type=int, default=None, help="serve at most N images")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from object_detection_torch2_tpu.cli.common import pad_batch
    from object_detection_torch2_tpu.data.labelmap import LabelMap
    from object_detection_torch2_tpu.data.loader import DataLoader
    from object_detection_torch2_tpu.data.records import RecordDataset
    from object_detection_torch2_tpu.data.voc import PascalVOCDataset
    from object_detection_torch2_tpu.infer import unpack_detections
    from object_detection_torch2_tpu.serving import load_detection_pipeline
    from object_detection_torch2_tpu.utils.render import (
        hls_palette,
        render_detections_compact,
        save_detections,
    )

    run, meta = load_detection_pipeline(args.artifact)
    batch_size, imsize = int(meta["batch_size"]), int(meta["imsize"])
    print(f"artifact: {meta}")

    if args.records_dir:
        dataset = RecordDataset(args.records_dir)
    else:
        dataset = PascalVOCDataset("detection", args.data_dirs, "test.txt", imsize)
    loader = DataLoader(dataset, batch_size, max_gt=8, drop_last=False)

    labelmap = LabelMap("PascalVOC")
    palette = hls_palette(len(labelmap) + 1)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    n = 0
    for images_u8, _ in loader:
        images_u8 = np.asarray(images_u8)
        padded, real = pad_batch(images_u8, batch_size)
        packed, _ = run(padded, real)
        boxes, classes, scores = unpack_detections(np.asarray(packed))
        for i in range(int(real)):
            img = render_detections_compact(
                images_u8[i], boxes[i], classes[i], scores[i], labelmap, imsize, palette
            )
            save_detections(out_dir, n, img)
            for b, c, s in zip(boxes[i], classes[i], scores[i]):
                if s > 0 and c > 0:
                    rows.append([n, labelmap.id2name(int(c) - 1), round(float(s), 5)]
                                + [round(float(v), 5) for v in b])
            n += 1
            if args.limit and n >= args.limit:
                break
        if args.limit and n >= args.limit:
            break
    (out_dir / "detections.json").write_text(json.dumps(rows, indent=0))
    print(f"served {n} images -> {out_dir} ({len(rows)} detections)")


if __name__ == "__main__":
    main()
