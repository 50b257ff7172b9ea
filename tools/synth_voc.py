"""Synthetic VOC-format shape dataset generator (generalization proofs).

No real VOC data exists in this environment, so accuracy evidence beyond the
4-image overfit loop needs data the model has NOT memorized. This generates a
VOC-layout tree (JPEGImages/, Annotations/, ImageSets/Main/{trainval,test}.txt)
of procedurally drawn scenes: 1-3 colored shapes per image on a textured
background, each shape type+color mapped to a fixed VOC class name. Train and
test splits are disjoint draws from the same distribution, so evaluate.py on
the test split measures GENERALIZATION, not memorization
(tools/generalization_proof.py drives the full loop).

Usage: python tools/synth_voc.py --out /tmp/synthvoc --n_train 200 --n_test 48
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

# shape archetype -> (VOC class name, RGB). Distinct hue + geometry per class.
CLASSES = [
    ("aeroplane", "rect", (220, 40, 40)),
    ("bicycle", "ellipse", (40, 200, 60)),
    ("bird", "triangle", (50, 80, 230)),
    ("boat", "cross", (230, 200, 40)),
    ("bottle", "ring", (200, 60, 220)),
    ("bus", "diamond", (40, 210, 210)),
]
IMSIZE = 300


def _draw_shape(draw: ImageDraw.ImageDraw, kind: str, box, color):
    x1, y1, x2, y2 = box
    if kind == "rect":
        draw.rectangle(box, fill=color)
    elif kind == "ellipse":
        draw.ellipse(box, fill=color)
    elif kind == "triangle":
        draw.polygon([((x1 + x2) // 2, y1), (x1, y2), (x2, y2)], fill=color)
    elif kind == "cross":
        w3, h3 = (x2 - x1) // 3, (y2 - y1) // 3
        draw.rectangle((x1 + w3, y1, x2 - w3, y2), fill=color)
        draw.rectangle((x1, y1 + h3, x2, y2 - h3), fill=color)
    elif kind == "diamond":
        cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
        draw.polygon([(cx, y1), (x2, cy), (cx, y2), (x1, cy)], fill=color)
    elif kind == "ring":
        draw.ellipse(box, fill=color)
        rx, ry = (x2 - x1) // 4, (y2 - y1) // 4
        draw.ellipse((x1 + rx, y1 + ry, x2 - rx, y2 - ry), fill=(128, 128, 128))


def _make_scene(rng: np.random.Generator):
    """-> (PIL image, [(class_name, (xmin,ymin,xmax,ymax)), ...])"""
    base = rng.integers(90, 170, 3)
    noise = rng.normal(0, 18, (IMSIZE, IMSIZE, 3)) + base
    img = Image.fromarray(np.clip(noise, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    objects = []
    for _ in range(int(rng.integers(1, 4))):
        name, kind, color = CLASSES[int(rng.integers(0, len(CLASSES)))]
        w = int(rng.integers(60, 150))
        h = int(rng.integers(60, 150))
        x1 = int(rng.integers(0, IMSIZE - w))
        y1 = int(rng.integers(0, IMSIZE - h))
        jitter = tuple(int(np.clip(c + rng.integers(-25, 26), 0, 255)) for c in color)
        _draw_shape(draw, kind, (x1, y1, x1 + w, y1 + h), jitter)
        objects.append((name, (x1, y1, x1 + w, y1 + h)))
    return img, objects


def _write_xml(path: Path, filename: str, objects):
    parts = [
        "<annotation>",
        f"    <filename>{filename}</filename>",
        f"    <size><width>{IMSIZE}</width><height>{IMSIZE}</height><depth>3</depth></size>",
    ]
    for name, (x1, y1, x2, y2) in objects:
        parts += [
            "    <object>",
            f"        <name>{name}</name>",
            f"        <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>",
            "    </object>",
        ]
    parts.append("</annotation>")
    path.write_text("\n".join(parts) + "\n")


def generate(out: Path, n_train: int, n_test: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    (out / "JPEGImages").mkdir(parents=True, exist_ok=True)
    (out / "Annotations").mkdir(exist_ok=True)
    (out / "ImageSets" / "Main").mkdir(parents=True, exist_ok=True)

    splits = {"trainval": n_train, "test": n_test}
    counter = 1
    for split, n in splits.items():
        ids = []
        for _ in range(n):
            iid = f"{counter:06d}"
            counter += 1
            img, objects = _make_scene(rng)
            img.save(out / "JPEGImages" / f"{iid}.jpg", quality=92)
            _write_xml(out / "Annotations" / f"{iid}.xml", f"{iid}.jpg", objects)
            ids.append(iid)
        # trailing newline convention (reference: dataset.py:77)
        (out / "ImageSets" / "Main" / f"{split}.txt").write_text("\n".join(ids) + "\n")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--n_train", type=int, default=200)
    parser.add_argument("--n_test", type=int, default=48)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    out = generate(Path(args.out), args.n_train, args.n_test, args.seed)
    print(f"wrote synthetic VOC tree to {out} ({args.n_train} train / {args.n_test} test)")


if __name__ == "__main__":
    main()
