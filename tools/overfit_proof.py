"""End-to-end accuracy proof: train.py -> evaluate.py closes the loop to an AP number.

Round-1 verdict item #1: every component is golden-tested against the executed
reference, but no run had ever gone from the training entry point through the
evaluation entry point to a mAP. This script does exactly that on the committed
4-image fixture VOC tree (tests/fixtures/voc/VOCtest):

  1. trains the REAL SSD300 (frozen VGG trunk + trainable extras/heads, Adam,
     MultiBox loss — the reference's exact trainable set, reference:
     src/model/ssd.py:25-36, src/train.py:62-66) on the 4 images until overfit,
     through the public cli/train.py entry point (augmentations disabled via
     --train_aug none, lr decay disabled via --gamma 1.0);
  2. runs the public cli/evaluate.py entry point — the same code path that
     produces the reference's published 0.314 mAP table (reference:
     src/evaluate.py:74-187) — on the same 4 images with the trained weights;
  3. asserts the parity-metric mAP (quirk Q5: recall@IoU0.5) reaches ~1.0 and
     reports the strict score-ranked mAP alongside.

Writes PROOF_OVERFIT.json at the repo root and exits nonzero on failure.

Usage:  python tools/overfit_proof.py [--epochs 1500] [--threshold 0.99]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
FIXTURE = REPO / "tests" / "fixtures" / "voc" / "VOCtest"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=1500)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--threshold", type=float, default=0.99,
                        help="required parity-metric mAP (recall@0.5, quirk Q5)")
    parser.add_argument("--result_dir", type=str, default=None,
                        help="default: a fresh temp dir (the proof must start from random init)")
    parser.add_argument("--dtype", type=str, default="bfloat16")
    args = parser.parse_args(argv)

    from object_detection_torch2_tpu.cli import evaluate as eval_cli
    from object_detection_torch2_tpu.cli import train as train_cli

    result_dir = args.result_dir or tempfile.mkdtemp(prefix="overfit_proof_")
    log_dir = str(Path(result_dir) / "logs")
    data = str(FIXTURE)

    t0 = time.time()
    train_cli.main([
        "--data_dirs", data,
        "--result_dir", result_dir,
        "--log_dir", log_dir,
        "--epochs", str(args.epochs),
        "--batch_size", "4",
        "--lr", str(args.lr),
        "--gamma", "1.0",          # 1 step/epoch here; epoch-wise 0.95 decay would zero the lr
        "--train_aug", "none",     # deterministic inputs: pure memorization test
        "--val_aug", "none",
        "--save_interval", "50",   # 1-step epochs: the ~100MB checkpoint D2H otherwise dominates
        "--dtype", args.dtype,
    ])
    train_s = time.time() - t0

    t1 = time.time()
    aps, mean_ap, strict_map, _ = eval_cli.main([
        "--data_dirs", data,
        "--result_dir", result_dir,
        "--batch_size", "4",
        "--dtype", args.dtype,
        "--strict_ap",
    ])
    eval_s = time.time() - t1

    record = {
        "fixture_images": 4,
        "epochs": args.epochs,
        "lr": args.lr,
        "dtype": args.dtype,
        "parity_mAP": round(float(mean_ap), 4),
        "strict_mAP": round(float(strict_map), 4) if strict_map is not None else None,
        "per_class_AP": [round(float(v), 4) if v == v else None for v in aps],
        "threshold": args.threshold,
        "passed": bool(mean_ap >= args.threshold),
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "entry_points": ["cli/train.py", "cli/evaluate.py"],
    }
    out = REPO / "PROOF_OVERFIT.json"
    out.write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record))
    if not record["passed"]:
        print(f"FAIL: parity mAP {mean_ap:.4f} < {args.threshold}", file=sys.stderr)
        return 1
    print(f"PASS: train.py -> evaluate.py closed loop, parity mAP {mean_ap:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
