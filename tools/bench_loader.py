"""Input-pipeline throughput check (BASELINE.json config #3 shape).

Builds a synthetic packed-records directory (no VOC download in this
environment), then measures DataLoader -> device throughput: memmap batch
gather + zero-pad GT + prefetch-threaded device_put. The goal is to confirm the
host can keep the chips fed at the training rate (train step ~23 ms/batch32).

Run: python tools/bench_loader.py [--count 2000] [--batch_size 32]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_synthetic_records(out_dir: Path, count: int, imsize: int = 300, max_gt: int = 64):
    rng = np.random.default_rng(0)
    images = np.lib.format.open_memmap(
        out_dir / "images.npy", mode="w+", dtype=np.uint8, shape=(count, imsize, imsize, 3)
    )
    gts = np.lib.format.open_memmap(
        out_dir / "gts.npy", mode="w+", dtype=np.float32, shape=(count, max_gt, 25)
    )
    chunk = 256
    for s in range(0, count, chunk):
        e = min(s + chunk, count)
        images[s:e] = rng.integers(0, 255, (e - s, imsize, imsize, 3), dtype=np.uint8)
    gts[:, 0, :4] = [0.5, 0.5, 0.3, 0.3]
    gts[:, 0, 10] = 1.0
    images.flush()
    gts.flush()
    with open(out_dir / "meta.json", "w") as f:
        json.dump({"imsize": imsize, "max_gt": max_gt, "count": count, "purpose": "detection"}, f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--count", type=int, default=2000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=3)
    args = parser.parse_args()

    from object_detection_torch2_tpu.data.loader import DataLoader
    from object_detection_torch2_tpu.data.records import RecordDataset
    from object_detection_torch2_tpu.parallel import make_mesh

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        make_synthetic_records(tmp, args.count)
        ds = RecordDataset(tmp)
        mesh = make_mesh()
        dl = DataLoader(ds, args.batch_size, shuffle=True, mesh=mesh)

        # warm epoch (page cache, compile-free path)
        for images, gts in dl:
            pass
        t0 = time.time()
        n = 0
        for _ in range(args.epochs):
            for images, gts in dl:
                n += images.shape[0]
        dt = time.time() - t0
        print(
            f"loader: {n} images in {dt:.2f}s = {n / dt:.0f} img/s host->device "
            f"({n / dt * 300 * 300 * 3 / 1e6:.0f} MB/s)"
        )


if __name__ == "__main__":
    main()
