"""Convert reference torch checkpoints (.pth) to this framework's weight format.

Bridges the reference's artifacts (reference: src/train.py:148 saves
`result/{purpose}/weights.pth`) into Flax msgpack weights loadable by the CLIs:

    python tools/torch_to_npz.py --pth result/detection/weights.pth \
        --model ssd --out result/detection/weights.msgpack

Also accepts a torch.hub vgg16_bn checkpoint (--model vgg16) for seeding the
SSD trunk the way the reference does (reference: vgg16.py:68). torch is only
needed by THIS tool; the framework itself never imports it.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from object_detection_torch2_tpu.models.convert import (  # noqa: E402
    ssd_variables_from_torch,
    vgg16_variables_from_torch,
)
from object_detection_torch2_tpu.train.checkpoint import save_weights  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pth", required=True)
    parser.add_argument("--model", choices=["ssd", "vgg16"], required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch

    sd = torch.load(args.pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    convert = ssd_variables_from_torch if args.model == "ssd" else vgg16_variables_from_torch
    variables = convert(sd)
    save_weights(args.out, variables)
    n = sum(v.size for layer in variables["params"].values() for v in layer.values())
    print(f"wrote {args.out}: {len(variables['params'])} layers, {n:,} params")


if __name__ == "__main__":
    main()
