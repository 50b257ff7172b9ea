"""Export framework weights to reference-compatible torch .pth checkpoints.

Completes the interop loop with tools/torch_to_npz.py: a model trained here can
be loaded by the unmodified reference (`SSD(weights_path=...)`, reference:
src/model/ssd.py:80-82, or `VGG16(weights_path=...)`, vgg16.py:64-66).

    python tools/export_torch.py --weights result/detection/weights.msgpack \
        --model ssd --out result/detection/weights.pth

torch is only needed by THIS tool.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from object_detection_torch2_tpu.models.convert import vgg16_sequential_index_map  # noqa: E402
from object_detection_torch2_tpu.train.checkpoint import load_weights  # noqa: E402


def _conv_to_torch(layer: dict) -> dict:
    return {
        "weight": np.ascontiguousarray(np.transpose(np.asarray(layer["kernel"]), (3, 2, 0, 1))),
        "bias": np.asarray(layer["bias"]),
    }


def _dense_to_torch(layer: dict) -> dict:
    return {
        "weight": np.ascontiguousarray(np.transpose(np.asarray(layer["kernel"]), (1, 0))),
        "bias": np.asarray(layer["bias"]),
    }


def _bn_to_torch(params: dict, stats: dict) -> dict:
    return {
        "weight": np.asarray(params["scale"]),
        "bias": np.asarray(params["bias"]),
        "running_mean": np.asarray(stats["mean"]),
        "running_var": np.asarray(stats["var"]),
        "num_batches_tracked": np.int64(0),
    }


def ssd_state_dict(variables: dict) -> dict:
    """Flax SSD variables -> reference SSD state_dict (features./detectors. ModuleDict keys)."""
    params, stats = variables["params"], variables["batch_stats"]
    out = {}
    for name, layer in params.items():
        if name.startswith("det_"):
            for k, v in _conv_to_torch(layer).items():
                out[f"detectors.{name}.{k}"] = v
        elif name.startswith("conv_"):
            for k, v in _conv_to_torch(layer).items():
                out[f"features.{name}.{k}"] = v
        elif name.startswith("bn_"):
            for k, v in _bn_to_torch(layer, stats[name]).items():
                out[f"features.{name}.{k}"] = v
    return out


def vgg16_state_dict(variables: dict) -> dict:
    """Flax VGG16 variables -> reference VGG16 state_dict (Sequential-index keys)."""
    params, stats = variables["params"], variables["batch_stats"]
    out = {}
    name_to_idx = {v: k for k, v in vgg16_sequential_index_map().items()}
    for name, layer in params.items():
        if name.startswith("conv_"):
            for k, v in _conv_to_torch(layer).items():
                out[f"features.{name_to_idx[name]}.{k}"] = v
        elif name.startswith("bn_"):
            idx = name_to_idx[f"conv{name[2:]}"] + 1
            for k, v in _bn_to_torch(layer, stats[f"bn{name[2:]}"]).items():
                out[f"features.{idx}.{k}"] = v
        elif name.startswith(("classifier_fc", "classifier2_fc")):
            head, fc = name.rsplit("_fc", 1)
            idx = {1: 0, 2: 3, 3: 6}[int(fc)]
            for k, v in _dense_to_torch(layer).items():
                out[f"{head}.{idx}.{k}"] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True, help="msgpack weights from this framework")
    parser.add_argument("--model", choices=["ssd", "vgg16"], required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch

    variables = load_weights(args.weights)
    sd = ssd_state_dict(variables) if args.model == "ssd" else vgg16_state_dict(variables)
    torch_sd = {k: torch.from_numpy(np.array(v)) if not np.isscalar(v) else torch.tensor(v) for k, v in sd.items()}
    torch.save(torch_sd, args.out)
    print(f"wrote {args.out}: {len(torch_sd)} tensors")


if __name__ == "__main__":
    main()
