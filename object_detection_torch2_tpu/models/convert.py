"""torch state_dict -> Flax variables conversion (pure numpy; no torch import).

The reference loads weights as torch `state_dict`s (reference: src/model/ssd.py:80-84,
src/model/vgg16.py:64-70). These converters accept a `dict[str, np.ndarray]` in the
torch layout (e.g. produced by `tools/torch_to_npz.py` from a real `.pth`, or the
torch.hub vgg16_bn checkpoint) and emit Flax variable collections
{'params': ..., 'batch_stats': ...} for `models.ssd.SSD` / `models.vgg16.VGG16`.

Layout mapping per module type:
  Conv2d   weight (O, I, kh, kw) -> kernel (kh, kw, I, O); bias unchanged
  Linear   weight (O, I)         -> kernel (I, O); bias unchanged
  BatchNorm2d  weight -> scale, bias -> bias, running_mean -> mean,
               running_var -> var (num_batches_tracked is dropped)
"""

from __future__ import annotations

import numpy as np

from object_detection_torch2_tpu.models.vgg16 import VGG_CFG


def _conv(sd: dict, key: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(np.transpose(np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0))),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _dense(sd: dict, key: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(np.transpose(np.asarray(sd[f"{key}.weight"]), (1, 0))),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _bn(sd: dict, key: str) -> tuple[dict, dict]:
    params = {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}
    stats = {"mean": np.asarray(sd[f"{key}.running_mean"]), "var": np.asarray(sd[f"{key}.running_var"])}
    return params, stats


def ssd_variables_from_torch(sd: dict) -> dict:
    """Convert a reference-SSD state_dict (canonical `features.conv_L_S.*` /
    `detectors.det_L_S.*` keys — the reference's ModuleDict naming, ssd.py:22-77)."""
    params, batch_stats = {}, {}
    for key in sd:
        parts = key.split(".")
        if parts[0] == "features" and parts[-1] == "weight":
            name = parts[1]
            if name.startswith("conv_"):
                params[name] = _conv(sd, f"features.{name}")
            elif name.startswith("bn_"):
                params[name], batch_stats[name] = _bn(sd, f"features.{name}")
        elif parts[0] == "detectors" and parts[-1] == "weight":
            name = parts[1]
            params[name] = _conv(sd, f"detectors.{name}")
    return {"params": params, "batch_stats": batch_stats}


def vgg16_sequential_index_map(cfg=VGG_CFG) -> dict:
    """Map `features.<idx>` Sequential indices (the plain-VGG16 / torch.hub layout,
    reference: vgg16.py:22-39) to canonical `conv_L_S` / `bn_L_S` names."""
    index_map = {}
    idx, block, sub = 0, 1, 1
    for v in cfg:
        if v in ("M", "M_P"):
            idx += 1
            block += 1
            sub = 1
        else:
            index_map[idx] = f"conv_{block}_{sub}"
            index_map[idx + 1] = f"bn_{block}_{sub}"
            idx += 3  # conv, bn, relu
            sub += 1
    return index_map


def vgg16_variables_from_torch(sd: dict) -> dict:
    """Convert a reference-VGG16 (or torch.hub vgg16_bn) state_dict with
    `features.<idx>.*` + `classifier.<idx>.*` (+ optional `classifier2.<idx>.*`) keys."""
    params, batch_stats = {}, {}
    index_map = vgg16_sequential_index_map()
    for idx, name in index_map.items():
        if name.startswith("conv_"):
            params[name] = _conv(sd, f"features.{idx}")
        else:
            params[name], batch_stats[name] = _bn(sd, f"features.{idx}")
    # heads: Sequential indices 0, 3, 6 are the Linear layers (reference: vgg16.py:42-61)
    for head in ("classifier", "classifier2"):
        for fc_i, idx in enumerate((0, 3, 6), start=1):
            key = f"{head}.{idx}.weight"
            if key in sd:
                params[f"{head}_fc{fc_i}"] = _dense(sd, f"{head}.{idx}")
    return {"params": params, "batch_stats": batch_stats}


def ssd_trunk_from_vgg16_variables(vgg_vars: dict) -> dict:
    """Extract the conv_1_1..bn_5_3 trunk from converted VGG16 variables for
    seeding an SSD (the reference's `weights_path_vgg16` path, ssd.py:25)."""
    def keep(name):
        return name.split("_")[1].isdigit() and int(name.split("_")[1]) <= 5 and (
            name.startswith("conv_") or name.startswith("bn_"))

    return {
        "params": {k: v for k, v in vgg_vars["params"].items() if keep(k)},
        "batch_stats": {k: v for k, v in vgg_vars["batch_stats"].items() if keep(k)},
    }


def merge_variables(base: dict, overlay: dict) -> dict:
    """Shallow-merge overlay collections/layers into base (layer-level grain)."""
    out = {coll: dict(layers) for coll, layers in base.items()}
    for coll, layers in overlay.items():
        out.setdefault(coll, {}).update(layers)
    return out
