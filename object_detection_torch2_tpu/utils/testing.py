"""Deterministic synthetic-weight recipe shared by the golden generator and tests.

Parity goldens compare the reference (torch, run once offline by
tools/gen_goldens.py) against this framework on IDENTICAL weights without
storing ~100MB state_dicts in git: both sides regenerate each tensor from a
per-key seeded numpy RNG, so only the key/shape manifest travels in the golden.
"""

from __future__ import annotations

import zlib

import numpy as np


def synth_array(key: str, shape: tuple) -> np.ndarray:
    """Deterministic pseudo-random tensor for a torch state_dict key.

    BN weights (1-D 'weight') and running_var center at 1; everything else is
    0.05-scale normal noise — small enough to keep 35 stacked conv+BN layers in
    a sane activation range in both frameworks.
    """
    rng = np.random.default_rng(zlib.crc32(key.encode()) & 0xFFFFFFFF)
    shape = tuple(int(s) for s in shape)
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return (1.0 + 0.05 * np.abs(rng.standard_normal(shape))).astype(np.float32)
    if key.endswith(".weight") and len(shape) == 1:  # BatchNorm affine scale
        return (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32)
    return (0.05 * rng.standard_normal(shape)).astype(np.float32)


def synth_array_scaled(key: str, shape: tuple) -> np.ndarray:
    """Realistically-scaled deterministic tensor for a torch state_dict key.

    Kaiming-fan_out convs, unit BN, zero-centered running stats — the weight
    regime real training produces (and the regime of the 5.7e-6 interop result,
    tools/validate_interop.py). Used for the PINNED-tolerance forward goldens:
    with well-conditioned activations, cross-framework f32 drift stays ~1e-5,
    so the suite can assert atol 1e-4 and catch real numerics regressions
    (the 0.05-normal `synth_array` recipe drifts to ~1e-2 across 35 layers)."""
    rng = np.random.default_rng(~zlib.crc32(key.encode()) & 0xFFFFFFFF)
    shape = tuple(int(s) for s in shape)
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return (1.0 + 0.1 * np.abs(rng.standard_normal(shape))).astype(np.float32)
    if key.endswith("running_mean"):
        return (0.1 * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith(".weight") and len(shape) == 4:  # conv: kaiming fan_out, relu
        fan_out = shape[0] * shape[2] * shape[3]
        return (np.sqrt(2.0 / fan_out) * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith(".weight") and len(shape) == 2:  # linear
        return (np.sqrt(1.0 / shape[1]) * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith(".weight") and len(shape) == 1:  # BatchNorm affine scale
        return (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32)
    return (0.01 * rng.standard_normal(shape)).astype(np.float32)  # biases


def synth_scaled_state_dict_from_manifest(keys, shapes) -> dict:
    return {k: synth_array_scaled(k, shp) for k, shp in unpack_manifest(keys, shapes).items()}


def pack_manifest(state_dict: dict, max_rank: int = 4):
    """(keys, padded-shape matrix) arrays for npz storage."""
    keys = np.array(list(state_dict.keys()))
    shapes = np.zeros((len(keys), max_rank), np.int64)
    for i, k in enumerate(state_dict):
        shp = tuple(state_dict[k].shape)
        shapes[i, : len(shp)] = shp
    return keys, shapes


def unpack_manifest(keys, shapes) -> dict:
    """Inverse of pack_manifest -> {key: shape tuple}."""
    out = {}
    for k, s in zip(keys, shapes):
        s = list(int(x) for x in s)
        while s and s[-1] == 0:
            s.pop()
        out[str(k)] = tuple(s)
    return out


def synth_state_dict_from_manifest(keys, shapes) -> dict:
    return {k: synth_array(k, shp) for k, shp in unpack_manifest(keys, shapes).items()}
