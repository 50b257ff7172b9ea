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


# --------------------------------------------------------------------------
# Training-trajectory parity fixtures (shared by tools/gen_goldens.py, which
# runs the reference's torch train loop, and tests/test_trajectory.py, which
# runs this framework's Trainer on the SAME deterministic batches).


def synth_targets(rng, n: int, g_real, g_pad: int, num_classes: int = 21) -> np.ndarray:
    """Detection GT tensor (N, G_pad, 4+C): normalized center-form boxes +
    one-hot with void@0 (+1 class shift), zero rows beyond g_real[i] — the
    collate_fn pad_sequence layout (reference: src/utils.py:8-16)."""
    gts = np.zeros((n, g_pad, 4 + num_classes), np.float32)
    for i in range(n):
        g = int(g_real[i])
        gts[i, :g, :2] = rng.uniform(0.2, 0.8, (g, 2))
        gts[i, :g, 2:4] = rng.uniform(0.05, 0.45, (g, 2))
        gts[i, np.arange(g), 4 + rng.integers(1, num_classes, g)] = 1.0
    return gts


def synth_trajectory_batch(step: int, n: int = 4, imsize: int = 300, g_pad: int = 8,
                           num_classes: int = 21):
    """Deterministic (images_nchw f32 in [0,1], targets) pair for train step
    `step`. Regenerated identically on both sides so the golden stores no
    image data."""
    rng = np.random.default_rng(0xBA7C4 + 7919 * step)
    images = rng.uniform(0.0, 1.0, (n, 3, imsize, imsize)).astype(np.float32)
    g_real = rng.integers(1, g_pad + 1, n)
    targets = synth_targets(rng, n, g_real, g_pad, num_classes)
    return images, targets


def synth_cls_trajectory_batch(step: int, n: int = 4, imsize: int = 200,
                               num_classes: int = 20):
    """Deterministic (images_nchw f32 in [0,1], one-hot targets) pair for the
    CLASSIFICATION-purpose trajectory golden (VGG16 path; imsize 200 is the
    7x7-grid working size — quirk Q10)."""
    rng = np.random.default_rng(0xC1A55 + 6271 * step)
    images = rng.uniform(0.0, 1.0, (n, 3, imsize, imsize)).astype(np.float32)
    onehot = np.eye(num_classes, dtype=np.float32)[rng.integers(0, num_classes, n)]
    return images, onehot


def flatten_tree(tree, prefix: str = "") -> dict:
    """Nested dict of arrays -> {'a/b/c': np.ndarray} with sorted paths."""
    out = {}
    for k in sorted(tree):
        v = tree[k]
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def fingerprint_array(path: str, arr: np.ndarray, k: int = 8) -> np.ndarray:
    """(k+3,) float64 fingerprint: [l2, mean, absmax, proj_0..proj_{k-1}] where
    proj_j = <flat(arr), v_j> with v_j a fixed unit pseudo-random direction
    derived from (path, j). A parameter drift of eps moves each projection by
    O(eps), so pinning fingerprints pins param-space agreement without storing
    the ~46 MB of trainable tensors."""
    flat = np.asarray(arr, np.float64).ravel()
    stats = [np.sqrt(np.dot(flat, flat)), flat.mean(), np.abs(flat).max()]
    for j in range(k):
        rng = np.random.default_rng(zlib.crc32(f"fp:{path}:{j}".encode()) & 0xFFFFFFFF)
        v = rng.standard_normal(flat.size)
        stats.append(np.dot(flat, v / np.sqrt(np.dot(v, v))))
    return np.array(stats, np.float64)


def fingerprint_tree(tree: dict, k: int = 8):
    """(sorted paths array, (n_tensors, k+3) fingerprint matrix) for a nested
    dict of arrays — the storable form of a full parameter pytree."""
    flat = flatten_tree(tree)
    keys = np.array(list(flat.keys()))
    mat = np.stack([fingerprint_array(p, a, k) for p, a in flat.items()])
    return keys, mat
