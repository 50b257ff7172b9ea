"""Device-side, jit-compiled augmentation — the TPU-native input path.

The reference augments per-sample on host CPU via torchvision/PIL inside
DataLoader workers (reference: src/augmentation/*, SURVEY.md §2.1). On TPU the
host is the bottleneck, so this module runs the SAME augmentation distributions
as one fused XLA program over the whole uint8 batch on device:

- RandomColorJitter(p=0.5, brightness/contrast/saturation/hue=0.5) — factor
  distributions follow torchvision.ColorJitter (reference:
  src/augmentation/random.py:6-14); factors and the jitter/flip/erase coin
  flips are PER-SAMPLE;
- RandomFlip(p=0.5) — hflip + gt cx reflection `gt[:,0] = 1 - cx`
  (reference: src/augmentation/random.py:17-30);
- ToTensor scaling to [0,1] (reference: src/augmentation/to_tensor.py);
- RandomErasing(p=0.5, scale=(0.01, 0.04), ratio=(0.5, 2), max_iter=3) applied
  1..max_iter times, gt untouched (reference: src/augmentation/random.py:33-42).

Everything is batched — no vmap, no per-sample control flow. The color-jitter
op ORDER is one fresh random permutation per BATCH (torchvision samples it per
sample; a vmapped switch would execute all four branches for every image, 4x
the arithmetic — sharing the order across the batch keeps the order uniformly
random over steps at 1/4 the cost). Divergences from the reference's PIL-uint8
pipeline (float math, shared per-batch order) are distribution-level only;
sample-level bit parity is neither possible (different RNGs) nor required.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp

GRAY_WEIGHTS = (0.2989, 0.587, 0.114)  # torchvision rgb_to_grayscale

_PERMS = tuple(itertools.permutations(range(4)))  # 24 jitter-op orders


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    safe_d = jnp.where(d > 0, d, 1.0)
    rc = (maxc - r) / safe_d
    gc = (maxc - g) / safe_d
    bc = (maxc - b) / safe_d
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(d > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    sel = [i == k for k in range(6)]
    r = jnp.select(sel, [v, q, p, p, t, v])
    g = jnp.select(sel, [t, v, v, q, p, p])
    b = jnp.select(sel, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _grayscale(img):
    return jnp.tensordot(img, jnp.asarray(GRAY_WEIGHTS, img.dtype), axes=([-1], [0]))


# Batched jitter ops; factor f: (N,) f32, broadcast over (N, H, W, C).
# Factors are cast to the image dtype at use — jnp promotion would otherwise
# silently upcast a bfloat16 pixel chain back to f32 (doubling HBM traffic).
def adjust_brightness(img, f):
    return jnp.clip(img * f[:, None, None, None].astype(img.dtype), 0.0, 1.0)


def adjust_contrast(img, f):
    # batch-mean accumulates in f32: a bf16 accumulator over 90k pixels drops
    # increments below sum*2^-8 once the running sum grows
    mean = _grayscale(img).mean(axis=(1, 2), dtype=jnp.float32)  # per-image scalar
    add = ((1.0 - f) * mean)[:, None, None, None].astype(img.dtype)
    return jnp.clip(f[:, None, None, None].astype(img.dtype) * img + add, 0.0, 1.0)


def adjust_saturation(img, f):
    gray = _grayscale(img)[..., None]
    f = f[:, None, None, None].astype(img.dtype)
    return jnp.clip(f * img + (1.0 - f) * gray, 0.0, 1.0)


def adjust_hue(img, delta):
    hsv = rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta[:, None, None].astype(img.dtype)) % 1.0)
    return hsv_to_rgb(hsv)


def _color_jitter_batch(rng, img, do, strength=0.5, hue=0.5):
    """do: (N,) bool per-sample jitter coin. One random op order per batch.

    hue: hue-shift half-range in [0, 0.5]. The reference's 0.5 is a FULL hue
    rotation (torchvision's maximum — any color can become any other), which
    destroys color-identity classes; 0.05-0.1 is the conventional detection
    setting and what --train_aug reduced_hue uses."""
    n = img.shape[0]
    k_order, k_b, k_c, k_s, k_h = jax.random.split(rng, 5)
    fb = jax.random.uniform(k_b, (n,), minval=1 - strength, maxval=1 + strength)
    fc = jax.random.uniform(k_c, (n,), minval=1 - strength, maxval=1 + strength)
    fs = jax.random.uniform(k_s, (n,), minval=1 - strength, maxval=1 + strength)
    dh = jax.random.uniform(k_h, (n,), minval=-hue, maxval=hue)
    ops = (
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, dh),
    )

    def branch(perm):
        def run(x):
            for op_idx in perm:
                x = ops[op_idx](x)
            return x

        return run

    perm_idx = jax.random.randint(k_order, (), 0, len(_PERMS))
    jittered = jax.lax.switch(perm_idx, [branch(p) for p in _PERMS], img)
    return jnp.where(do[:, None, None, None], jittered, img)


def _erase_batch(rng, img, p, max_iter):
    """Batched RandomErasing: per-sample rect masks, 1..max_iter applications.

    TPU layout note: masks broadcast against (N, H, W, 3) put the 3-wide channel
    axis in the 128-lane dimension (3/128 utilization — measured 8.6 ms for a
    single masked where at bs32). Working on the flattened (N, H, W*3) view with
    the column mask repeated 3x keeps lanes wide (~0.2 ms).

    Traffic note: erasing writes 0, so applying the iterations sequentially
    (where(m2, 0, where(m1, 0, where(m0, 0, x)))) equals one where over the
    OR of the rect masks. A lax.fori_loop body cannot fuse across iterations
    (each pays a full (N,H,W*3) read+write); the unrolled mask-OR form pays
    ONE image pass regardless of max_iter — and the single where fuses into
    the surrounding augment chain.
    """
    n, h, w, c = img.shape
    k_iter, k_rest = jax.random.split(rng)
    n_iter = jax.random.randint(k_iter, (n,), 1, max_iter + 1)
    rows = jnp.arange(h)[None, :]  # (1, H)
    cols = jnp.arange(w)[None, :]  # (1, W)

    any_mask = None
    for i in range(max_iter):
        k = jax.random.fold_in(k_rest, i)
        k_p, k_a, k_r, k_t, k_l = jax.random.split(k, 5)
        do = (jax.random.uniform(k_p, (n,)) < p) & (i < n_iter)
        area = jax.random.uniform(k_a, (n,), minval=0.01, maxval=0.04) * h * w
        r = jnp.exp(jax.random.uniform(k_r, (n,), minval=jnp.log(0.5), maxval=jnp.log(2.0)))
        eh = jnp.clip(jnp.round(jnp.sqrt(area * r)).astype(jnp.int32), 1, h)
        ew = jnp.clip(jnp.round(jnp.sqrt(area / r)).astype(jnp.int32), 1, w)
        top = (jax.random.uniform(k_t, (n,)) * jnp.maximum(h - eh, 1)).astype(jnp.int32)
        left = (jax.random.uniform(k_l, (n,)) * jnp.maximum(w - ew, 1)).astype(jnp.int32)
        row_mask = (rows >= top[:, None]) & (rows < (top + eh)[:, None]) & do[:, None]  # (N, H)
        col_mask = (cols >= left[:, None]) & (cols < (left + ew)[:, None])  # (N, W)
        col_mask = jnp.repeat(col_mask, c, axis=-1)  # (N, W*C), w-major like the flat view
        mask = row_mask[:, :, None] & col_mask[:, None, :]  # (N, H, W*C)
        any_mask = mask if any_mask is None else (any_mask | mask)

    flat = img.reshape(n, h, w * c)
    return jnp.where(any_mask, 0.0, flat).reshape(n, h, w, c)


@functools.partial(jax.jit, static_argnames=("p_jitter", "p_flip", "p_erase", "max_iter", "hue",
                                              "dtype"))
def augment_batch(rng, images_u8, gts, p_jitter=0.5, p_flip=0.5, p_erase=0.5, max_iter=3,
                  hue=0.5, dtype=jnp.float32):
    """Batched train-time augmentation on device.

    images_u8: (N, H, W, 3) uint8, gts: (N, G, 4+C) or (N, C) -> `dtype` images
    in [0,1], gts (cx reflected for flipped detection rows). hue: hue-jitter
    half-range (reference parity 0.5 = full rotation; see _color_jitter_batch).

    dtype: pixel compute/output dtype. The augment chain is pure elementwise
    pixel math and is HBM-bandwidth-bound (measured 2.46 ms standalone at bs32
    f32 — tools/bench_step_breakdown.py r4); bfloat16 halves that traffic.
    bf16's 8-bit mantissa matches uint8's quantization step (2^-8 relative vs
    1/255), so augmented-pixel error stays at input-quantization level; the
    contrast/saturation grayscale terms and their batch-mean reduction are
    computed in f32 regardless (a bf16 accumulator over 90k pixels would drop
    low bits catastrophically) and GT math is always f32. Only augmented
    TRAIN pixels are affected — eval/golden paths (`to_tensor_batch`, the
    non-augment cast) stay f32.
    """
    n = images_u8.shape[0]
    img = images_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    k_jp, k_j, k_fp, k_e = jax.random.split(rng, 4)

    # color jitter with per-sample prob p (reference: random.py:11-13)
    if p_jitter > 0:
        do_jitter = jax.random.uniform(k_jp, (n,)) < p_jitter
        img = _color_jitter_batch(k_j, img, do_jitter, hue=hue)

    # horizontal flip + gt cx reflection (reference: random.py:26-30)
    if p_flip > 0:
        do_flip = jax.random.uniform(k_fp, (n,)) < p_flip
        img = jnp.where(do_flip[:, None, None, None], img[:, :, ::-1, :], img)
        if gts.ndim == 3:  # detection GT: reflect real (nonzero) rows only
            real = gts[..., 2] * gts[..., 3] > 0
            flipped_cx = jnp.where(real & do_flip[:, None], 1.0 - gts[..., 0], gts[..., 0])
            gts = gts.at[..., 0].set(flipped_cx)

    # random erasing on the tensor (reference: random.py:33-42)
    if p_erase > 0:
        img = _erase_batch(k_e, img, p_erase, max_iter)
    return img, gts


@jax.jit
def to_tensor_batch(images_u8):
    """Eval-time path: uint8 -> float32 [0,1] (reference ToTensor semantics)."""
    return images_u8.astype(jnp.float32) / 255.0
