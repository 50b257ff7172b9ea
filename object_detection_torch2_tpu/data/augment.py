"""Device-side, jit-compiled augmentation — the TPU-native input path.

The reference augments per-sample on host CPU via torchvision/PIL inside
DataLoader workers (reference: src/augmentation/*, SURVEY.md §2.1). On TPU the
host is the bottleneck, so this module runs the SAME augmentation distributions
as one fused XLA program over the whole uint8 batch on device:

- RandomColorJitter(p=0.5, brightness/contrast/saturation/hue=0.5) — factor
  distributions and the random op order follow torchvision.ColorJitter
  (reference: src/augmentation/random.py:6-14);
- RandomFlip(p=0.5) — hflip + gt cx reflection `gt[:,0] = 1 - cx`
  (reference: src/augmentation/random.py:17-30);
- ToTensor scaling to [0,1] (reference: src/augmentation/to_tensor.py);
- RandomErasing(p=0.5, scale=(0.01, 0.04), ratio=(0.5, 2), max_iter=3) applied
  1..max_iter times, gt untouched (reference: src/augmentation/random.py:33-42).

Divergence (documented): the reference jitters in PIL uint8 space; this runs the
same factor distributions in float space. Both are random policies — sample-level
bit parity is neither possible (different RNGs) nor required (SURVEY.md §7.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GRAY_WEIGHTS = (0.2989, 0.587, 0.114)  # torchvision rgb_to_grayscale


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
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
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
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _grayscale(img):
    w = jnp.asarray(GRAY_WEIGHTS, img.dtype)
    return jnp.tensordot(img, w, axes=([-1], [0]))


def adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def adjust_contrast(img, f):
    mean = _grayscale(img).mean()
    return jnp.clip(f * img + (1.0 - f) * mean, 0.0, 1.0)


def adjust_saturation(img, f):
    gray = _grayscale(img)[..., None]
    return jnp.clip(f * img + (1.0 - f) * gray, 0.0, 1.0)


def adjust_hue(img, delta):
    hsv = rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return hsv_to_rgb(hsv)


def _color_jitter_one(rng, img, strength=0.5):
    """torchvision ColorJitter: uniform factors, ops applied in random order."""
    k_order, k_b, k_c, k_s, k_h = jax.random.split(rng, 5)
    fb = jax.random.uniform(k_b, (), minval=1 - strength, maxval=1 + strength)
    fc = jax.random.uniform(k_c, (), minval=1 - strength, maxval=1 + strength)
    fs = jax.random.uniform(k_s, (), minval=1 - strength, maxval=1 + strength)
    dh = jax.random.uniform(k_h, (), minval=-strength, maxval=strength)
    order = jax.random.permutation(k_order, 4)

    def apply_op(img, op):
        return jax.lax.switch(
            op,
            [
                lambda x: adjust_brightness(x, fb),
                lambda x: adjust_contrast(x, fc),
                lambda x: adjust_saturation(x, fs),
                lambda x: adjust_hue(x, dh),
            ],
            img,
        )

    def body(i, x):
        return apply_op(x, order[i])

    return jax.lax.fori_loop(0, 4, body, img)


def _erase_one(rng, img, scale=(0.01, 0.04), ratio=(0.5, 2.0), p=0.5, max_iter=3):
    """RandomErasing applied 1..max_iter times with per-application prob p, value 0."""
    h, w = img.shape[0], img.shape[1]
    k_iter, k_rest = jax.random.split(rng)
    n_iter = jax.random.randint(k_iter, (), 1, max_iter + 1)

    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]

    def body(i, img):
        k = jax.random.fold_in(k_rest, i)
        k_p, k_a, k_r, k_t, k_l = jax.random.split(k, 5)
        do = (jax.random.uniform(k_p, ()) < p) & (i < n_iter)
        area = jax.random.uniform(k_a, (), minval=scale[0], maxval=scale[1]) * h * w
        log_r = jax.random.uniform(k_r, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
        r = jnp.exp(log_r)
        eh = jnp.clip(jnp.round(jnp.sqrt(area * r)).astype(jnp.int32), 1, h)
        ew = jnp.clip(jnp.round(jnp.sqrt(area / r)).astype(jnp.int32), 1, w)
        top = jax.random.randint(k_t, (), 0, jnp.maximum(h - eh, 1))
        left = jax.random.randint(k_l, (), 0, jnp.maximum(w - ew, 1))
        mask = (rows >= top) & (rows < top + eh) & (cols >= left) & (cols < left + ew)
        return jnp.where((mask & do)[..., None], 0.0, img)

    return jax.lax.fori_loop(0, max_iter, body, img)


def _augment_one(rng, img_u8, gt, p_jitter, p_flip, p_erase, max_iter):
    img = img_u8.astype(jnp.float32) / 255.0
    k_jp, k_j, k_fp, k_e = jax.random.split(rng, 4)

    # color jitter with prob p (reference: random.py:11-13)
    do_jitter = jax.random.uniform(k_jp, ()) < p_jitter
    img = jax.lax.cond(do_jitter, lambda x: _color_jitter_one(k_j, x), lambda x: x, img)

    # horizontal flip + gt cx reflection (reference: random.py:26-30)
    do_flip = jax.random.uniform(k_fp, ()) < p_flip
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    if gt.ndim == 2:  # detection GT: reflect real (nonzero) rows only
        real = gt[:, 2] * gt[:, 3] > 0
        flipped_cx = jnp.where(real & do_flip, 1.0 - gt[:, 0], gt[:, 0])
        gt = gt.at[:, 0].set(flipped_cx)

    # random erasing on the tensor (reference: random.py:33-42)
    img = jax.lax.cond(
        p_erase > 0,
        lambda x: _erase_one(k_e, x, p=p_erase, max_iter=max_iter),
        lambda x: x,
        img,
    )
    return img, gt


@functools.partial(jax.jit, static_argnames=("p_jitter", "p_flip", "p_erase", "max_iter"))
def augment_batch(rng, images_u8, gts, p_jitter=0.5, p_flip=0.5, p_erase=0.5, max_iter=3):
    """Batched train-time augmentation on device.

    images_u8: (N, H, W, 3) uint8, gts: (N, G, 4+C) -> float32 images in [0,1], gts.
    """
    rngs = jax.random.split(rng, images_u8.shape[0])
    fn = functools.partial(
        _augment_one, p_jitter=p_jitter, p_flip=p_flip, p_erase=p_erase, max_iter=max_iter
    )
    return jax.vmap(fn)(rngs, images_u8, gts)


@jax.jit
def to_tensor_batch(images_u8):
    """Eval-time path: uint8 -> float32 [0,1] (reference ToTensor semantics)."""
    return images_u8.astype(jnp.float32) / 255.0
