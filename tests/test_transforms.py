"""Host-side transform parity: distributions/semantics vs the device versions."""

import numpy as np

from object_detection_torch2_tpu.data import transforms as T


def test_compose_and_to_tensor():
    img = np.full((8, 8, 3), 255, np.uint8)
    gt = np.zeros((2, 25), np.float32)
    out, gt2 = T.Compose([T.ToTensor()])(img, gt)
    assert out.dtype == np.float32 and out.max() == 1.0
    assert gt2 is gt


def test_random_flip_detection_and_classification():
    rng = np.random.default_rng(0)
    img = np.zeros((4, 8, 3), np.uint8)
    img[:, :4] = 200
    det_gt = np.array([[0.25, 0.5, 0.2, 0.2] + [0] * 21], np.float32)
    det_gt[0, 9] = 1
    flip = T.RandomFlip(p=1.0, rng=rng)
    out, gt2 = flip(img, det_gt)
    assert out[0, -1, 0] == 200 and out[0, 0, 0] == 0
    np.testing.assert_allclose(gt2[0, 0], 0.75)
    # classification one-hot gt passes through untouched (Q11: reference crashes here)
    cls_gt = np.eye(20, dtype=np.float32)[3]
    _, gt3 = flip(img, cls_gt)
    np.testing.assert_array_equal(gt3, cls_gt)


def test_color_jitter_bounds_and_determinism():
    rng = np.random.default_rng(1)
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3)).astype(np.uint8)
    jitter = T.RandomColorJitter(p=1.0, rng=rng)
    out, _ = jitter(img, None)
    assert out.dtype == np.uint8
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_hue_identity_at_zero_delta():
    img = np.random.default_rng(2).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    out = T.RandomColorJitter._adjust_hue(img, 0.0)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_hue_full_cycle():
    img = np.random.default_rng(3).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    out = T.RandomColorJitter._adjust_hue(img, 1.0)
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_random_erasing_zeroes_block():
    rng = np.random.default_rng(4)
    img = np.ones((32, 32, 3), np.float32)
    erase = T.RandomErasing(p=1.0, max_iter=3, rng=rng)
    out, _ = erase(img, None)
    assert (out == 0).sum() > 0
    assert img.sum() == 32 * 32 * 3  # input untouched (copy semantics)


def test_augment_batch_reduced_hue():
    """The `hue` knob (--train_aug reduced_hue) bounds the device-side hue
    jitter: with hue=0 the hue channel is untouched (only the other three
    jitter ops act); the CLI mapping forwards {'hue': 0.05}."""
    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.cli.train import _aug_config
    from object_detection_torch2_tpu.data.augment import augment_batch, rgb_to_hsv

    assert _aug_config("reduced_hue") == {"hue": 0.05}
    assert _aug_config("train") is True and _aug_config("none") is False

    from object_detection_torch2_tpu.data.augment import adjust_hue

    rng = np.random.default_rng(9)
    images = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    gts = np.zeros((4, 2, 25), np.float32)
    base = jnp.asarray(images.astype(np.float32) / 255.0)

    # adjust_hue shifts hue by EXACTLY delta (circularly), nothing else
    delta = jnp.asarray([0.0, 0.05, -0.05, 0.3], np.float32)
    shifted = np.asarray(rgb_to_hsv(adjust_hue(base, delta)))[..., 0]
    expect = (np.asarray(rgb_to_hsv(base))[..., 0] + np.asarray(delta)[:, None, None]) % 1.0
    sat = np.asarray(rgb_to_hsv(base))[..., 1]
    d = np.abs(shifted - expect)
    d = np.minimum(d, 1 - d)[sat > 1e-2]  # hue undefined on gray pixels
    assert d.max() < 1e-3, d.max()

    # the hue kwarg is plumbed through augment_batch (same key, only hue differs)
    key = jax.random.PRNGKey(0)
    out0, g0 = augment_batch(key, jnp.asarray(images), jnp.asarray(gts),
                             p_jitter=1.0, p_flip=0.0, p_erase=0.0, hue=0.05)
    out5, _ = augment_batch(key, jnp.asarray(images), jnp.asarray(gts),
                            p_jitter=1.0, p_flip=0.0, p_erase=0.0, hue=0.5)
    assert not np.allclose(np.asarray(out0), np.asarray(out5))
    np.testing.assert_array_equal(np.asarray(g0), gts)  # gts untouched by jitter
