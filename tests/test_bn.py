"""BatchNormTPU: torch-semantics stats, flax-compatible layout, bf16 path."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.models.bn import BatchNormTPU


def _data(n=4, h=6, w=6, c=8, seed=0):
    return np.random.default_rng(seed).normal(1.5, 2.0, (n, h, w, c)).astype(np.float32)


def test_train_mode_matches_flax_batchnorm():
    x = _data()
    ours = BatchNormTPU(use_running_average=False)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5, use_fast_variance=False)
    vo = ours.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    yo, mo = ours.apply(vo, jnp.asarray(x), mutable=["batch_stats"])
    yr, mr = ref.apply(vr, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yr), atol=2e-5)
    # running mean identical; running var intentionally differs (torch's
    # unbiased correction — covered by the dedicated test below)
    np.testing.assert_allclose(
        np.asarray(mo["batch_stats"]["mean"]), np.asarray(mr["batch_stats"]["mean"]), atol=1e-6
    )


def test_running_var_uses_torch_unbiased_correction():
    x = _data()
    n = x.size / x.shape[-1]
    model = BatchNormTPU(use_running_average=False)
    v = model.init(jax.random.PRNGKey(0), x)
    _, m = model.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    batch_var = np.asarray(x).reshape(-1, x.shape[-1]).var(axis=0)
    expect = 0.9 * 1.0 + 0.1 * batch_var * n / (n - 1)
    np.testing.assert_allclose(np.asarray(m["batch_stats"]["var"]), expect, rtol=1e-5)


def test_eval_mode_uses_running_stats():
    x = _data()
    model = BatchNormTPU(use_running_average=True)
    v = model.init(jax.random.PRNGKey(0), x)
    v = {
        "params": v["params"],
        "batch_stats": {"mean": jnp.full((8,), 2.0), "var": jnp.full((8,), 4.0)},
    }
    y = model.apply(v, jnp.asarray(x))
    expect = (x - 2.0) / np.sqrt(4.0 + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)


def test_masked_stats_equal_ragged_forward():
    """Pad-and-mask == ragged: with `mask` excluding pad rows, both the
    normalized outputs of the real rows AND the running-stat updates must match
    a forward over just the real rows (advisor r1 — pad rows must not perturb
    real images' detections)."""
    x = _data(n=4)
    x_padded = np.concatenate([x, np.full((2, 6, 6, 8), 7.0, np.float32)])  # poison pads
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)

    model = BatchNormTPU(use_running_average=False)
    v = model.init(jax.random.PRNGKey(0), x)
    y_ragged, m_ragged = model.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    y_masked, m_masked = model.apply(v, jnp.asarray(x_padded), mask, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y_masked)[:4], np.asarray(y_ragged), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_masked["batch_stats"]["mean"]), np.asarray(m_ragged["batch_stats"]["mean"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m_masked["batch_stats"]["var"]), np.asarray(m_ragged["batch_stats"]["var"]), rtol=1e-5
    )


def test_two_pass_variance_flag():
    """two_pass=True (parity-debug mode, advisor r1) computes torch's shifted
    variance E[(x-mean)^2]; on well-conditioned data both formulations agree."""
    x = _data()
    one = BatchNormTPU(use_running_average=False)
    two = BatchNormTPU(use_running_average=False, two_pass=True)
    v = one.init(jax.random.PRNGKey(0), x)
    y1, m1 = one.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    y2, m2 = two.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
    # adversarial: huge mean vs tiny std — single-pass cancels to ~0, two-pass doesn't
    bad = (1e4 + 0.01 * np.random.default_rng(1).standard_normal((4, 6, 6, 8))).astype(np.float32)
    vb = one.init(jax.random.PRNGKey(0), bad)
    _, mb2 = two.apply(vb, jnp.asarray(bad), mutable=["batch_stats"])
    var2 = (np.asarray(mb2["batch_stats"]["var"]) - 0.9) / 0.1  # unbiased batch var
    ref = bad.reshape(-1, 8).var(axis=0) * (bad.size / 8) / (bad.size / 8 - 1)
    np.testing.assert_allclose(var2, ref, rtol=2e-2)


def test_bf16_path_dtype_and_accuracy():
    x = _data().astype(jnp.bfloat16)
    model = BatchNormTPU(use_running_average=False, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x)
    y, m = model.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    # stats computed in f32 despite bf16 input
    assert m["batch_stats"]["mean"].dtype == jnp.float32
    xf = np.asarray(x, np.float32).reshape(-1, 8)
    # updated running mean = 0.9*0 + 0.1*batch_mean
    np.testing.assert_allclose(np.asarray(m["batch_stats"]["mean"]), 0.1 * xf.mean(0), atol=5e-3)


def test_fold_matches_unfolded_layout():
    """fold=2 (paired-x layout, slot q*c+ch) must produce the same statistics,
    running-stat updates, and per-element outputs as the plain layout."""
    x = _data(n=2, h=4, w=6, c=8)
    # paired view: fold adjacent w-pixels into channels (N, H, W/2, 2C)
    xp = x.reshape(2, 4, 3, 16)

    plain = BatchNormTPU(use_running_average=False)
    folded = BatchNormTPU(use_running_average=False, fold=2)
    v = plain.init(jax.random.PRNGKey(0), x)
    vf = folded.init(jax.random.PRNGKey(1), xp)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(lambda a: a.shape, vf)

    y, m = plain.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    yf, mf = folded.apply(v, jnp.asarray(xp), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y).reshape(2, 4, 3, 16), rtol=1e-5, atol=1e-6)
    for stat in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mf["batch_stats"][stat]), np.asarray(m["batch_stats"][stat]), rtol=1e-5, atol=1e-7
        )

    # masked path: excluding sample 1 must equal plain stats over sample 0 only
    mask = jnp.asarray([1.0, 0.0])
    y0, m0 = plain.apply(v, jnp.asarray(x[:1]), mutable=["batch_stats"])
    ym, mm = folded.apply(v, jnp.asarray(xp), mask=mask, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(ym[:1]), np.asarray(y0).reshape(1, 4, 3, 16), rtol=1e-5, atol=1e-6
    )
    for stat in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mm["batch_stats"][stat]), np.asarray(m0["batch_stats"][stat]), rtol=1e-5, atol=1e-7
        )
