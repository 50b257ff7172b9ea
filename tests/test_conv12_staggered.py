"""The staggered 4-tap XLA formulation of conv_1_2 (models/ssd.py) vs the
block-sparse paired oracle: same math, 2/3 the FLOPs (see
stagger_conv12_weights docstring). The TPU wall-time comparison lives in
tools/bench_conv12.py."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.models.ssd import conv12_staggered, stagger_conv12_weights
from object_detection_torch2_tpu.ops.conv12_pallas import _xla_paired


def _case(n=2, h=10, wp=8, c=16, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((n, h, wp, 2 * c)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    return xp, w, b


def test_forward_matches_paired_oracle():
    xp, w, b = _case()
    got = np.asarray(conv12_staggered(xp, w, b))
    want = np.asarray(_xla_paired(xp, w, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == xp.shape


def test_weight_flop_accounting():
    """Exactly 2 of the 8 (ky-collapsed) tap-blocks are structural zeros:
    4/3 of the dense FLOPs where the paired kernel pays 2x."""
    _, w, _ = _case()
    c = w.shape[2]
    w4 = np.asarray(stagger_conv12_weights(w))
    assert w4.shape == (3, 2, 2 * c, 2 * c)
    assert (w4[:, 1, c:, c:] == 0).all()  # half B never reads P_j.odd
    assert (w4[:, 0, :c, :c] == 0).all()  # half A never reads P_{j-1}.even
    nz_blocks = sum(
        (w4[:, p, qi * c:(qi + 1) * c, qo * c:(qo + 1) * c] != 0).any()
        for p in (0, 1) for qi in (0, 1) for qo in (0, 1))
    assert nz_blocks == 6


def test_gradients_match_paired_oracle():
    """Plain XLA autodiff through the staggered conv must agree with the
    paired formulation's grads (both are exact linear maps of the same op)."""
    xp, w, b = _case(n=1, h=6, wp=4, c=8, seed=3)

    def loss_stag(xp, w, b):
        return jnp.sum(conv12_staggered(xp, w, b) ** 2)

    def loss_paired(xp, w, b):
        return jnp.sum(_xla_paired(xp, w, b) ** 2)

    gs = jax.grad(loss_stag, argnums=(0, 1, 2))(xp, w, b)
    gp = jax.grad(loss_paired, argnums=(0, 1, 2))(xp, w, b)
    for a, e, name in zip(gs, gp, ("dxp", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4,
                                   err_msg=name)


def test_edge_columns_same_padding():
    """First and last output pairs must see zero-padding outside the image
    (SAME semantics), not wrap-around from the stagger realignment."""
    xp, w, b = _case(n=1, h=4, wp=3, c=4, seed=7)
    got = np.asarray(conv12_staggered(xp, w, b))
    want = np.asarray(_xla_paired(xp, w, b))
    np.testing.assert_allclose(got[:, :, 0], want[:, :, 0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[:, :, -1], want[:, :, -1], rtol=1e-5, atol=1e-5)


def test_pad_pairs_variants_bitwise_equal():
    """pad_pairs only widens the intermediate conv (extra zero-input columns,
    sliced away) — every variant must be BITWISE equal to the minimal form."""
    xp, w, b = _case(n=2, h=10, wp=8, c=16, seed=7)
    base = np.asarray(conv12_staggered(xp, w, b, pad_pairs=1))
    for k in (2, 3, 8):
        got = np.asarray(conv12_staggered(xp, w, b, pad_pairs=k))
        np.testing.assert_array_equal(got, base, err_msg=f"pad_pairs={k}")
