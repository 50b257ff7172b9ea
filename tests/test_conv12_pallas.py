"""The Pallas conv_1_2 kernel (ops/conv12_pallas.py) vs its XLA oracle.

Runs in interpreter mode on the CPU backend (Mosaic compiles only for TPU);
the TPU wall-time comparison lives in tools/bench_conv12.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import object_detection_torch2_tpu.ops.conv12_pallas as c12
from object_detection_torch2_tpu.ops.conv12_pallas import (
    _xla_paired,
    conv12_paired,
    pack_conv12_weights,
    pick_tile_h,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(c12, "_INTERPRET", True)


def _case(n=2, h=60, wp=8, c=8, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((n, h, wp, 2 * c)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    return xp, w, b


def test_pick_tile_h():
    # the SSD300 shape: 10 tiles of 30 rows (W padded 150->152 for
    # tiling-aligned DMA extents, so M=30*152 is sublane-clean)
    assert pick_tile_h(300, 150) == 30
    assert pick_tile_h(60, 8) == 30
    assert pick_tile_h(7, 3) is None  # no admissible tile -> XLA fallback


def test_forward_matches_xla_paired():
    xp, w, b = _case()
    got = np.asarray(conv12_paired(xp, w, b))
    want = np.asarray(_xla_paired(xp, w, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == xp.shape


def test_weight_packing_flop_accounting():
    """w_center is fully dense; w_edge is exactly half structural zeros —
    total useful taps = 4/3 of the dense conv, as documented."""
    _, w, _ = _case()
    wc, we = pack_conv12_weights(w)
    assert (np.asarray(wc) != 0).mean() > 0.9  # dense (up to random zeros)
    ez = np.asarray(we) == 0
    c = w.shape[2]
    assert ez[:, c:, :c].all() and ez[:, :c, c:].all()  # the two zero blocks
    assert (np.asarray(we)[:, :c, :c] != 0).mean() > 0.9


def test_gradients_match_xla_paired():
    """The custom VJP delegates to the XLA formulation — grads must be
    EXACTLY the XLA paired conv's grads (same math, same graph)."""
    xp, w, b = _case(n=1, h=30, wp=8, c=8, seed=3)

    def loss_pallas(xp, w, b):
        return jnp.sum(conv12_paired(xp, w, b) ** 2)

    def loss_xla(xp, w, b):
        return jnp.sum(_xla_paired(xp, w, b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xp, w, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(xp, w, b)
    for a, e, name in zip(gp, gx, ("dxp", "dw", "db")):
        # forward residual (Pallas) vs XLA differ by reassociation ulps, which
        # enter the cotangents through the squared loss
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4,
                                   err_msg=name)


def test_ssd_block1_kernel_equivalence():
    """SSD with conv12_kernel forced ON (interpret) equals the XLA paired path
    on the full block-1 composition (conv+BN+ReLU chain through the pool)."""
    from object_detection_torch2_tpu.models.ssd import SSD

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 1, (1, 264, 264, 3)).astype(np.float32))  # min valid pyramid
    m_ref = SSD(num_classes=21, conv12_kernel=False)
    variables = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    out_ref = m_ref.apply(variables, x, train=False, use_batch_stats=True,
                          mutable=["batch_stats"])[0]
    m_ker = SSD(num_classes=21, conv12_kernel=True)
    out_ker = m_ker.apply(variables, x, train=False, use_batch_stats=True,
                          mutable=["batch_stats"])[0]
    # block-1 reassociation ulps amplified through 35 conv+BN layers
    # (measured maxabs 3e-4 on ~1-scale logits)
    np.testing.assert_allclose(np.asarray(out_ker), np.asarray(out_ref),
                               rtol=1e-3, atol=1e-3)
