"""Anchor table parity vs the reference generator (reference: src/model/ssd.py:108-133)."""

import numpy as np

from object_detection_torch2_tpu.core import anchors


def test_anchor_count():
    assert anchors.NUM_ANCHORS == 8732
    assert anchors.default_boxes().shape == (8732, 4)


def test_scales():
    np.testing.assert_allclose(
        [anchors.scale(k) for k in range(1, 7)], [0.2, 0.34, 0.48, 0.62, 0.76, 0.9], atol=1e-12
    )
    assert abs(anchors.scale(7) - 1.04) < 1e-12


def test_anchor_table_bitwise_vs_reference(goldens):
    ref = goldens("anchors")["default_bboxes"]
    ours = anchors.default_boxes()
    # identical float32 values (both sides compute in float64 then cast)
    np.testing.assert_array_equal(ours, ref)


def test_feature_grids_for_imsize():
    assert anchors.feature_grids_for(300) == anchors.FEATURE_GRIDS
    # arbitrary-size grids must match the model's actual tap shapes
    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.models.ssd import SSD

    for imsize in (300, 384, 512):
        grids = anchors.feature_grids_for(imsize)
        p = sum(m * n * a for m, n, a in grids)
        model = SSD(num_classes=21)
        x = jnp.zeros((1, imsize, imsize, 3))
        abstract_vars = jax.eval_shape(lambda x=x: model.init(jax.random.PRNGKey(0), x, train=False))
        shape = jax.eval_shape(
            lambda v, x=x: model.apply(v, x, train=False, use_batch_stats=False), abstract_vars
        )
        assert shape.shape == (1, p, 25), (imsize, shape.shape, p)
        assert anchors.default_boxes(grids).shape == (p, 4)

    import pytest

    with pytest.raises(ValueError):
        anchors.feature_grids_for(150)


def test_q4_transposed_grid():
    """Quirk Q4: the first center coordinate follows the row index i; anchor 4
    (cell i=0, j=1 at level 1) differs from anchor 0 only in coordinate 1."""
    t = anchors.default_boxes()
    a0, a4 = t[0], t[4]
    assert a0[0] == a4[0]  # cx driven by i stays
    assert a0[1] != a4[1]  # cy driven by j moves
