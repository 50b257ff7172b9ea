"""Pallas NMS kernel: exact equivalence with the XLA formulations.

Runs in Pallas interpret mode on the CPU test platform (the compiled path is
exercised on real TPU by tools/bench_nms.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _with_interpret(fn):
    from jax.experimental.pallas import tpu as pltpu

    def run(*args, **kwargs):
        with pltpu.force_tpu_interpret_mode():
            return fn(*args, **kwargs)

    return run


@pytest.mark.parametrize("p", [130, 300])
def test_pallas_equals_serial(p):
    from object_detection_torch2_tpu.ops.nms import nms_keep_mask_serial
    from object_detection_torch2_tpu.ops.nms_pallas import nms_keep_mask_pallas

    rng = np.random.default_rng(7)
    n = 2
    boxes = np.zeros((n, p, 4), np.float32)
    centers = rng.uniform(0.1, 0.9, (n, 5, 2))
    pick = rng.integers(0, 5, (n, p))
    boxes[..., :2] = np.take_along_axis(centers, pick[..., None], axis=1) + rng.normal(0, 0.03, (n, p, 2))
    boxes[..., 2:] = rng.uniform(0.05, 0.35, (n, p, 2))
    scores = rng.uniform(-0.2, 1.0, (n, p)).astype(np.float32)

    got = _with_interpret(nms_keep_mask_pallas)(jnp.asarray(boxes), jnp.asarray(scores))
    want = nms_keep_mask_serial(jnp.asarray(boxes), jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _clustered_boxes(rng, n, p):
    boxes = np.zeros((n, p, 4), np.float32)
    centers = rng.uniform(0.1, 0.9, (n, 6, 2))
    pick = rng.integers(0, 6, (n, p))
    boxes[..., :2] = np.take_along_axis(centers, pick[..., None], axis=1) + rng.normal(0, 0.04, (n, p, 2))
    boxes[..., 2:] = rng.uniform(0.05, 0.3, (n, p, 2))
    return boxes


def test_dense_backend_pallas_equals_xla_in_nms_keep_mask():
    """The integrated dense fallback (`nms_keep_mask(dense_backend="pallas")`)
    must produce the identical keep set as the blocked-XLA full path. p=300
    with >128 positives falls through the 128 tier to the full sweep."""
    from object_detection_torch2_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(11)
    n, p = 3, 300
    boxes = _clustered_boxes(rng, n, p)
    scores = rng.uniform(0.1, 1.0, (n, p)).astype(np.float32)  # every candidate positive

    want = nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), dense_backend="xla")
    got = _with_interpret(nms_keep_mask)(jnp.asarray(boxes), jnp.asarray(scores),
                                         dense_backend="pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dense_backend_auto_resolves_to_xla_off_tpu():
    """"auto" lowers via lax.platform_dependent: on the CPU test platform the
    default (blocked-XLA) branch runs — result identical to explicit "xla"
    and no Mosaic compilation is attempted."""
    from object_detection_torch2_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(13)
    n, p = 2, 300
    boxes = _clustered_boxes(rng, n, p)
    scores = rng.uniform(0.1, 1.0, (n, p)).astype(np.float32)

    got = jax.jit(nms_keep_mask)(jnp.asarray(boxes), jnp.asarray(scores))  # default: auto
    want = nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), dense_backend="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
