"""Profiling/observability hooks."""

import numpy as np

from object_detection_torch2_tpu.utils.profiling import ThroughputMeter, maybe_trace


def test_throughput_meter():
    m = ThroughputMeter(batch_size=32, num_devices=8)
    m.step()
    m.step(2)
    assert m.steps == 3
    assert m.images_per_sec() > 0
    # two separate wall-clock reads: only approximately proportional
    np.testing.assert_allclose(m.images_per_sec_per_chip() * 8, m.images_per_sec(), rtol=0.25)
    m.reset()
    assert m.steps == 0


def test_maybe_trace_disabled_is_noop():
    with maybe_trace(None):
        x = 1 + 1
    assert x == 2


def test_maybe_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with maybe_trace(str(tmp_path)):
        _ = jnp.ones(8).sum().block_until_ready()
    # jax.profiler writes plugins/profile/<run>/ under the log dir
    produced = list(tmp_path.rglob("*.xplane.pb"))
    assert produced, f"no xplane trace written under {tmp_path}"
