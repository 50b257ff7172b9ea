"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only observability is tqdm running-loss bars (reference:
src/train.py:105-108) plus `torch.autograd.set_detect_anomaly(True)`
(train.py:102). TPU-native equivalents:

- `maybe_trace`: context manager around `jax.profiler` producing an XPlane
  trace viewable in TensorBoard / xprof (per-op device timings, HBM usage);
- `ThroughputMeter`: steps/sec and images/sec/chip counters — the BASELINE.json
  metrics — with no device synchronization on the hot path;
- `enable_debug_nans`: the jax equivalent of torch's anomaly detection
  (checks every jitted output for NaNs; large overhead, off by default).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def maybe_trace(log_dir: str | None):
    """Wrap a training region in a jax.profiler trace when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def enable_debug_nans(enabled: bool = True):
    """torch detect_anomaly equivalent: raise on NaN/Inf in any jitted output."""
    import jax

    jax.config.update("jax_debug_nans", enabled)
    jax.config.update("jax_debug_infs", enabled)


class ThroughputMeter:
    """Images/sec (per chip) without forcing device syncs inside the step loop.

    `clock` is injectable (tests use a fake) so the two rate accessors can be
    validated deterministically; each accessor reads the clock once, so callers
    that need mutually consistent total/per-chip rates should take one
    `rates()` snapshot rather than two separate live reads.
    """

    def __init__(self, batch_size: int, num_devices: int = 1, clock=time.perf_counter):
        self.batch_size = batch_size
        self.num_devices = num_devices
        self._clock = clock
        self.reset()

    def reset(self):
        self._start = self._clock()
        self._steps = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def steps(self) -> int:
        return self._steps

    def images_per_sec(self) -> float:
        dt = self._clock() - self._start
        return self._steps * self.batch_size / dt if dt > 0 else 0.0

    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec() / max(self.num_devices, 1)

    def rates(self) -> tuple[float, float]:
        """(total, per-chip) images/sec from ONE clock read — exactly
        proportional by construction, unlike two live accessor calls."""
        total = self.images_per_sec()
        return total, total / max(self.num_devices, 1)
