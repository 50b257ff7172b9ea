"""Persistent XLA compilation cache, on by default for the CLIs and benches.

The full SSD300 train/inference programs take minutes to compile against a
remote TPU runtime (5-12 min measured through the dev tunnel; tens of seconds
on a local chip). The cache makes every repeat invocation — resumed training,
re-running evaluate with new weights, benches — start in seconds. Respects an
explicit JAX_COMPILATION_CACHE_DIR; disable with
JAX_COMPILATION_CACHE_DIR="" (empty).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is not None:
        path = env or None  # explicit empty string disables
    elif path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "object_detection_torch2_tpu", "xla")
    if not path:
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never fail the run over it
        return None
    return path
