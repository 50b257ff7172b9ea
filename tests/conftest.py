"""Test harness config: force JAX onto a virtual 8-device CPU platform BEFORE any
jax import, so multi-chip sharding tests run without TPU hardware (the standard
JAX idiom — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

from pathlib import Path

import numpy as np
import pytest

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    """Load golden .npz fixtures generated from the reference by tools/gen_goldens.py."""

    class _G:
        def __call__(self, name):
            return np.load(GOLDENS / f"{name}.npz", allow_pickle=False)

    return _G()
