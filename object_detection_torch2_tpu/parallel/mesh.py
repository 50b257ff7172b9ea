"""Device mesh + sharding helpers for data-parallel training.

The reference is strictly single-process single-GPU (reference: src/train.py:68 —
hardcoded `cuda:0`; SURVEY.md §2.3: no collectives anywhere). The TPU rebuild
scales by the one strategy this model warrants — data parallelism — expressed
the XLA-native way: a 1-D `Mesh(('data',))`, batches sharded over it with
`NamedSharding`, parameters replicated, and the gradient all-reduce emitted by
XLA as an ICI collective inside the jitted train step. Multi-host extends this
by initializing jax.distributed and using the same mesh over all processes
(DCN between hosts), with no code change here.

TP/PP/SP/EP are deliberately not built: the largest layer is a 3x3x1024 conv —
nothing to shard (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with the batch axis sharded."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated_sharding(mesh))
