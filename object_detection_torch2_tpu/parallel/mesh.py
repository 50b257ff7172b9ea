"""Device mesh + sharding helpers for data-parallel training.

The reference is strictly single-process single-GPU (reference: src/train.py:68 —
hardcoded `cuda:0`; SURVEY.md §2.3: no collectives anywhere). The TPU rebuild
scales by the one strategy this model warrants — data parallelism — expressed
the XLA-native way: a 1-D `Mesh(('data',))`, batches sharded over it with
`NamedSharding`, parameters replicated, and the gradient all-reduce emitted by
XLA as an ICI collective inside the jitted train step. Multi-host extends this
by initializing jax.distributed (see `init_distributed`) and using the same
mesh over all processes: each process feeds its local slice of the global
batch (`shard_batch`) and XLA routes the all-reduce over ICI within hosts and
DCN across them. Tested with a real 2-process CPU cluster in
tests/test_multihost.py.

TP/PP/SP/EP are deliberately not built: the largest layer is a 3x3x1024 conv —
nothing to shard (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """jax.distributed.initialize for multi-host DP (the --distributed flag).

    On TPU pods the arguments are auto-detected from the environment. On the
    CPU backend (tests; CPU clusters) cross-process collectives need the gloo
    implementation selected before backend init."""
    if jax.config.jax_platforms and "cpu" in str(jax.config.jax_platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Batch axis sharded over the data axis (axes before it replicated).

    batch_axis=1 is the layout for K-stacked micro-batch tensors (K, B, ...)
    consumed by `Trainer.train_steps`' in-graph scan: the scan axis stays
    whole, each micro-batch shards over the mesh exactly like a single step."""
    return NamedSharding(mesh, P(*([None] * batch_axis), DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """Host arrays -> device with the batch axis sharded over the mesh.

    Single process: a plain device_put of the full batch. Multi-process
    (multi-host DP after `jax.distributed.initialize`): each process passes its
    PROCESS-LOCAL slice of the global batch (global_batch/process_count rows —
    the DataLoader feeds exactly that) and the global array is assembled with
    `jax.make_array_from_process_local_data`; XLA then runs the gradient
    all-reduce over ICI within hosts and DCN across them.

    batch_axis=1 places K-stacked (K, B, ...) micro-batch tensors for the
    multi-step scan (see `batch_sharding`)."""
    sharding = batch_sharding(mesh, batch_axis)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def _make(x):
        x = np.asarray(x)
        global_shape = list(x.shape)
        global_shape[batch_axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(sharding, x, global_shape=tuple(global_shape))

    return jax.tree.map(_make, tree)


def local_rows(arr, batch_axis: int = 0) -> np.ndarray:
    """Process-local rows of a batch-sharded global array, as numpy.

    Single-process (or plain numpy input): the whole array. Multi-process:
    the rows held by THIS process's devices, concatenated in global row order
    — with the contiguous device order of `make_mesh` and the loader's
    contiguous per-process index slices, these are global rows
    [proc*pp, (proc+1)*pp) of each batch, matching exactly what this process
    fed in via `shard_batch`. The serving CLIs use this to fetch only their
    slice of eval/inference outputs (np.asarray on a non-fully-addressable
    global array raises)."""
    if jax.process_count() == 1 or not hasattr(arr, "addressable_shards"):
        return np.asarray(arr)
    if arr.is_fully_replicated:
        return np.asarray(arr)
    seen: dict[int, np.ndarray] = {}
    for s in arr.addressable_shards:  # dedupe replicated copies by row offset
        seen.setdefault(s.index[batch_axis].start or 0, np.asarray(s.data))
    return np.concatenate([seen[k] for k in sorted(seen)], axis=batch_axis)


def replicate(mesh: Mesh, tree):
    """Replicate host values over the mesh (all processes must hold identical
    values — e.g. model params initialized from the same seed).

    Multi-process: assembled with jax.make_array_from_process_local_data —
    each process supplies its local copy for its own devices, NO cross-process
    broadcast or verification collective. (jax.device_put's multi-process
    path runs multihost_utils.assert_equal, whose broadcast was observed to
    garble multi-MB payloads over gloo — tests/multihost_eval_worker.py's
    2.1 MB param hit it; and the verification round-trip is pure overhead
    when values are same-seed identical by construction.)"""
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def _rep(x):
        # already-placed leaves pass through (device_put's no-op analog):
        # serving calls replicate per batch on the same variables tree
        if isinstance(x, jax.Array) and x.sharding.is_equivalent_to(sharding, x.ndim):
            return x
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(_rep, tree)
