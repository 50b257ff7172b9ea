"""Input pipeline: shuffled batching + background prefetch onto the device mesh.

Replaces the reference's torch DataLoader worker pool (its only concurrency —
SURVEY.md §2.3) with the TPU-shaped equivalent: a background thread stages the
next host batch and `jax.device_put`s it with the batch axis sharded over the
mesh while the current step runs, so host work and TPU compute overlap. Batches
are static-shaped (fixed batch size, fixed max-G) — no recompiles.

Two sources:
- RecordDataset (packed, memmap) — the fast path;
- any indexable dataset yielding (image, gt) — the compatibility path, with
  `collate`-style padding.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from object_detection_torch2_tpu.data.voc import collate
from object_detection_torch2_tpu.parallel import mesh as mesh_lib


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        max_gt: int = 64,
        mesh=None,
        prefetch: int = 2,
        drop_last: bool = True,
        num_workers: int = 0,
        stack_steps: int = 1,
        device_cache: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size  # GLOBAL batch size (all processes, all devices)
        self.shuffle = shuffle
        self.seed = seed
        self.max_gt = max_gt
        self.mesh = mesh
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0
        self._is_records = hasattr(dataset, "batch")
        # multiprocess decode workers for the raw (non-records) path — the
        # reference's num_workers concurrency (src/train.py:23). The records
        # path is memmap-read-bound and needs none. Pool spawns lazily on
        # first iteration and persists across epochs; capped at one worker
        # per batch so tiny fixture runs don't pay 8 process spawns.
        self.num_workers = 0 if self._is_records else max(0, int(num_workers))
        self._pool = None
        # stack_steps=K groups K consecutive batches into (K, B, ...) stacks
        # for `Trainer.train_steps`' in-graph scan (one host dispatch per K
        # steps — dispatch latency through remote runtimes otherwise costs
        # ~2.3 ms/step). The final group of an epoch may be shorter.
        self.stack_steps = max(1, int(stack_steps))
        # device_cache: the whole packed dataset uploads to HBM once (replicated
        # over the mesh) and batches are GATHERED on device from the same
        # host-computed shuffle indices — per-step H2D drops from megabytes of
        # pixels to bytes of int32 (data/device_cache.py; bit-identical batch
        # composition to streaming, tests/test_device_cache.py).
        self._cache = None
        if device_cache:
            if not self._is_records:
                raise ValueError("device_cache requires a packed RecordDataset (data/records.py)")
            if mesh is None:
                raise ValueError("device_cache requires a mesh (the cache is mesh-replicated)")
            if not drop_last:
                raise ValueError("device_cache requires drop_last=True (static batch shapes)")
            from object_detection_torch2_tpu.data.device_cache import DeviceCache

            self._cache = DeviceCache(dataset, mesh)
        # multi-host DP: every process computes the SAME global index order
        # (shared seed) and loads only its contiguous slice of each global
        # batch; mesh_lib.shard_batch assembles the global array from the
        # process-local slices (jax.make_array_from_process_local_data).
        import jax

        self._num_procs = jax.process_count()
        self._proc = jax.process_index()
        if self._num_procs > 1:
            if mesh is not None and not drop_last:
                raise ValueError(
                    "multi-process DataLoader with a mesh requires drop_last=True (a ragged "
                    "final batch cannot be assembled into equal-shaped global shards)"
                )
            # mesh=None multi-process is SERVING mode (--distributed inference/
            # evaluate): host batches are this process's contiguous slice of
            # each global batch — global rows [proc*pp, (proc+1)*pp) — and the
            # CLI pads/assembles them via parallel.shard_batch itself. With
            # drop_last=False only the FINAL batch can be ragged, so only the
            # final local slice may be short or empty (every process still
            # yields it — all processes must join every collective dispatch).
            if batch_size % self._num_procs:
                raise ValueError(f"batch_size {batch_size} must divide over {self._num_procs} processes")

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        """Per-batch index arrays (process-local slice in multi-host runs)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        stop = n - n % self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            if self._num_procs > 1:
                per_proc = self.batch_size // self._num_procs
                idx = idx[self._proc * per_proc : (self._proc + 1) * per_proc]
            yield idx

    def _ensure_pool(self):
        if self._pool is None and self.num_workers > 0:
            from object_detection_torch2_tpu.data.ingest import IngestPool

            self._pool = IngestPool(
                self.dataset, min(self.num_workers, max(1, len(self))), max_gt=self.max_gt
            )
        return self._pool

    def _empty_batch(self):
        """(0, ...)-shaped batch with the correct trailing dims — a process
        whose final local slice is empty still yields it (multi-process
        serving: every process must join the final collective dispatch)."""
        if self._is_records:
            images, gts = self.dataset.batch(np.zeros(0, np.int64))
            return np.ascontiguousarray(images), np.ascontiguousarray(gts)
        images, gts = collate([self.dataset[0]], max_gt=self.max_gt)
        return images[:0], gts[:0]

    def _host_batches(self):
        if not self._is_records and self._ensure_pool() is not None:
            idxs = list(self._index_batches())
            empty_tail = sum(1 for i in idxs if len(i) == 0)  # only the final
            yield from self._pool.batches(iter(i for i in idxs if len(i)))
            for _ in range(empty_tail):
                yield self._empty_batch()
            return
        for idx in self._index_batches():
            if len(idx) == 0:
                yield self._empty_batch()
                continue
            if self._is_records:
                images, gts = self.dataset.batch(np.sort(idx))
                images, gts = np.ascontiguousarray(images), np.ascontiguousarray(gts)
            else:
                images, gts = collate([self.dataset[int(i)] for i in idx], max_gt=self.max_gt)
            yield images, gts

    def close(self):
        """Shut down the worker pool (idempotent; also runs at GC)."""
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def __del__(self):  # best-effort; close() is the explicit surface
        try:
            self.close()
        except Exception:
            pass

    def _place(self, batch, batch_axis: int = 0):
        if self.mesh is not None:
            return mesh_lib.shard_batch(self.mesh, batch, batch_axis)
        return batch

    def _stacked_host_batches(self):
        """Group `stack_steps` host batches into (K, B, ...) stacks."""
        group: list = []
        for batch in self._host_batches():
            group.append(batch)
            if len(group) == self.stack_steps:
                yield tuple(np.stack(parts) for parts in zip(*group))
                group = []
        if group:  # epoch tail: a shorter stack (cli/train.py dispatches its
            # batches through the single-step program — no K=tail recompile)
            yield tuple(np.stack(parts) for parts in zip(*group))

    def _cached_device_batches(self):
        """device_cache path: yield on-device gathers of the SAME index
        sequence the streaming path would load — (K, B) stacks when
        stack_steps > 1 (a shorter tail stack gathers through a second, cheap
        gather specialization), (B,) otherwise. Indices are sorted per batch
        exactly like the streaming records read (memmap locality there;
        BIT-IDENTICAL batch row order here)."""
        group: list = []
        for idx in self._index_batches():
            idx = np.sort(idx)
            if self.stack_steps == 1:
                yield self._cache.gather(idx)
                continue
            group.append(idx)
            if len(group) == self.stack_steps:
                yield self._cache.gather(np.stack(group))
                group = []
        if group:
            yield self._cache.gather(np.stack(group))

    def __iter__(self):
        """Yield device-placed (images, gts) — (K, B, ...) stacks when
        `stack_steps` K > 1; a background thread keeps `prefetch` batches
        staged ahead."""
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        failure: list[BaseException] = []
        stacked = self.stack_steps > 1
        if self._cache is not None:
            source = self._cached_device_batches
        else:
            source = self._stacked_host_batches if stacked else self._host_batches

        def producer():
            try:
                for batch in source():
                    if self._cache is not None:
                        q.put(batch)  # already device-resident, correctly sharded
                        continue
                    q.put(self._place(batch, batch_axis=1 if stacked else 0))
            except BaseException as e:  # re-raised in the consumer — a decode
                failure.append(e)       # error must not silently end the epoch
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                break
            yield item
