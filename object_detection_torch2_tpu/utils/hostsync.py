"""Device->host result pipelining for serving/eval loops.

Through a remote runtime every synchronous host fetch pays a full round trip
(~31 ms measured through the dev tunnel — tools/bench_infer_detail.py
`dispatch_d2h_floor_ms`), which serialized against ~10-40 ms of device compute
per batch caps throughput far below the device's. `FetchPipeline` hides it:
results are enqueued right after dispatch with their D2H started
(`copy_to_host_async`), and dequeued `depth` batches later when the transfer
has long completed — so both the device compute and the copy overlap with
later batches. Measured on the inference pipeline at bs32: 240 -> 1292 img/s
(tools/bench_infer.py).
"""

from __future__ import annotations

from collections import deque

import jax


class FetchPipeline:
    """Deferred host fetches: push jitted outputs, receive them `depth` pushes
    later (then `flush()` the tail). Any pytree of jax Arrays works; non-array
    leaves pass through untouched."""

    def __init__(self, depth: int = 2):
        self.depth = depth
        self._q: deque = deque()

    def push(self, item):
        """Enqueue `item` (starting its async D2H); returns a previously pushed
        item once the queue exceeds `depth`, else None."""
        for leaf in jax.tree.leaves(item):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        self._q.append(item)
        if len(self._q) > self.depth:
            return self._q.popleft()
        return None

    def flush(self):
        """Yield the remaining queued items in order."""
        while self._q:
            yield self._q.popleft()
