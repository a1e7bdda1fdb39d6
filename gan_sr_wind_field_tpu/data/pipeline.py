"""Host→device input pipeline: threaded double-buffered prefetch.

The reference overlaps IO with compute via DataLoader worker processes +
pinned-memory H2D copies (train.py:34-58,133-135). The JAX equivalent: a
producer thread assembles host batches and `jax.device_put`s them (with an
optional NamedSharding for multi-device meshes) while the device runs the
previous step — dispatch is async, so `device_put` of batch N+1 overlaps
step N.

Producer exceptions are re-raised in the consumer (a silently dying producer
would otherwise no-op the training loop).
"""

from __future__ import annotations

import queue
import threading

import jax

_DONE = object()


def prefetch_to_device(iterator, sharding=None, size: int = 2):
    """Wrap a host batch iterator; yields device-resident batches.

    Each item may be an array or a tuple/list of arrays; every leaf is
    `jax.device_put` with ``sharding`` (replicated/sharded as given).
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    multihost = jax.process_count() > 1 and sharding is not None

    def put_one(x):
        if multihost:
            # pods: each process holds its local batch shard; assemble the
            # global array across hosts (DCN metadata only, no data motion)
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    def put(item):
        if isinstance(item, (tuple, list)):
            return type(item)(put_one(x) for x in item)
        return put_one(item)

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except BaseException as e:  # propagate into the consumer
            q.put(e)
            return
        q.put(_DONE)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _DONE:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
