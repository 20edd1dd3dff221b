"""Host-side prefetch: overlap batch preparation with device compute.

The reference's only host concurrency is DataLoader(num_workers=4) for NBA
(train.py:167-173 — SURVEY.md §2.6 worker parallelism). TPU-native equivalent:
a background thread runs the (numpy) batch pipeline and pushes
device-transferred batches into a bounded queue, so PCIe H2D and host
preprocessing hide behind the previous step's device time.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

_SENTINEL = object()


def prefetch(batches: Iterable, *, size: int = 2,
             device_put: Callable | None = None) -> Iterator:
    """Iterate ``batches`` through a ``size``-deep background queue.

    ``device_put`` (default ``jax.device_put`` on array leaves) runs in the
    worker thread, so transfers are already in flight when the consumer asks.
    Exceptions in the producer re-raise at the consumer.
    """
    if device_put is None:
        def device_put(b):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if hasattr(x, "shape") else x, b)

    q: queue.Queue = queue.Queue(maxsize=size)
    err: list[BaseException] = []
    cancelled = threading.Event()

    def _put(item) -> bool:
        # bounded-wait put so an abandoned consumer (step exception,
        # KeyboardInterrupt, generator close) releases the producer instead
        # of leaking a thread pinning device buffers
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for b in batches:
                if not _put(device_put(b)):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        cancelled.set()
