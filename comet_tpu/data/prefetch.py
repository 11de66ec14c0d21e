"""Host-side prefetching: overlap PIL decode + keypoint seeding with device
compute.

The reference's DataLoader(num_workers=8) hides dataset __getitem__ latency
behind worker processes (comet/models/train_util.py:866-896). This host has
one core, but the device step is asynchronous: while the TPU evaluates
sequence i, a producer thread decodes sequence i+1/i+2. A bounded queue
(depth 2) gives double buffering without unbounded memory growth.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(producer: Callable[[int], T], n: int, depth: int = 2) -> Iterator[T]:
    """Yield producer(0..n-1) with a background thread keeping `depth`
    items ready. Exceptions in the producer propagate to the consumer."""
    if n <= 0:
        return
    q: queue.Queue = queue.Queue(maxsize=depth)

    def work():
        try:
            for i in range(n):
                q.put(producer(i))
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer side
            q.put(e)
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=work, daemon=True, name="comet-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
