"""Background-thread batch prefetching.

The reference hides host latency with DataLoader worker processes
(reference dataset.py:101-109). Here a single daemon thread assembles
the next batches while the device is busy, which is enough on this
host profile (batch assembly is numpy slicing, the expensive part is
the host->device transfer that jax already runs async).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_DONE = object()


def prefetch(it: Iterable, size: int = 2) -> Iterator:
    q: queue.Queue = queue.Queue(maxsize=size)
    err = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _DONE:
            if err:
                raise err[0]
            return
        yield item
