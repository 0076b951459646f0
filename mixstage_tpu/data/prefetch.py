"""Asynchronous host→device batch prefetcher.

The reference's loop is fully synchronous (h5-backed Dataset → transform →
``.to(device)`` per batch, trainer.py:603-618).  On TPU the host-side work
(ZNorm, joint masking, KMeans labels, device_put) should overlap the previous
step's device compute: this prefetcher runs the batch-prep callable in a
background thread with a small bounded queue, so the accelerator never waits
on the host for steady-state training.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


class _Sentinel:
    pass


_DONE = _Sentinel()


def prefetch(iterable: Iterable, prepare: Callable, depth: int = 2) -> Iterator:
    """Yield ``prepare(item)`` for items of ``iterable``, prepared ``depth``
    items ahead in a daemon thread.  Exceptions propagate to the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in iterable:
                q.put(prepare(item))
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            q.put(e)
        finally:
            q.put(_DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        out = q.get()
        if out is _DONE:
            return
        if isinstance(out, BaseException):
            raise out
        yield out
