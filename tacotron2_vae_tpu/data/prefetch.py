"""Background input-pipeline prefetch.

The reference overlaps featurization with training via torch DataLoader
workers (train.py:59-66).  The TPU-native equivalent: a daemon thread runs
the (featurize -> collate -> device_put) chain ``depth`` batches ahead of
the jitted step, so the host pipeline hides behind device compute instead
of starving the chip between steps.

Device transfer belongs in the worker: passing ``transform=shard_batch``
overlaps H2D with the previous step's execution (JAX dispatch is
thread-safe; arrays surface on the consumer side fully committed).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_STOP = object()


def prefetch(
    iterable: Iterable,
    depth: int = 2,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterable`` through a bounded background queue.

    * order-preserving; at most ``depth`` items in flight
    * ``transform`` runs in the worker thread (featurize/device_put there)
    * worker exceptions re-raise at the consumer's next pull
    * early consumer exit (break/close) stops the worker promptly
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                if not _put(transform(item) if transform else item):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            _put(e)
            return
        _put(_STOP)

    t = threading.Thread(target=worker, daemon=True, name="input-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _STOP:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
