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

import collections
import concurrent.futures
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


def prefetch_map(
    fn: Callable,
    items: Iterable,
    workers: int = 4,
    depth: Optional[int] = None,
) -> Iterator:
    """Order-preserving parallel map through a thread pool.

    The TPU-native answer to torch's multi-worker DataLoader (reference
    train.py:61-65): ``workers`` threads run ``fn`` (batch assembly —
    np.load + native collate, both GIL-releasing) concurrently, up to
    ``depth`` results ahead of the consumer.  Results arrive in input
    order.  A worker exception re-raises at the consumer's pull of that
    item; remaining queued work is cancelled on early exit.
    """
    if workers <= 1:
        yield from prefetch((fn(x) for x in items), depth=depth or 2)
        return
    depth = depth or 2 * workers
    pool = concurrent.futures.ThreadPoolExecutor(
        workers, thread_name_prefix="input-worker"
    )
    pending: collections.deque = collections.deque()
    try:
        for x in items:
            pending.append(pool.submit(fn, x))
            if len(pending) >= depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
    finally:
        for f in pending:
            f.cancel()
        pool.shutdown(wait=False)
