"""Prefetching host loader: overlaps batch assembly with device compute.

The reference leans on torch DataLoader worker processes
(reference:utils/train_utils.py:74-91, num_workers=3). On TPU the host work
is light (stacking preprocessed numpy arrays), so a single prefetch thread
with a bounded queue gives the same overlap without multiprocessing."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


def prefetch(iterator: Iterator, buffer_size: int = 2) -> Iterator:
    """Run ``iterator`` in a daemon thread, keeping ``buffer_size`` batches
    ready. Exceptions propagate to the consumer."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
