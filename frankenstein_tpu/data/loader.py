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


def stack_steps(iterator: Iterator, k: int) -> Iterator:
    """Group ``k`` consecutive host batches into one step-stacked batch —
    every leaf gains a leading [k] axis (np.stack). Composed BEFORE
    ``to_device`` so stacking stays a cheap host memcpy; the trainer's
    steps_per_dispatch scan consumes the result. A trailing partial group
    (end of a finite iterator) is dropped, mirroring drop_last batching."""
    import jax
    import numpy as np

    buf = []
    for item in iterator:
        buf.append(item)
        if len(buf) == k:
            yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *buf)
            buf = []


def to_device(iterator: Iterator) -> Iterator:
    """Map ``jax.device_put`` over an iterator of (pytrees of) host arrays.

    Composed INSIDE ``prefetch`` (i.e. ``prefetch(to_device(it))``), the
    host->device copy of batch N+1 runs in the prefetch thread while the
    training step for batch N computes — device transfers leave the step
    dispatch path entirely. device_put is itself asynchronous, so the
    thread merely *initiates* copies early; a bounded queue (buffer_size)
    caps how much device memory the staged batches can pin."""
    import jax

    for item in iterator:
        yield jax.device_put(item)
