"""Sliding-window streaming inference over long recordings.

The reference sketches two streaming drivers that slide a window over a long
signal (``default_generation``/``cache_generation``,
reference:models/brainformer.py:578-618 — the cached variant's kv plumbing is
dead code there). Here the windowing is a host-side driver around the jitted
encoder; every window is a fixed shape so there is exactly ONE compilation.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np


def sliding_windows(signal: np.ndarray, window_size: int, stride: int):
    """[T, C] -> iterator of [window_size, C] views (last partial dropped,
    matching reference:brainformer.py:586)."""
    t = signal.shape[0]
    n_iters = int((t - window_size) // stride)
    for i in range(max(n_iters, 0) + 1):
        start = i * stride
        yield signal[start:start + window_size]


def stream_predict(model, params, signal: np.ndarray, *, window_size: int,
                   stride: int = 8, batch_windows: int = 8,
                   method=None) -> List[jnp.ndarray]:
    """Run the model over every sliding window, batching windows together.

    model/params: a linen module + params whose ``method`` (default
    ``__call__``'s encode path) maps [B, window, C] -> [B, ...].
    Returns the per-window outputs, window-major.
    """
    method = method or type(model).encode
    windows = list(sliding_windows(signal, window_size, stride))
    if not windows:
        return []
    fn = jax.jit(lambda p, x: model.apply(p, x, method=method))
    outs = []
    for s in range(0, len(windows), batch_windows):
        chunk = windows[s:s + batch_windows]
        pad = batch_windows - len(chunk)   # keep the batch shape static
        x = np.stack(chunk + [chunk[-1]] * pad).astype(np.float32)
        y = fn(params, jnp.asarray(x))
        outs.extend(y[i] for i in range(len(chunk)))
    return outs
