"""Numerics guards — the JAX-native replacement for the sanitizer/race
columns of SURVEY.md §5 (pure-functional code has no data races; the failure
modes worth trapping are NaNs and jit/eager divergence).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def assert_finite_tree(tree, name: str = "tree"):
    """Raise with the offending paths if any leaf holds NaN/inf."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            key = "/".join(getattr(k, "key", str(k)) for k in path)
            bad.append(f"{key}: {np.isnan(arr).sum()} NaN, "
                       f"{np.isinf(arr).sum()} inf of {arr.size}")
    if bad:
        raise FloatingPointError(f"non-finite values in {name}:\n  "
                                 + "\n  ".join(bad))


def jit_eager_parity(fn: Callable, *args, atol: float = 1e-4,
                     rtol: float = 1e-4) -> None:
    """Assert jit(fn)(*args) ~= fn(*args) on every output leaf."""
    eager = fn(*args)
    jitted = jax.jit(fn)(*args)
    for (pe, a), (pj, b) in zip(
            jax.tree_util.tree_flatten_with_path(eager)[0],
            jax.tree_util.tree_flatten_with_path(jitted)[0]):
        key = "/".join(getattr(k, "key", str(k)) for k in pe)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=rtol,
                                   err_msg=f"jit/eager divergence at {key}")


def enable_nan_debugging():
    """Global jit-level NaN trap (jax.config debug_nans)."""
    jax.config.update("jax_debug_nans", True)
