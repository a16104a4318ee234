"""MFU estimation and profiler capture.

TPU re-anchor of reference:models/gpt2_model.py:312-326 (the PaLM App. B
analytic-FLOPs formula vs A100 312 TF): peak FLOPs come from the actual TPU
generation; ``trace`` wraps jax.profiler for on-demand captures."""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

# bf16 peak FLOPs per chip
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}
A100_PEAK_FLOPS = 312e12


def detect_peak_flops(default: float = TPU_PEAK_FLOPS["v5e"]) -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for gen, flops in TPU_PEAK_FLOPS.items():
        if gen in kind.replace(" ", "").replace("tpu", ""):
            return flops
    if "v5lite" in kind.replace(" ", "") or "v5 lite" in kind:
        return TPU_PEAK_FLOPS["v5e"]
    return default


def transformer_flops_per_token(n_params: int, n_layer: int, n_head: int,
                                head_dim: int, seq_len: int) -> float:
    """PaLM Appendix B: 6N + 12*L*H*Q*T (reference:gpt2_model.py:315-319)."""
    return 6 * n_params + 12 * n_layer * n_head * head_dim * seq_len


def estimate_mfu(flops_per_iter: float, iter_time_s: float,
                 peak_flops: Optional[float] = None,
                 n_chips: int = 1) -> float:
    peak = peak_flops if peak_flops is not None else detect_peak_flops()
    return flops_per_iter / max(iter_time_s, 1e-12) / (peak * n_chips)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace capture around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def count_parameters(params) -> int:
    """Total parameter count (reference:utils/train_utils.py:40-47)."""
    import numpy as np
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
