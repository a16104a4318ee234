"""Rotary position embeddings, TPU-first.

The reference caches RoPE as complex64 and rotates via complex multiply
(reference:models/brainformer.py:56-91). complex64 is a poor fit for the TPU
vector unit, so we precompute real sin/cos tables and rotate with fused
multiply-adds; ``tests/test_rope.py`` proves numerical equivalence to the
complex formulation.

Pairing convention matches the reference's ``view_as_complex`` on the last
axis: adjacent elements (0,1), (2,3), ... form the rotated pairs.

Two truncation semantics exist in the reference:
- ``brainformer.apply_rope`` slices the SUFFIX of the cache (``rope[-T:]``,
  reference:models/brainformer.py:80) — right decode semantics.
- ``simple_mae.apply_rope`` slices the PREFIX (``rope[:T]``).
Both are supported via ``align``; gather-based per-sample position tables
(used by MAE masking) are supported by passing ``positions``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def build_rope_cache(dim: int, seq_len: int, theta: float = 10000.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Return a [seq_len, dim//2, 2] table of (cos, sin).

    Equivalent to the reference's ``torch.polar(ones, outer(t, freqs))``
    (reference:models/brainformer.py:56-68) with real/imag stacked on the
    trailing axis.
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)                      # [T, dim//2]
    cache = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    return cache.astype(dtype)


def rope_for_positions(cache: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Gather per-token rope entries: positions [..., T] -> [..., T, dim//2, 2]."""
    return jnp.take(cache, positions, axis=0)


@partial(jax.jit, static_argnames=("align",))
def apply_rope(x: jnp.ndarray, rope: jnp.ndarray, align: str = "suffix") -> jnp.ndarray:
    """Rotate queries/keys.

    Args:
      x: [B, T, H, D] activations.
      rope: [S, D//2, 2] shared cache or [B, T, D//2, 2] per-sample table
        (already gathered, e.g. for MAE's unmasked-token subset).
      align: when ``rope`` is a shared cache longer than T, take the
        ``"suffix"`` (decode semantics, reference:models/brainformer.py:80) or
        ``"prefix"`` (reference:models/simple_mae:40) of the table.

    Returns: x rotated, same shape/dtype.
    """
    b, t, h, d = x.shape
    if rope.ndim == 3:        # shared [S, d//2, 2]
        rope = rope[-t:] if align == "suffix" else rope[:t]
        rope = rope[None, :, None]           # [1, T, 1, d//2, 2]
    elif rope.ndim == 4:      # per-sample [B, T', d//2, 2]
        rope = rope[:, -t:] if align == "suffix" else rope[:, :t]
        rope = rope[:, :, None]              # [B, T, 1, d//2, 2]
    else:
        raise ValueError(f"rope must be rank 3 or 4, got {rope.ndim}")

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    x_re, x_im = xf[..., 0], xf[..., 1]
    cos, sin = rope[..., 0].astype(jnp.float32), rope[..., 1].astype(jnp.float32)
    # complex multiply (x_re + i x_im) * (cos + i sin)
    out_re = x_re * cos - x_im * sin
    out_im = x_re * sin + x_im * cos
    out = jnp.stack([out_re, out_im], axis=-1).reshape(b, t, h, d)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# folded-layout rope: rotate [B, T, E] without unfolding heads
# ---------------------------------------------------------------------------

def folded_tables(cache: jnp.ndarray, n_heads: int, dtype=jnp.float32):
    """Expand a [S, d//2, 2] cache to interleaved per-lane tables
    (cos_e, sin_e) of shape [S, n_heads*d].

    ``apply_rope`` unfolds activations to [B, T, H, D//2, 2] — whose (16, 2)
    minor dims XLA pads to (16, 128) — and the [B, T, H, D] inputs/outputs
    get (8, 128) tiling on (H=8, D=32), 4x padded memory. Measured at the
    flagship shape that costs ~80 ms of a 517 ms encode. The folded form
    keeps everything on the clean (T, E) layout."""
    cos = jnp.repeat(cache[..., 0], 2, axis=-1)       # [S, d]
    sin = jnp.repeat(cache[..., 1], 2, axis=-1)
    return (jnp.tile(cos, (1, n_heads)).astype(dtype),
            jnp.tile(sin, (1, n_heads)).astype(dtype))


def apply_rope_folded(x: jnp.ndarray, cos_e: jnp.ndarray, sin_e: jnp.ndarray,
                      align: str = "suffix") -> jnp.ndarray:
    """Rotate [B, T, E] activations with folded [S, E] tables.

    Identical math to ``apply_rope`` (pairs are adjacent lanes 2i, 2i+1):
      out[2i]   = x[2i] cos_i - x[2i+1] sin_i
      out[2i+1] = x[2i] sin_i + x[2i+1] cos_i
    The pair swap is two lane rolls + a parity select — elementwise on the
    native layout, no reshape.
    """
    t, e = x.shape[1], x.shape[-1]
    cos_e = (cos_e[-t:] if align == "suffix" else cos_e[:t]).astype(jnp.float32)
    sin_e = (sin_e[-t:] if align == "suffix" else sin_e[:t]).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    even = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) % 2) == 0
    xs = jnp.where(even, jnp.roll(xf, -1, axis=-1), jnp.roll(xf, 1, axis=-1))
    sign = jnp.where(even, -1.0, 1.0)
    out = xf * cos_e[None] + xs * (sign * sin_e[None])
    return out.astype(x.dtype)
