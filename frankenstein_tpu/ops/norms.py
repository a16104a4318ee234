"""Normalization primitives.

Matches the reference's numerics:
- RMSNorm computed in fp32 then cast back (reference:models/brainformer.py:221-232)
- GPT-2 LayerNorm with eps=1e-5 and optional bias (reference:models/gpt2_model.py:18-27)
- encoder LayerNorm is torch default eps=1e-5 (reference:models/brainformer.py:237)

These are plain functions over (x, params) so they can be reused inside
Pallas kernels and flax modules alike; flax module wrappers live in
models/layers.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    normed = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
               eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    out = normed.astype(x.dtype) * weight
    if bias is not None:
        out = out + bias
    return out
