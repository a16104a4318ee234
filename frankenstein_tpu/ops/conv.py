"""Causal 1-D convolutions (flax wrappers over lax conv, NWC layout).

Re-designs reference:models/vq_brain.py:22-45:
- ``CausalConv1d``: left-pad dilation*(k-1) so output[t] sees inputs <= t.
- ``CausalConvTranspose1d``: VALID transpose conv, then trim
  dilation*(k-1) + 1 - stride trailing frames (the reference's
  ``causal_padding``) so length maps T -> T*stride causally.

Everything stays [B, T, C] (time = second dim) — matches both the dataset
layout and XLA's preferred NWC convolution path on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class CausalConv1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel_size - 1)
        return nn.Conv(self.features, (self.kernel_size,),
                       strides=(self.stride,),
                       kernel_dilation=(self.dilation,),
                       padding=[(pad, 0)],
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class CausalConvTranspose1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.features, (self.kernel_size,),
                             strides=(self.stride,), padding="VALID",
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        trim = (self.kernel_size - 1) + 1 - self.stride
        if trim > 0:
            y = y[:, :-trim]
        return y
