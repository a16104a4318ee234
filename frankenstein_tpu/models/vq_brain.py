"""VQ-VAE neural tokenizer ("SoundStream") for brain signals.

Re-design of reference:models/vq_brain.py:48-243: causal-conv encoder (4x
temporal downsample), vector quantizer, causal transposed-conv decoder,
pad-masked L1 reconstruction + commitment loss, codebook perplexity.

Differences from the reference, on purpose:
- perplexity is RETURNED in the aux dict (the reference computes and drops
  it, reference:vq_brain.py:212);
- the VQ layer is our own EMA/k-means implementation (ops/vq.py) instead of
  vector_quantize_pytorch.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from frankenstein_tpu.config import VQVAEConfig
from frankenstein_tpu.ops.conv import CausalConv1d, CausalConvTranspose1d
from frankenstein_tpu.ops.vq import VectorQuantize, codebook_perplexity


class ResidualUnit(nn.Module):
    """conv(k3, dilated) -> ELU -> conv(1x1), residual
    (reference:vq_brain.py:48-63)."""

    channels: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = CausalConv1d(self.channels, 3, dilation=self.dilation,
                         dtype=self.dtype)(x)
        h = nn.elu(h)
        h = nn.Conv(self.channels, (1,), dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        return x + h


class EncoderBlock(nn.Module):
    """3x ResidualUnit + strided causal conv (reference:vq_brain.py:66-90)."""

    channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.elu(ResidualUnit(self.channels, dtype=self.dtype)(x))
        return CausalConv1d(self.channels, 2 * self.stride, stride=self.stride,
                            dtype=self.dtype)(x)


class DecoderBlock(nn.Module):
    """transpose conv upsample + 3x ResidualUnit (reference:vq_brain.py:93-117)."""

    channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = CausalConvTranspose1d(self.channels, 2 * self.stride,
                                  stride=self.stride, dtype=self.dtype)(x)
        for _ in range(3):
            x = ResidualUnit(self.channels, dtype=self.dtype)(nn.elu(x))
        return x


class ConvEncoder(nn.Module):
    """[B, T, C_in] -> [B, T/4, D] (reference:vq_brain.py:120-138)."""

    cfg: VQVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.elu(CausalConv1d(c.C, 5, dtype=self.dtype)(x))
        for s in c.strides:
            x = nn.elu(EncoderBlock(c.C, s, dtype=self.dtype)(x))
        return CausalConv1d(c.D, 3, dtype=self.dtype)(x)


class ConvDecoder(nn.Module):
    """[B, T/4, D] -> [B, T, C_out] (reference:vq_brain.py:141-159)."""

    cfg: VQVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.elu(CausalConv1d(c.C, 3, dtype=self.dtype)(x))
        for s in reversed(c.strides):
            x = nn.elu(DecoderBlock(c.C, s, dtype=self.dtype)(x))
        return CausalConv1d(c.n_electrodes, 5, dtype=self.dtype)(x)


def masked_l1_loss(pred, gt):
    """L1 averaged over non-padded timesteps only
    (reference:vq_brain.py:220-227: rows where gt is all-zero are dropped)."""
    real = ~jnp.all(gt == 0, axis=-1)                       # [B, T]
    err = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    per_row = jnp.mean(err, axis=-1)                        # [B, T]
    denom = jnp.maximum(jnp.sum(real), 1)
    return jnp.sum(per_row * real) / denom


class SoundStream(nn.Module):
    """forward(x [B, T, C]) -> (total_loss, recon); aux dict carries
    perplexity/commit (reference:vq_brain.py:162-218)."""

    cfg: VQVAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.cfg, dtype=self.dtype, name="encoder")
        self.quantizer = VectorQuantize(self.cfg, name="quantizer")
        self.decoder = ConvDecoder(self.cfg, dtype=self.dtype, name="decoder")

    def __call__(self, x, targets=None, date_info=None, *, train: bool = False):
        e = self.encoder(x)
        quantized, indices, commit_loss = self.quantizer(e, train=train)
        o = self.decoder(quantized)

        rec_loss = masked_l1_loss(o, x)
        total = rec_loss + commit_loss
        self.sow("aux", "perplexity",
                 codebook_perplexity(indices, self.cfg.codebook_size))
        self.sow("aux", "rec_loss", rec_loss)
        self.sow("aux", "commit_loss", commit_loss)
        return total, o

    def get_quantize_vectors(self, x):
        """Token export for downstream LMs (reference:vq_brain.py:230-235)."""
        e = self.encoder(x)
        quantized, indices, _ = self.quantizer(e, train=False)
        return indices, quantized
