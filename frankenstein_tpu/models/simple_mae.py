"""SimpleMAE: masked autoencoder over whole-timestep tokens.

Re-design of reference:models/simple_mae:240-407 (the standalone variant with
RMSNorm blocks, prefix-aligned RoPE, and a padding-aware masked-MSE loss).
Tokens are raw timesteps: x [B, T, C] where C == patch_size (all channels of
one time bin); there is no causality — attention is dense over non-padded
tokens (reference:simple_mae:349-351).

Faithfulness caveat handled intentionally: as in models/brainformer.py, the
decoder position embedding is added in natural token order (the reference
permutes rows, reference:simple_mae:375-376).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import SimpleEncoderConfig, SimpleMAEConfig
from frankenstein_tpu.models.brainformer import masking_indices
from frankenstein_tpu.models.layers import Block, LayerNorm
from frankenstein_tpu.ops import masks as mask_lib
from frankenstein_tpu.ops import rope as rope_ops


class SimpleEncoder(nn.Module):
    """Linear embed + RMSNorm blocks + final LayerNorm
    (reference:models/simple_mae:240-297)."""

    cfg: SimpleEncoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.emb = nn.Dense(c.dim, dtype=self.dtype, param_dtype=jnp.float32,
                            name="emb")
        self.h = [Block(c.dim, c.n_heads, c.head_dim, c.hidden_dim,
                        norm="rmsnorm", dtype=self.dtype,
                        rope_align="prefix", name=f"h_{i}")
                  for i in range(c.n_layers)]
        self.ln_f = LayerNorm(c.dim, name="ln_f")

    def __call__(self, x, *, mask=None, rope=None):
        c = self.cfg
        if rope is None:
            rope = rope_ops.build_rope_cache(c.head_dim, c.block_size,
                                             c.rope_theta)
        x = self.emb(x)
        for block in self.h:
            x = block(x, mask=mask, rope=rope)
        return self.ln_f(x)


class SimpleMAE(nn.Module):
    """(recon_loss, None) or (loss, reconstruction, binary_mask)
    (reference:models/simple_mae:301-407)."""

    enc_cfg: SimpleEncoderConfig
    dec_cfg: SimpleMAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        ec, dc = self.enc_cfg, self.dec_cfg
        self.encoder = SimpleEncoder(ec, dtype=self.dtype, name="encoder")
        self.dec_emb = nn.Dense(dc.dim, dtype=self.dtype,
                                param_dtype=jnp.float32, name="dec_emb")
        self.dec_h = [Block(dc.dim, dc.n_heads, dc.head_dim, dc.hidden_dim,
                            norm="rmsnorm", dtype=self.dtype,
                            rope_align="prefix", name=f"dec_h_{i}")
                      for i in range(dc.n_layers)]
        self.mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                     (dc.dim,), jnp.float32)
        self.decoder_pos_emb = nn.Embed(ec.block_size, dc.dim,
                                        param_dtype=jnp.float32,
                                        name="decoder_pos_emb")
        self.to_signals = nn.Dense(ec.patch_size, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="to_signals")

    def __call__(self, x, targets=None, date_info=None, *, rng=None,
                 masking_ratio=None, return_preds: bool = False):
        ec, dc = self.enc_cfg, self.dec_cfg
        if masking_ratio is None:
            masking_ratio = dc.masking_ratio
        if rng is None:
            rng = self.make_rng("mask")

        b, t, c = x.shape
        masked_idx, unmasked_idx = masking_indices(rng, b, t, masking_ratio)
        take = lambda arr, idx: jnp.take_along_axis(arr, idx[..., None], axis=1)

        # padding: a timestep is padded iff all channels are zero
        valid = mask_lib.padding_mask(x)                        # [B, T]
        pair = mask_lib.self_attention_padding_mask(valid)      # [B, T, T]
        take_v = lambda v, idx: jnp.take_along_axis(v, idx, axis=1)
        kept_valid = take_v(valid, unmasked_idx)
        kept_pair = kept_valid[:, :, None] & kept_valid[:, None, :]

        rope_cache = rope_ops.build_rope_cache(ec.head_dim, ec.block_size,
                                               ec.rope_theta)
        kept_rope = rope_ops.rope_for_positions(rope_cache, unmasked_idx)

        # ENCODER on kept tokens
        tokens = self.encoder(take(x, unmasked_idx), mask=kept_pair,
                              rope=kept_rope)

        # DECODER over all tokens
        dec = jnp.broadcast_to(self.mask_token.astype(tokens.dtype),
                               (b, t, dc.dim))
        batch_idx = jnp.arange(b)[:, None]
        dec = dec.at[batch_idx, unmasked_idx].set(self.dec_emb(tokens))
        dec = dec + self.decoder_pos_emb(jnp.arange(t)[None]).astype(dec.dtype)
        for block in self.dec_h:
            dec = block(dec, mask=pair)
        pred = self.to_signals(dec)                             # [B, T, patch]

        # LOSS on masked AND non-padded tokens (reference:simple_mae:386-395)
        pred_masked = take(pred, masked_idx)
        true_masked = take(x, masked_idx)
        mask_valid = take_v(valid, masked_idx)                  # [B, Nm]
        err = jnp.mean(jnp.square(pred_masked.astype(jnp.float32)
                                  - true_masked.astype(jnp.float32)), axis=-1)
        denom = jnp.maximum(jnp.sum(mask_valid), 1)
        recon_loss = jnp.sum(err * mask_valid) / denom

        if return_preds:
            binary = jnp.zeros_like(x).at[batch_idx, masked_idx].set(1.0)
            recon = x.at[batch_idx, masked_idx].set(
                pred_masked.astype(x.dtype))
            return recon_loss, recon, binary
        return recon_loss, None
