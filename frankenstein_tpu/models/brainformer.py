"""BrainFormer family: spatiotemporal encoder, MAE pretrainer, Perceiver
resampler (re-design of reference:models/brainformer.py:271-574).

TPU-first choices:
- patching is a reshape/transpose ('b (t p) c -> b (t c) p',
  reference:brainformer.py:282) — static shapes, fused by XLA;
- the 6144-token slab-causal attention runs on the Pallas flash kernel
  (no materialized mask; reference stores a 6144^2 bool buffer);
- MAE masking uses a FIXED masked count (int(ratio*n) is shape-static) via
  argsort of uniforms — same distribution as the reference's
  ``torch.rand().argsort()`` trick (reference:brainformer.py:380-390);
- the MAE sub-attention mask is arithmetic on kept positions
  (slab(j) <= slab(i)) rather than a gather of the dense matrix
  (reference:brainformer.py:392-413);
- rope tables for kept tokens are gathered rows of the sin/cos cache.

Faithfulness note: the reference's ``kv_cache`` arguments are dead code
(reference:brainformer.py:196,242) and are not reproduced.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import MAEConfig, PerceiverConfig
from frankenstein_tpu.models.layers import Block, CrossBlock, LayerNorm
from frankenstein_tpu.ops import masks as mask_lib
from frankenstein_tpu.ops import rope as rope_ops


def to_patches(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, T, C] -> [B, (T/p * C), p] with token order (time-slab, electrode)
    matching einops 'b (t p1) c -> b (t c) p1' (reference:brainformer.py:282)."""
    b, t, c = x.shape
    x = x.reshape(b, t // patch_size, patch_size, c)      # b, t', p, c
    x = jnp.transpose(x, (0, 1, 3, 2))                    # b, t', c, p
    return x.reshape(b, (t // patch_size) * c, patch_size)


def from_patches(tokens: jnp.ndarray, patch_size: int, n_electrodes: int) -> jnp.ndarray:
    """Inverse: [B, (t c), p] -> [B, (t p), c] (reference:brainformer.py:372)."""
    b, n, p = tokens.shape
    t = n // n_electrodes
    x = tokens.reshape(b, t, n_electrodes, p)
    x = jnp.transpose(x, (0, 1, 3, 2))
    return x.reshape(b, t * p, n_electrodes)


class Encoder(nn.Module):
    """Patch + embed + space embedding + slab-causal transformer
    (reference:models/brainformer.py:271-352)."""

    cfg: MAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.emb = nn.Dense(c.dim, dtype=self.dtype, param_dtype=jnp.float32,
                            name="emb")
        self.space_embedding = self.param(
            "space_embedding", nn.initializers.normal(1.0),
            (1, c.n_electrodes, c.dim), jnp.float32)
        if c.n_sessions:
            self.date_embedding = self.param(
                "date_embedding", nn.initializers.normal(0.02),
                (c.n_sessions, c.dim), jnp.float32)
        self.h = [Block(c.dim, c.n_heads, c.head_dim, c.hidden_dim,
                        norm="layernorm", dtype=self.dtype, name=f"h_{i}")
                  for i in range(c.n_layers)]
        self.ln_f = LayerNorm(c.dim, name="ln_f")

    def spatial_pos_embedding(self):
        """[1, block_size, dim]: the per-electrode embedding tiled over time
        slabs (reference:brainformer.py:320-327)."""
        c = self.cfg
        return jnp.tile(self.space_embedding, (1, c.n_patches_per_channel, 1))

    def embed_tokens(self, patches, positions=None, date_info=None):
        x = self.emb(patches)
        space = self.spatial_pos_embedding().astype(x.dtype)
        if positions is None:
            x = x + space[:, -x.shape[1]:]
        else:
            x = x + jnp.take(space[0], positions, axis=0)
        if self.cfg.n_sessions and date_info is not None:
            date = jnp.take(self.date_embedding,
                            jnp.asarray(date_info) % self.cfg.n_sessions,
                            axis=0).astype(x.dtype)
            x = x + date[:, None, :]
        return x

    def __call__(self, x, date_info=None):
        """x: [B, T, C] signal -> [B, n_tokens, dim] context."""
        c = self.cfg
        patches = to_patches(x, c.patch_size)
        tok = self.embed_tokens(patches, date_info=date_info)
        rope = rope_ops.build_rope_cache(c.head_dim, c.block_size, c.rope_theta)
        impl = "auto"
        if c.seq_parallel:
            from frankenstein_tpu.parallel import ring_attention as ra
            if ra.ambient_seq_mesh() is not None:
                impl = "ring"   # sequence-parallel slab attention over ICI
        for block in self.h:
            tok = block(tok, mask_mode="slab", tok_per_time=c.n_electrodes,
                        rope=rope, impl=impl, qk_int8=c.qk_int8)
        return self.ln_f(tok)

    def forward_subset(self, patches, positions, rope_cache, date_info=None):
        """Encode only kept tokens (MAE path). positions: [B, N] int32,
        sorted ascending (MAE keeps ``jnp.sort``-ed indices).

        Attention runs in ``gathered_slab`` mode: the Pallas kernel computes
        the slab mask from position tiles in VMEM when supported, else the
        XLA path builds the [B, N, N] mask on the fly — either way no
        materialized T^2 matrix is gathered
        (reference:models/brainformer.py:392-413 gathers one)."""
        c = self.cfg
        tok = self.embed_tokens(patches, positions, date_info=date_info)
        rope = rope_ops.rope_for_positions(rope_cache, positions)
        for block in self.h:
            tok = block(tok, mask_mode="gathered_slab", positions=positions,
                        tok_per_time=c.n_electrodes, rope=rope)
        return self.ln_f(tok)


def masking_indices(rng, batch: int, n_tokens: int, masking_ratio: float):
    """Sorted (masked, unmasked) index sets, fixed sizes
    (reference:brainformer.py:380-390)."""
    num_masked = int(masking_ratio * n_tokens)
    perm = jnp.argsort(jax.random.uniform(rng, (batch, n_tokens)), axis=-1)
    masked = jnp.sort(perm[:, :num_masked], axis=-1)
    unmasked = jnp.sort(perm[:, num_masked:], axis=-1)
    return masked, unmasked


class MAE(nn.Module):
    """Masked-autoencoder pretrainer (reference:models/brainformer.py:354-486)."""

    cfg: MAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c, dtype=self.dtype, name="encoder")
        self.dec_h = [Block(c.decoder_dim, c.n_heads, c.head_dim, c.hidden_dim,
                            norm="layernorm", dtype=self.dtype, name=f"dec_h_{i}")
                      for i in range(c.n_dec_layers)]
        self.mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                     (c.decoder_dim,), jnp.float32)
        self.decoder_pos_emb = nn.Embed(c.block_size, c.decoder_dim,
                                        param_dtype=jnp.float32,
                                        name="decoder_pos_emb")
        self.to_signals = nn.Dense(c.patch_size, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="to_signals")

    def __call__(self, x, targets=None, date_info=None, *, rng=None,
                 masking_ratio: Optional[float] = None, return_preds: bool = False):
        """x: [B, T, C]. Returns (recon_loss, None) or with predictions.

        ``rng``: explicit mask randomness (pass model.make_rng compatible key).
        """
        c = self.cfg
        if masking_ratio is None:
            masking_ratio = c.masking_ratio
        if rng is None:
            rng = self.make_rng("mask")

        patches = to_patches(x, c.patch_size)            # [B, N, p]
        b, n_tokens, _ = patches.shape

        masked_idx, unmasked_idx = masking_indices(rng, b, n_tokens, masking_ratio)
        take = lambda arr, idx: jnp.take_along_axis(
            arr, idx[..., None], axis=1)

        rope_cache = rope_ops.build_rope_cache(c.head_dim, c.block_size,
                                               c.rope_theta)

        # ENCODER on kept tokens only (25% of 6144)
        kept_patches = take(patches, unmasked_idx)
        encoded = self.encoder.forward_subset(kept_patches, unmasked_idx,
                                              rope_cache, date_info=date_info)

        # DECODER: scatter encoded into full sequence, mask token elsewhere
        dec = jnp.broadcast_to(self.mask_token.astype(encoded.dtype),
                               (b, n_tokens, c.decoder_dim))
        batch_idx = jnp.arange(b)[:, None]
        dec = dec.at[batch_idx, unmasked_idx].set(encoded)
        # Learned absolute position embedding in natural token order.
        # (Faithfulness caveat: the reference adds pos-emb rows ordered
        # cat([unmasked, masked]) onto position-ordered tokens
        # (reference:brainformer.py:459-460) — a permutation mismatch; we
        # implement the intended alignment.)
        dec = dec + self.decoder_pos_emb(
            jnp.arange(n_tokens)[None]).astype(dec.dtype)

        for block in self.dec_h:
            dec = block(dec)  # dense attention (reference decoder has no mask)

        # LOSS on masked patches only (reference:brainformer.py:465-473)
        pred_masked = self.to_signals(take(dec, masked_idx))
        true_masked = take(patches, masked_idx)
        recon_loss = jnp.mean(jnp.square(pred_masked.astype(jnp.float32)
                                         - true_masked.astype(jnp.float32)))

        if return_preds:
            binary = jnp.zeros_like(patches).at[batch_idx, masked_idx].set(1.0)
            recon = patches.at[batch_idx, masked_idx].set(
                pred_masked.astype(patches.dtype))
            return (recon_loss,
                    from_patches(recon, c.patch_size, c.n_electrodes),
                    from_patches(binary, c.patch_size, c.n_electrodes))
        return recon_loss, None


class BrainEncoder(nn.Module):
    """Encoder + Perceiver resampler -> n_output_tokens vectors of output_dim.

    Named ``BrainFormer``/``BrainEncoder`` in the reference
    (reference:models/brainformer.py:488-558 and
    notebooks_trainer/franky_baseline_gpt2.ipynb cell 3); the output head is
    ``to_out`` (ref: ``to_motion``/``to_words`` depending on variant).
    """

    cfg: PerceiverConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c.encoder, dtype=self.dtype, name="encoder")
        self.learnable_queries = self.param(
            "learnable_queries", nn.initializers.zeros,
            (1, c.n_output_tokens, c.dim), jnp.float32)
        self.h = [CrossBlock(c.dim, c.n_heads, c.head_dim, c.hidden_dim,
                             dtype=self.dtype, name=f"cross_{i}")
                  for i in range(c.n_layers)]
        self.ln_f = LayerNorm(c.dim, name="ln_f")
        self.to_out = nn.Dense(c.output_dim, dtype=self.dtype,
                               param_dtype=jnp.float32, name="to_out")

    def __call__(self, x, date_info=None):
        """x: [B, T, C] -> [B, n_output_tokens, output_dim]."""
        c = self.cfg
        context = self.encoder(x, date_info=date_info)
        b = x.shape[0]
        q = jnp.broadcast_to(self.learnable_queries.astype(self.dtype),
                             (b, c.n_output_tokens, c.dim))
        rope = rope_ops.build_rope_cache(c.head_dim, c.n_output_tokens,
                                         c.rope_theta)
        for block in self.h:
            q = block(q, context, sa_rope=rope)
        return self.to_out(self.ln_f(q))


class BrainFormer(nn.Module):
    """BrainEncoder with an L1 regression loss head
    (reference:models/brainformer.py:532-558)."""

    cfg: PerceiverConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, targets=None, date_info=None):
        pred = BrainEncoder(self.cfg, dtype=self.dtype,
                            name="brain")(x, date_info=date_info)
        if targets is None:
            return None, pred
        loss = jnp.mean(jnp.abs(pred.astype(jnp.float32)
                                - targets.astype(jnp.float32)))
        return loss, pred
