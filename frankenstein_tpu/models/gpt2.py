"""GPT-2 decoder LM with brain-prefix conditioning, TPU-native.

Re-designs reference:models/gpt2_model.py (a nanoGPT fork):
- ``__call__(idx, prefix, targets)`` concatenates soft-prompt ``prefix``
  vectors before the token embeddings, adds learned absolute positions over
  the FULL (prefix+text) length, and computes the shifted CE loss over text
  positions only, ignoring -100 (reference:gpt2_model.py:178-216).
- HF checkpoint import (Conv1D transposes) lives in models/gpt2_import.py.
- Decode uses a fixed-shape KV cache (``init_cache`` / ``prefill`` /
  ``decode_step``) — the reference has NO working cache and re-forwards the
  whole sequence per generated token (reference:gpt2_model.py:328-353).

Weight tying: ``wte`` doubles as the LM head (reference:gpt2_model.py:138).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import GPTConfig, IGNORE_INDEX
from frankenstein_tpu.ops import attention as attn_ops
from frankenstein_tpu.ops import norms


def _dense(feats, use_bias, dtype, name, kernel_init=None):
    return nn.Dense(feats, use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=kernel_init or nn.initializers.normal(0.02),
                    bias_init=nn.initializers.zeros, name=name)


class GPTBlock(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        # special scaled init on residual projections (reference:gpt2_model.py:142-145)
        proj_init = nn.initializers.normal(0.02 / (2 * c.n_layer) ** 0.5)
        self.ln_1 = _LN(c.n_embd, c.bias, name="ln_1")
        self.c_attn = _dense(3 * c.n_embd, c.bias, self.dtype, "c_attn")
        self.attn_proj = _dense(c.n_embd, c.bias, self.dtype, "c_proj", proj_init)
        self.ln_2 = _LN(c.n_embd, c.bias, name="ln_2")
        self.c_fc = _dense(4 * c.n_embd, c.bias, self.dtype, "c_fc")
        self.mlp_proj = _dense(c.n_embd, c.bias, self.dtype, "mlp_c_proj", proj_init)

    def _qkv(self, x):
        c = self.cfg
        b, t, _ = x.shape
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, t, c.n_head, c.head_dim)
        return q.reshape(shape), k.reshape(shape), v.reshape(shape)

    def _mlp(self, x):
        return self.mlp_proj(nn.gelu(self.c_fc(x), approximate=False))

    def __call__(self, x):
        q, k, v = self._qkv(self.ln_1(x))
        y = attn_ops.dot_product_attention(q, k, v, mask_mode="causal")
        y = self.attn_proj(y.reshape(x.shape))
        x = x + y
        return x + self._mlp(self.ln_2(x))

    def cached(self, x, k_cache, v_cache, length):
        """Forward T new positions whose K/V are appended to the cache.

        ``length`` counts entries already present; the new segment is written
        at [length, length+T) and query row i attends j < length + 1 + i
        (its own key included).
        """
        b, t, _ = x.shape
        q, k, v = self._qkv(self.ln_1(x))
        start = length  # scalar int32: entries already in the cache
        k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype),
                                               (0, start, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype),
                                               (0, start, 0, 0))
        y = attn_ops.cached_attention(q, k_cache, v_cache, length + 1)
        y = self.attn_proj(y.reshape(x.shape))
        x = x + y
        return x + self._mlp(self.ln_2(x)), k_cache, v_cache


class _LN(nn.Module):
    dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
             if self.use_bias else None)
        return norms.layer_norm(x, w, b, eps=1e-5)  # GPT-2 eps (reference:gpt2_model.py:27)


class GPT(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (c.vocab_size, c.n_embd), jnp.float32)
        self.wpe = self.param("wpe", nn.initializers.normal(0.02),
                              (c.block_size, c.n_embd), jnp.float32)
        self.h = [GPTBlock(c, dtype=self.dtype, name=f"h_{i}")
                  for i in range(c.n_layer)]
        self.ln_f = _LN(c.n_embd, c.bias, name="ln_f")

    def _lm_head(self, x):
        # tied weights: logits = x @ wte^T (reference:gpt2_model.py:138)
        return jnp.einsum("btd,vd->btv", x, self.wte.astype(x.dtype),
                          preferred_element_type=jnp.float32)

    def _embed(self, idx, prefix):
        tok_emb = jnp.take(self.wte, idx, axis=0).astype(self.dtype)
        if prefix is not None:
            tok_emb = jnp.concatenate([prefix.astype(self.dtype), tok_emb], axis=1)
        t_full = tok_emb.shape[1]
        pos_emb = self.wpe[:t_full].astype(self.dtype)
        return tok_emb + pos_emb[None]

    def __call__(self, idx, prefix=None, targets=None):
        """Full forward. idx: [B, Tw] int32; prefix: [B, Tc, n_embd] or None.

        Returns (loss, logits) with loss=None at inference, logits over text
        positions only (last position only when targets is None), matching
        reference:gpt2_model.py:178-216.
        """
        t_words = idx.shape[1]
        x = self._embed(idx, prefix)
        for block in self.h:
            x = block(x)
        x = x[:, -t_words:]
        x = self.ln_f(x)

        if targets is not None:
            logits = self._lm_head(x)
            loss = cross_entropy_ignore(logits[:, :-1], targets[:, 1:])
            return loss, logits
        logits = self._lm_head(x[:, -1:])
        return None, logits

    # ---------------- KV-cached decode path ----------------

    def prefill(self, idx, prefix, cache):
        """Run the prefix + initial tokens once, filling the cache.

        Returns (logits_last [B, vocab], cache, length).
        """
        ks, vs = cache
        x = self._embed(idx, prefix)
        length = jnp.int32(0)
        new_ks, new_vs = [], []
        for i, block in enumerate(self.h):
            x, k, v = block.cached(x, ks[i], vs[i], length)
            new_ks.append(k)
            new_vs.append(v)
        x = self.ln_f(x[:, -1:])
        logits = self._lm_head(x)[:, 0]
        return logits, (new_ks, new_vs), jnp.int32(x_len(idx, prefix))

    def decode_step(self, token, cache, length):
        """One decode step. token: [B] int32 at absolute position ``length``.

        Returns (logits [B, vocab], cache, length+1).
        """
        ks, vs = cache
        tok_emb = jnp.take(self.wte, token[:, None], axis=0).astype(self.dtype)
        pos_emb = jax.lax.dynamic_slice_in_dim(self.wpe, length, 1).astype(self.dtype)
        x = tok_emb + pos_emb[None]
        new_ks, new_vs = [], []
        for i, block in enumerate(self.h):
            x, k, v = block.cached(x, ks[i], vs[i], length)
            new_ks.append(k)
            new_vs.append(v)
        x = self.ln_f(x)
        logits = self._lm_head(x)[:, 0]
        return logits, (new_ks, new_vs), length + 1


def x_len(idx, prefix):
    return idx.shape[1] + (0 if prefix is None else prefix.shape[1])


def init_cache(cfg: GPTConfig, batch: int, max_len: int, dtype=jnp.float32):
    """Fixed-shape KV cache: ([L] x [B, S, H, D], [L] x [B, S, H, D])."""
    shape = (batch, max_len, cfg.n_head, cfg.head_dim)
    ks = [jnp.zeros(shape, dtype) for _ in range(cfg.n_layer)]
    vs = [jnp.zeros(shape, dtype) for _ in range(cfg.n_layer)]
    return ks, vs


def cross_entropy_ignore(logits, targets, ignore_index: int = IGNORE_INDEX):
    """Mean CE over non-ignored positions (reference:gpt2_model.py:204-210)."""
    vocab = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_targets[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)
