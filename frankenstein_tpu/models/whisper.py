"""Whisper-style encoder-decoder for brain-to-text ("fake mel" path).

The reference fine-tunes HF ``whisper-tiny/small.en`` on PCA-reduced,
resampled, zero-padded brain features shaped like an 80x3000 mel spectrogram
(reference:notebooks/whisper_prepare_data.ipynb cell 8,
whisper_hugging_face.ipynb cells 5-27). This is a from-scratch JAX
implementation of that architecture family:

- encoder: conv1d(k3,s1) -> GELU -> conv1d(k3,s2) -> GELU + sinusoidal
  positions -> pre-LN transformer blocks;
- decoder: learned positions, causal self-attention + cross-attention into
  the encoder states, tied embedding head;
- seq2seq CE loss ignoring -100 (the HF collator's padding convention,
  reference:whisper_hugging_face.ipynb cell 8);
- KV-cached greedy/beam decode: self-attention keys cache like GPT, the
  cross-attention K/V are computed once per utterance at prefill.

HF weight import for locally-available Whisper checkpoints lives in
``params_from_hf_whisper``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from frankenstein_tpu.config import IGNORE_INDEX, WhisperConfig
from frankenstein_tpu.models.gpt2 import cross_entropy_ignore
from frankenstein_tpu.ops import attention as attn_ops
from frankenstein_tpu.ops import norms


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0):
    """Whisper's fixed sinusoidal embedding (sin | cos concat)."""
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(t), np.cos(t)], axis=1),
                       jnp.float32)


class _LN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return norms.layer_norm(x, w, b, eps=1e-5)


class _MHA(nn.Module):
    """Whisper attention: q/out have bias, k has none, v has bias."""

    dim: int
    n_head: int
    dtype: Any = jnp.float32

    def setup(self):
        dense = lambda bias, name: nn.Dense(
            self.dim, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        self.q_proj = dense(True, "q_proj")
        self.k_proj = dense(False, "k_proj")
        self.v_proj = dense(True, "v_proj")
        self.out_proj = dense(True, "out_proj")

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.dim // self.n_head)

    def __call__(self, x, context=None, *, causal=False):
        ctx = x if context is None else context
        q = self._split(self.q_proj(x))
        k = self._split(self.k_proj(ctx))
        v = self._split(self.v_proj(ctx))
        out = attn_ops.dot_product_attention(
            q, k, v, mask_mode="causal" if causal else None)
        return self.out_proj(out.reshape(x.shape[0], x.shape[1], self.dim))

    def kv(self, ctx):
        return self._split(self.k_proj(ctx)), self._split(self.v_proj(ctx))

    def cached_self(self, x, k_cache, v_cache, length):
        q = self._split(self.q_proj(x))
        k = self._split(self.k_proj(x))
        v = self._split(self.v_proj(x))
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, length, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, length, 0, 0))
        out = attn_ops.cached_attention(q, k_cache, v_cache, length + 1)
        return (self.out_proj(out.reshape(x.shape[0], x.shape[1], self.dim)),
                k_cache, v_cache)

    def cross_from_kv(self, x, k, v):
        q = self._split(self.q_proj(x))
        out = attn_ops.dot_product_attention(q, k, v)
        return self.out_proj(out.reshape(x.shape[0], x.shape[1], self.dim))


class _MLP(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(nn.gelu(h, approximate=False))


class EncoderBlock(nn.Module):
    dim: int
    n_head: int
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn_layer_norm = _LN(self.dim)
        self.self_attn = _MHA(self.dim, self.n_head, dtype=self.dtype)
        self.final_layer_norm = _LN(self.dim)
        self.mlp = _MLP(self.dim, dtype=self.dtype)

    def __call__(self, x):
        x = x + self.self_attn(self.self_attn_layer_norm(x))
        return x + self.mlp(self.final_layer_norm(x))


class DecoderBlock(nn.Module):
    dim: int
    n_head: int
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn_layer_norm = _LN(self.dim)
        self.self_attn = _MHA(self.dim, self.n_head, dtype=self.dtype)
        self.encoder_attn_layer_norm = _LN(self.dim)
        self.encoder_attn = _MHA(self.dim, self.n_head, dtype=self.dtype)
        self.final_layer_norm = _LN(self.dim)
        self.mlp = _MLP(self.dim, dtype=self.dtype)

    def __call__(self, x, enc):
        x = x + self.self_attn(self.self_attn_layer_norm(x), causal=True)
        x = x + self.encoder_attn(self.encoder_attn_layer_norm(x), enc)
        return x + self.mlp(self.final_layer_norm(x))

    def cached(self, x, enc_k, enc_v, k_cache, v_cache, length):
        h, k_cache, v_cache = self.self_attn.cached_self(
            self.self_attn_layer_norm(x), k_cache, v_cache, length)
        x = x + h
        x = x + self.encoder_attn.cross_from_kv(
            self.encoder_attn_layer_norm(x), enc_k, enc_v)
        return x + self.mlp(self.final_layer_norm(x)), k_cache, v_cache

    def cross_kv(self, enc):
        return self.encoder_attn.kv(enc)


class BrainWhisper(nn.Module):
    """Seq2seq model over [B, n_mels, 3000] inputs (HF channel-first layout)."""

    cfg: WhisperConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.conv1 = nn.Conv(c.n_audio_state, (3,), padding=1,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="conv1")
        self.conv2 = nn.Conv(c.n_audio_state, (3,), strides=(2,), padding=1,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="conv2")
        self.enc_blocks = [EncoderBlock(c.n_audio_state, c.n_audio_head,
                                        dtype=self.dtype, name=f"enc_{i}")
                           for i in range(c.n_audio_layer)]
        self.enc_ln = _LN(c.n_audio_state, name="enc_ln")

        self.embed_tokens = self.param("embed_tokens",
                                       nn.initializers.normal(0.02),
                                       (c.n_vocab, c.n_text_state), jnp.float32)
        self.embed_positions = self.param("embed_positions",
                                          nn.initializers.normal(0.02),
                                          (c.n_text_ctx, c.n_text_state),
                                          jnp.float32)
        self.dec_blocks = [DecoderBlock(c.n_text_state, c.n_text_head,
                                        dtype=self.dtype, name=f"dec_{i}")
                           for i in range(c.n_text_layer)]
        self.dec_ln = _LN(c.n_text_state, name="dec_ln")

    def encode(self, mel):
        """mel: [B, n_mels, T_frames] -> [B, T_frames//2, dim]."""
        x = jnp.transpose(mel, (0, 2, 1)).astype(self.dtype)  # NWC
        x = nn.gelu(self.conv1(x), approximate=False)
        x = nn.gelu(self.conv2(x), approximate=False)
        x = x + sinusoids(x.shape[1], self.cfg.n_audio_state).astype(x.dtype)
        for blk in self.enc_blocks:
            x = blk(x)
        return self.enc_ln(x)

    def decode(self, tokens, enc):
        """tokens: [B, T] -> logits [B, T, vocab]."""
        t = tokens.shape[1]
        x = (jnp.take(self.embed_tokens, tokens, axis=0)
             + self.embed_positions[:t][None]).astype(self.dtype)
        for blk in self.dec_blocks:
            x = blk(x, enc)
        x = self.dec_ln(x)
        return jnp.einsum("btd,dv->btv", x,
                          jnp.transpose(self.embed_tokens.astype(x.dtype)),
                          preferred_element_type=jnp.float32)

    def __call__(self, mel, labels=None, date_info=None,
                 decoder_input_ids=None):
        """Seq2seq training contract: labels with -100 padding; decoder inputs
        are the labels shifted right behind the start token (HF convention)."""
        enc = self.encode(mel)
        if decoder_input_ids is None:
            assert labels is not None
            start = jnp.full((labels.shape[0], 1), self.sot_id(), labels.dtype)
            shifted = jnp.concatenate([start, labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(shifted == IGNORE_INDEX,
                                          self.pad_id(), shifted)
        logits = self.decode(decoder_input_ids, enc)
        if labels is None:
            return None, logits
        loss = cross_entropy_ignore(logits, labels, IGNORE_INDEX)
        return loss, logits

    def sot_id(self):
        """Start-of-transcript id: the real one when imported from an HF
        checkpoint (cfg.decoder_start_token_id), else a top-of-vocab
        placeholder for from-scratch models."""
        c = self.cfg
        return (c.decoder_start_token_id if c.decoder_start_token_id >= 0
                else c.n_vocab - 3)

    def eot_id(self):
        c = self.cfg
        return c.eos_token_id if c.eos_token_id >= 0 else c.n_vocab - 2

    def pad_id(self):
        c = self.cfg
        return c.pad_token if c.pad_token >= 0 else c.n_vocab - 1

    def sot_prompt(self):
        """Full decoder prompt ids: <|startoftranscript|> plus the HF
        forced ids (language/task/notimestamps) when known."""
        return (tuple(self.cfg.sot_sequence) if self.cfg.sot_sequence
                else (self.sot_id(),))

    # ---------------- KV-cached decode ----------------

    reorder_cache = staticmethod(
        lambda cache, flat_idx, group=0: _reorder_whisper_cache(
            cache, flat_idx, group=group))

    def prefill(self, tokens, mel, cache):
        enc = self.encode(mel)
        cross = [blk.cross_kv(enc) for blk in self.dec_blocks]
        t = tokens.shape[1]
        x = (jnp.take(self.embed_tokens, tokens, axis=0)
             + self.embed_positions[:t][None]).astype(self.dtype)
        ks, vs = cache
        new_ks, new_vs = [], []
        for i, blk in enumerate(self.dec_blocks):
            x, k, v = blk.cached(x, cross[i][0], cross[i][1],
                                 ks[i], vs[i], jnp.int32(0))
            new_ks.append(k)
            new_vs.append(v)
        x = self.dec_ln(x[:, -1:])
        logits = jnp.einsum("btd,dv->btv", x,
                            jnp.transpose(self.embed_tokens.astype(x.dtype)),
                            preferred_element_type=jnp.float32)[:, 0]
        return logits, (new_ks, new_vs, cross), jnp.int32(t)

    def decode_step(self, token, cache, length, qweights=None):
        """One cached decoder step. ``qweights`` is accepted for the generic
        beam-scan contract (decode/sampling.py passes it positionally) but
        w8a16 is not plumbed for whisper — the tiny decoder's weights are a
        small fraction of step bytes next to the cross/self caches."""
        assert qweights is None, "w8a16 is not supported on the whisper path"
        ks, vs, cross = cache
        x = (jnp.take(self.embed_tokens, token[:, None], axis=0)
             + jax.lax.dynamic_slice_in_dim(self.embed_positions, length, 1)[None]
             ).astype(self.dtype)
        new_ks, new_vs = [], []
        for i, blk in enumerate(self.dec_blocks):
            x, k, v = blk.cached(x, cross[i][0], cross[i][1],
                                 ks[i], vs[i], length)
            new_ks.append(k)
            new_vs.append(v)
        x = self.dec_ln(x)
        logits = jnp.einsum("btd,dv->btv", x,
                            jnp.transpose(self.embed_tokens.astype(x.dtype)),
                            preferred_element_type=jnp.float32)[:, 0]
        return logits, (new_ks, new_vs, cross), length + 1


def _reorder_whisper_cache(cache, flat_idx, group: int = 0):
    """Beam-parent reorder for the whisper cache (decode/sampling._reorder
    contract): gather the self-attention K/V rows only. The cross K/V —
    the dominant cache bytes (the full encoder sequence per layer) — is
    SKIPPED: beam parents never leave their sentence's w-row group and
    cross rows within a group are identical replicas of one sentence's
    encoding, so any group-local permutation of them is the identity."""
    ks, vs, cross = cache
    take = lambda c: jnp.take(c, flat_idx, axis=0)
    return ([take(k) for k in ks], [take(v) for v in vs], cross)


def init_whisper_cache(cfg: WhisperConfig, batch: int, max_len: int,
                       dtype=jnp.float32):
    shape = (batch, max_len, cfg.n_text_head,
             cfg.n_text_state // cfg.n_text_head)
    ks = [jnp.zeros(shape, dtype) for _ in range(cfg.n_text_layer)]
    vs = [jnp.zeros(shape, dtype) for _ in range(cfg.n_text_layer)]
    return ks, vs


def params_from_hf_whisper(hf_model):
    """Import a transformers.WhisperForConditionalGeneration state dict
    (works offline with a locally cached checkpoint)."""
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in hf_model.state_dict().items()}
    hc = hf_model.config

    def _tok(name):
        v = getattr(hc, name, None)
        return -1 if v is None else int(v)

    # real special tokens + the forced decoder prompt (language/task/
    # notimestamps), from generation_config when present (newer transformers)
    # falling back to the model config
    gen = getattr(hf_model, "generation_config", None)
    forced = (getattr(gen, "forced_decoder_ids", None) if gen is not None
              else None) or getattr(hc, "forced_decoder_ids", None) or []
    sot = _tok("decoder_start_token_id")
    sot_seq = ((sot,) + tuple(int(t) for _, t in sorted(forced))
               if sot >= 0 else ())

    cfg = WhisperConfig(
        n_mels=hc.num_mel_bins, n_audio_ctx=hc.max_source_positions,
        n_audio_state=hc.d_model, n_audio_head=hc.encoder_attention_heads,
        n_audio_layer=hc.encoder_layers, n_vocab=hc.vocab_size,
        n_text_ctx=hc.max_target_positions, n_text_state=hc.d_model,
        n_text_head=hc.decoder_attention_heads, n_text_layer=hc.decoder_layers,
        decoder_start_token_id=sot, eos_token_id=_tok("eos_token_id"),
        pad_token=_tok("pad_token_id"), sot_sequence=sot_seq)

    def t(name):
        return jnp.asarray(sd[name])

    def conv(prefix):
        # torch conv1d weight [out, in, k] -> flax [k, in, out]
        return {"kernel": jnp.asarray(np.transpose(sd[f"{prefix}.weight"],
                                                   (2, 1, 0))),
                "bias": t(f"{prefix}.bias")}

    def dense(prefix, bias=True):
        d = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if bias:
            d["bias"] = t(f"{prefix}.bias")
        return d

    def ln(prefix):
        return {"weight": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def mha(prefix):
        return {"q_proj": dense(f"{prefix}.q_proj"),
                "k_proj": dense(f"{prefix}.k_proj", bias=False),
                "v_proj": dense(f"{prefix}.v_proj"),
                "out_proj": dense(f"{prefix}.out_proj")}

    p = {
        "conv1": conv("model.encoder.conv1"),
        "conv2": conv("model.encoder.conv2"),
        "enc_ln": ln("model.encoder.layer_norm"),
        "embed_tokens": t("model.decoder.embed_tokens.weight"),
        "embed_positions": t("model.decoder.embed_positions.weight"),
        "dec_ln": ln("model.decoder.layer_norm"),
    }
    for i in range(cfg.n_audio_layer):
        e = f"model.encoder.layers.{i}"
        p[f"enc_{i}"] = {
            "self_attn_layer_norm": ln(f"{e}.self_attn_layer_norm"),
            "self_attn": mha(f"{e}.self_attn"),
            "final_layer_norm": ln(f"{e}.final_layer_norm"),
            "mlp": {"fc1": dense(f"{e}.fc1"), "fc2": dense(f"{e}.fc2")},
        }
    for i in range(cfg.n_text_layer):
        d = f"model.decoder.layers.{i}"
        p[f"dec_{i}"] = {
            "self_attn_layer_norm": ln(f"{d}.self_attn_layer_norm"),
            "self_attn": mha(f"{d}.self_attn"),
            "encoder_attn_layer_norm": ln(f"{d}.encoder_attn_layer_norm"),
            "encoder_attn": mha(f"{d}.encoder_attn"),
            "final_layer_norm": ln(f"{d}.final_layer_norm"),
            "mlp": {"fc1": dense(f"{d}.fc1"), "fc2": dense(f"{d}.fc2")},
        }
    return {"params": p}, cfg
