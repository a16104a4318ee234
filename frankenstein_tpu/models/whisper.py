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

from typing import Any, NamedTuple, Optional

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

    def cached_self(self, x, k_cache, v_cache, length, k_scale=None,
                    v_scale=None):
        """Cached self-attention step. int8 caches (``k_scale/v_scale``
        [1, 1, H, D] f32 given): the new rows REQUANTIZE with the fixed
        per-(head, dim) scales before the in-place write — old codes are
        untouched, so repeated steps only round the new row (the
        fused_decode.quantize_with_scales contract) — and attention runs
        on the dequantized view."""
        q = self._split(self.q_proj(x))
        k = self._split(self.k_proj(x))
        v = self._split(self.v_proj(x))
        if k_scale is not None:
            q8 = lambda r, s: jnp.clip(
                jnp.round(r.astype(jnp.float32) / s), -127, 127
                ).astype(jnp.int8)
            # attention sees the FLOAT new row (the GPT-kernel own-token
            # convention — the row only rounds for steps that READ it
            # later); the cache stores the codes
            kf = jax.lax.dynamic_update_slice(
                k_cache.astype(q.dtype) * k_scale.astype(q.dtype),
                k.astype(q.dtype), (0, length, 0, 0))
            vf = jax.lax.dynamic_update_slice(
                v_cache.astype(q.dtype) * v_scale.astype(q.dtype),
                v.astype(q.dtype), (0, length, 0, 0))
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, q8(k, k_scale), (0, length, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, q8(v, v_scale), (0, length, 0, 0))
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype), (0, length, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype), (0, length, 0, 0))
            kf, vf = k_cache, v_cache
        out = attn_ops.cached_attention(q, kf, vf, length + 1)
        return (self.out_proj(out.reshape(x.shape[0], x.shape[1], self.dim)),
                k_cache, v_cache)

    def cross_from_kv(self, x, k, v):
        """Cross attention against precomputed K/V. When x carries MORE
        batch rows than k/v (beam decode over an UNREPLICATED cross cache —
        see ``BrainWhisper.expand_cache``), the W beams of each sentence
        fold into the query-time axis: cross attention has no mask and no
        position dependence, so q rows of one group attending one shared
        encoding as [B, W, H, D] is the replicated computation re-batched,
        not an approximation — and the cross K/V stream (the dominant
        decode-step bytes: ~1.18 GB/step replicated at whisper-tiny b=32
        w=5) shrinks W-fold."""
        q = self._split(self.q_proj(x))
        bw, t = x.shape[0], x.shape[1]
        b = k.shape[0]
        if bw != b:
            w = bw // b
            assert t == 1 and b * w == bw, (bw, b, t)
            q = q.reshape(b, w, self.n_head, self.dim // self.n_head)
            out = attn_ops.dot_product_attention(q, k, v)   # [B, W, H, D]
            return self.out_proj(out.reshape(bw, 1, self.dim))
        out = attn_ops.dot_product_attention(q, k, v)
        return self.out_proj(out.reshape(bw, t, self.dim))


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

    def cached(self, x, enc_k, enc_v, k_cache, v_cache, length,
               k_scale=None, v_scale=None):
        h, k_cache, v_cache = self.self_attn.cached_self(
            self.self_attn_layer_norm(x), k_cache, v_cache, length,
            k_scale, v_scale)
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
        """One cached decoder step. ``cache`` is the float (ks, vs, cross)
        tuple from ``prefill`` or a ``WhisperQuantCache`` (int8 self-KV and
        optionally int8 cross-KV, built by ``quantize_whisper_cache``);
        either may carry the cross K/V at batch B while tokens run at B*W
        beam rows (``expand_cache``) — the grouped cross attention reads
        the unreplicated tensors.

        ``qweights`` is accepted for the generic beam-scan contract
        (decode/sampling.py passes it positionally) but w8a16 is not
        plumbed for whisper: at whisper-tiny geometry the decoder matmul
        weights are ~14 MB/step — ~4% of the beam step's HBM bytes next to
        the cross (~236 MB at b=32 w=5 even after the W-fold replica skip)
        and self-KV streams, so the w8a16 lever the GPT/LLaMA kernels pull
        does not exist on this path; int8 KV (the dominant streams) is the
        supported quantization."""
        if qweights is not None:
            raise NotImplementedError(
                "w8a16 is not supported on the whisper path (decoder "
                "weights are ~4% of step bytes; use "
                "quantize_whisper_cache for int8 KV instead)")
        quant = isinstance(cache, WhisperQuantCache)
        ks, vs, cross = cache[0], cache[1], cache[2]
        x = (jnp.take(self.embed_tokens, token[:, None], axis=0)
             + jax.lax.dynamic_slice_in_dim(self.embed_positions, length, 1)[None]
             ).astype(self.dtype)
        new_ks, new_vs = [], []
        for i, blk in enumerate(self.dec_blocks):
            ck, cv = cross[i]
            if quant and cache.cross_scales:
                sk, sv = cache.cross_scales[i]
                ck = ck.astype(self.dtype) * sk.astype(self.dtype)
                cv = cv.astype(self.dtype) * sv.astype(self.dtype)
            x, k, v = blk.cached(
                x, ck, cv, ks[i], vs[i], length,
                *( (cache.k_scales[i], cache.v_scales[i]) if quant
                   else (None, None) ))
            new_ks.append(k)
            new_vs.append(v)
        x = self.dec_ln(x)
        logits = jnp.einsum("btd,dv->btv", x,
                            jnp.transpose(self.embed_tokens.astype(x.dtype)),
                            preferred_element_type=jnp.float32)[:, 0]
        new_cache = (cache._replace(ks=tuple(new_ks), vs=tuple(new_vs))
                     if quant else (new_ks, new_vs, cross))
        return logits, new_cache, length + 1

    @staticmethod
    def expand_cache(cache, w: int):
        """Replicate a batch-B prefilled decode state to B*W beam rows
        (decode/sampling._beam_expand hook) — but NOT the cross K/V: rows
        within a beam group would be identical replicas of one sentence's
        encoding (the same fact reorder_cache exploits to skip the cross
        gather), and ``cross_from_kv`` attends the W beams against the
        shared [B, ...] tensors directly. The cross stream is the dominant
        decode-step bytes (~1.18 GB/step replicated at whisper-tiny b=32
        w=5), so keeping it unreplicated cuts it W-fold."""
        rep = lambda c: jnp.repeat(c, w, axis=0)
        if isinstance(cache, WhisperQuantCache):
            return cache._replace(ks=tuple(rep(k) for k in cache.ks),
                                  vs=tuple(rep(v) for v in cache.vs))
        ks, vs, cross = cache
        return ([rep(k) for k in ks], [rep(v) for v in vs], cross)


def _reorder_whisper_cache(cache, flat_idx, group: int = 0):
    """Beam-parent reorder for the whisper cache (decode/sampling._reorder
    contract): gather the self-attention K/V rows only. The cross K/V —
    the dominant cache bytes (the full encoder sequence per layer) — is
    SKIPPED: beam parents never leave their sentence's w-row group and
    cross rows within a group are identical replicas of one sentence's
    encoding (or, after ``expand_cache``, ONE unreplicated row per
    sentence), so any group-local permutation of them is the identity.
    int8 codes (WhisperQuantCache) gather like any dtype; the fixed scales
    carry no batch axis."""
    if isinstance(cache, WhisperQuantCache):
        take = lambda c: jnp.take(c, flat_idx, axis=0)
        return cache._replace(ks=tuple(take(k) for k in cache.ks),
                              vs=tuple(take(v) for v in cache.vs))
    ks, vs, cross = cache
    take = lambda c: jnp.take(c, flat_idx, axis=0)
    return ([take(k) for k in ks], [take(v) for v in vs], cross)


class WhisperQuantCache(NamedTuple):
    """int8 whisper decode state: self-KV codes (+ optionally cross-KV
    codes) with fixed per-(layer, head, dim) dequant scales. Indices
    [0]/[1]/[2] mirror the float (ks, vs, cross) tuple so shape-probing
    call sites work on both. Build with ``quantize_whisper_cache`` after
    prefill; the scales are frozen for the whole decode (new rows
    requantize with them — old codes round-trip exactly)."""

    ks: tuple            # per-layer [B*W, S, H, D] int8
    vs: tuple
    cross: tuple         # per-layer (k, v) — int8 codes when quantized
    k_scales: tuple      # per-layer [1, 1, H, D] f32
    v_scales: tuple
    cross_scales: tuple  # per-layer (sk, sv) when cross is int8, else ()


def quantize_whisper_cache(cache, quant_cross: bool = True):
    """(ks, vs, cross) float prefill state -> WhisperQuantCache.

    Symmetric absmax int8 over (batch, position) per (head, dim) channel —
    the whisper twin of gpt2.quantize_cache. ``quant_cross=True`` also
    quantizes the cross K/V (read-only; at whisper-tiny b=32 w=5 it is
    still the dominant stream even after the expand_cache replica skip,
    so halving it matters more than halving the self-KV); accuracy is
    tolerance-tested in tests/test_whisper.py."""
    def q_side(c):
        cf = c.astype(jnp.float32)
        s = (jnp.maximum(jnp.max(jnp.abs(cf), axis=(0, 1)), 1e-6)
             / 127.0)[None, None]                       # [1, 1, H, D]
        codes = jnp.clip(jnp.round(cf / s), -127, 127).astype(jnp.int8)
        return codes, s

    ks, vs, cross = cache
    k8, ksc = zip(*(q_side(k) for k in ks))
    v8, vsc = zip(*(q_side(v) for v in vs))
    if quant_cross:
        cq = [(q_side(ck), q_side(cv)) for ck, cv in cross]
        cross8 = tuple((ck8, cv8) for (ck8, _), (cv8, _) in cq)
        csc = tuple((sk, sv) for (_, sk), (_, sv) in cq)
    else:
        cross8, csc = tuple(cross), ()
    return WhisperQuantCache(tuple(k8), tuple(v8), cross8,
                             tuple(ksc), tuple(vsc), csc)


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
