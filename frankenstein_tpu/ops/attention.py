"""Scaled dot-product attention for TPU.

Replaces the reference's ``F.scaled_dot_product_attention`` calls
(reference:models/gpt2_model.py:64, reference:models/brainformer.py:168,215)
with two interchangeable backends:

- ``"xla"``: einsum + fp32 softmax with masks computed on the fly from
  positions (never a stored 6144^2 boolean buffer). XLA fuses the elementwise
  chain into the matmuls.
- ``"pallas"``: a mask-free block-sparse flash kernel for the slab-causal
  structure (see ops/pallas/block_attention.py) that skips future slabs
  entirely and never materializes scores in HBM.

Shapes follow the JAX convention [B, T, H, D] (batch, time, heads, head_dim).
``mask_mode`` selects the structure:
  - None: dense (all-to-all)
  - "causal": suffix-aligned causal (GPT)
  - "slab": block-causal over time slabs of ``tok_per_time`` tokens
An explicit boolean ``mask`` ([B, Tq, Tk] or [Tq, Tk] or [B, 1, Tq, Tk]) can
be combined with any mode (used for padding and MAE token subsets).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from frankenstein_tpu.ops import masks as mask_lib

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _broadcast_mask(mask: jnp.ndarray, b: int, tq: int, tk: int) -> jnp.ndarray:
    """Normalize a user mask to [B, 1, Tq, Tk], slicing suffixes like the
    reference does (``attn_mask[..., -t_q:, -t_k:]``,
    reference:models/brainformer.py:160-162)."""
    if mask.ndim == 2:
        mask = mask[None, None]
    elif mask.ndim == 3:
        mask = mask[:, None]
    mask = mask[..., -tq:, -tk:]
    return mask


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    mask_mode: Optional[str] = None,
    tok_per_time: int = 0,
    positions: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention over [B, T, H, D] tensors. Returns [B, Tq, H, D].

    Softmax statistics are fp32 regardless of input dtype (bf16-safe).
    ``mask_mode="gathered_slab"`` + ``positions`` ([B, T] int32, sorted):
    slab-causality of a gathered token subset computed from original
    positions (the MAE kept-token path) — Pallas kernel when supported,
    else an XLA fallback with an on-the-fly [B, T, T] mask.
    """
    if mask_mode == "gathered_slab":
        assert positions is not None and tok_per_time > 0
        from frankenstein_tpu.ops.pallas import block_attention
        if (impl in ("auto", "pallas") and mask is None
                and q.shape[1] == k.shape[1]
                and block_attention.gathered_supported(
                    q, tok_per_time, interpret=(impl == "pallas"))):
            return block_attention.gathered_slab_attention(
                q, k, v, positions, tok_per_time, interpret=(impl == "pallas"))
        from frankenstein_tpu.ops import masks as _masks
        sub = _masks.block_causal_mask_from_positions(positions, positions,
                                                      tok_per_time)
        combined = sub if mask is None else (
            _broadcast_mask(mask, *q.shape[:2], k.shape[1])[:, 0] & sub)
        return _xla_attention(q, k, v, mask=combined)

    if impl == "auto":
        impl = "xla"
        if mask is None and mask_mode in ("slab", None):
            from frankenstein_tpu.ops.pallas import block_attention
            tile = tok_per_time if mask_mode == "slab" else (
                256 if q.shape[1] % 256 == 0 else 128)
            # dense flash only pays off when XLA would materialize big scores
            big_enough = mask_mode == "slab" or q.shape[1] >= 2048
            if big_enough and block_attention.supported(q, k, tile):
                impl = "pallas"

    if impl == "pallas" and mask is None:
        from frankenstein_tpu.ops.pallas import block_attention
        if mask_mode == "slab":
            return block_attention.slab_causal_attention(q, k, v, tok_per_time)
        if mask_mode is None:
            tile = 256 if q.shape[1] % 256 == 0 else 128
            return block_attention.dense_flash_attention(q, k, v, tile)

    return _xla_attention(q, k, v, mask=mask, mask_mode=mask_mode,
                          tok_per_time=tok_per_time)


def qk_int8_fallback(reason: str) -> None:
    """Signal that qk_int8 was requested but this call computes exact bf16.

    A perf flag must not silently no-op (a benchmark could unknowingly
    measure the bf16 fallback): warns once per call site by default; set
    FK_QK_INT8_STRICT=1 to raise instead. Runs at trace time — the gates
    are static, so a jitted model warns/raises exactly once per compile."""
    import os
    import warnings
    msg = f"qk_int8 requested but computing exact bf16: {reason}"
    if os.environ.get("FK_QK_INT8_STRICT", "0") == "1":
        raise ValueError(msg)
    warnings.warn(msg, stacklevel=3)


def slab_attention_rope_fused(q, k, v, *, n_heads: int, tok_per_time: int,
                              rope_cache, impl: str = "auto",
                              qk_int8: bool = False) -> jnp.ndarray:
    """Slab-causal attention over UNROTATED folded [B, T, E] q/k/v with RoPE
    applied inside the Pallas kernel (suffix-aligned decode semantics).

    On qualifying TPU geometry this skips the ~11-16 ms/layer XLA rope pass
    over the 4x-padded [B, T, H, D] layout AND the head unfold/refold
    transposes (see ops/pallas/block_attention.py rope-fused section);
    otherwise it falls back to the standard apply_rope + dispatch chain.
    Replaces apply_rope + F.scaled_dot_product_attention
    (reference:models/brainformer.py:146-168)."""
    b, t, e = q.shape
    from frankenstein_tpu.ops.pallas import block_attention
    interp = impl == "pallas"
    if (impl in ("auto", "pallas") and rope_cache.ndim == 3
            and rope_cache.shape[0] >= t
            and block_attention.rope_fused_supported(
                b, t, e, n_heads, tok_per_time,
                jnp.dtype(q.dtype).itemsize, interpret=interp)):
        return block_attention.slab_causal_attention_rope(
            q, k, v, tok_per_time, rope_cache, n_heads, interpret=interp,
            qk_int8=qk_int8)
    if qk_int8:
        qk_int8_fallback(
            f"rope-fused gate rejected shape b={b} t={t} e={e} h={n_heads} "
            f"tok_per_time={tok_per_time} impl={impl} "
            f"backend={__import__('jax').default_backend()}")
    from frankenstein_tpu.ops import rope as rope_ops
    d = e // n_heads
    r = lambda x: x.reshape(b, t, n_heads, d)
    qr = rope_ops.apply_rope(r(q), rope_cache)
    kr = rope_ops.apply_rope(r(k), rope_cache)
    out = dot_product_attention(qr, kr, r(v), mask_mode="slab",
                                tok_per_time=tok_per_time,
                                impl="xla" if impl == "pallas" else impl)
    return out.reshape(b, t, e)


def slab_attention_folded(q, k, v, *, n_heads: int, tok_per_time: int,
                          impl: str = "auto") -> jnp.ndarray:
    """Slab-causal attention on FOLDED [B, T, E] tensors -> [B, T, E].

    On TPU-supported geometry this never unfolds heads outside the kernel
    (the [B, T, H, D] convention gets 4x-padded (8, 128) tiling at d=32 —
    see ops/pallas/block_attention.py folded entry); otherwise it reshapes
    and falls back to ``dot_product_attention``."""
    b, t, e = q.shape
    from frankenstein_tpu.ops.pallas import block_attention
    interp = impl == "pallas"
    if impl in ("auto", "pallas") and block_attention.folded_supported(
            b, t, e, n_heads, tok_per_time,
            jnp.dtype(q.dtype).itemsize, interpret=interp):
        return block_attention.slab_causal_attention_folded(
            q, k, v, n_heads, tok_per_time, interpret=interp)
    d = e // n_heads
    r = lambda x: x.reshape(b, t, n_heads, d)
    out = dot_product_attention(r(q), r(k), r(v), mask_mode="slab",
                                tok_per_time=tok_per_time,
                                impl="xla" if impl == "pallas" else impl)
    return out.reshape(b, t, e)


def _xla_attention(q, k, v, *, mask=None, mask_mode=None, tok_per_time=0):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)

    # [B, H, Tq, Tk] in fp32 for stable softmax
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale

    combined = None
    if mask_mode == "causal":
        combined = mask_lib.causal_mask(tq, tk)[None, None]
    elif mask_mode == "slab":
        assert tok_per_time > 0
        # suffix-aligned like the reference's [-tq:, -tk:] slicing
        m = mask_lib.block_causal_mask(tk, tok_per_time)[-tq:, -tk:]
        combined = m[None, None]

    if mask is not None:
        um = _broadcast_mask(mask, b, tq, tk)
        combined = um if combined is None else (combined & um)

    if combined is not None:
        logits = jnp.where(combined, logits, NEG_INF)

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def cached_attention(q, k_cache, v_cache, lengths, *,
                     probs_dropout_rate: float = 0.0,
                     dropout_rng=None) -> jnp.ndarray:
    """Decode/prefill attention against a fixed-shape KV cache.

    q: [B, T, H, D] — T new positions whose keys/values have already been
    written into the cache; k_cache/v_cache: [B, S, H, D]; lengths: [] or [B]
    int32 — the number of valid cache entries visible to query row 0 (i.e.
    prior context + 1 for its own key). Row i sees positions j < lengths + i.

    ``probs_dropout_rate`` applies inverted dropout to the attention
    probabilities (the SDPA ``dropout_p`` of reference:gpt2_model.py:40);
    requires ``dropout_rng`` when nonzero. Training-path only — decode never
    passes it.

    This is the op the reference lacks entirely (its generate() re-forwards
    the whole sequence per token, reference:models/gpt2_model.py:335-339).
    """
    b, t, h, d = q.shape
    s = k_cache.shape[1]
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache,
                        preferred_element_type=jnp.float32) * scale
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t, s), 3)
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t, s), 2)
    valid = kj < qi + jnp.reshape(lengths, (-1, 1, 1, 1))
    logits = jnp.where(valid, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    if probs_dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - probs_dropout_rate,
                                    weights.shape)
        weights = weights * keep / (1.0 - probs_dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v_cache.dtype), v_cache,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
