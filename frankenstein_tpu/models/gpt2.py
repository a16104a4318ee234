"""GPT-2 decoder LM with brain-prefix conditioning, TPU-native.

Re-designs reference:models/gpt2_model.py (a nanoGPT fork):
- ``__call__(idx, prefix, targets)`` concatenates soft-prompt ``prefix``
  vectors before the token embeddings, adds learned absolute positions over
  the FULL (prefix+text) length, and computes the shifted CE loss over text
  positions only, ignoring -100 (reference:gpt2_model.py:178-216).
- HF checkpoint import (Conv1D layouts) lives in models/gpt2_import.py.
- Decode uses a fixed-shape KV cache (``init_cache`` / ``prefill`` /
  ``decode_step``) — the reference has NO working cache and re-forwards the
  whole sequence per generated token (reference:gpt2_model.py:328-353).

TPU-first structure: the 12 blocks are ONE ``nn.scan`` over stacked layer
parameters ([L, ...] leading axis) — one traced block instead of 12 unrolled
copies, which keeps compile time and program size flat in depth. Full
training forward and cached decode share the same scanned path: a full
forward is just a prefill whose cache length equals the sequence length
(identical causal math, verified in tests).

Weight tying: ``wte`` doubles as the LM head (reference:gpt2_model.py:138).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import GPTConfig, IGNORE_INDEX
from frankenstein_tpu.ops import attention as attn_ops
from frankenstein_tpu.ops import norms
from frankenstein_tpu.ops.pallas import fused_decode, lm_head_topk


class QuantCache(NamedTuple):
    """int8 KV cache: codes + fixed per-(layer, lane) dequant scales.

    Halves the dominant HBM stream of the fused decode kernel (measured
    0.14 -> 0.10 ms for the per-step K read at the flagship shape on v5e)
    and the cache's memory footprint (2x decode batch headroom). Build with
    ``quantize_cache`` after prefill; indexing [0]/[1] mirrors the float
    (k, v) tuple so shape-probing call sites work on both."""

    k: jnp.ndarray        # [L, B, S, E] int8
    v: jnp.ndarray        # [L, B, S, E] int8
    k_scale: jnp.ndarray  # [L, 1, E] f32
    v_scale: jnp.ndarray  # [L, 1, E] f32


def quantize_cache(cache) -> QuantCache:
    """(k, v) float caches -> QuantCache (symmetric absmax int8)."""
    k8, ks = fused_decode.quantize_cache_side(cache[0])
    v8, vs = fused_decode.quantize_cache_side(cache[1])
    return QuantCache(k8, v8, ks, vs)


def _stack_decode_weights(h_params, cdt):
    """The stacked-[L] dict the fused decode kernel consumes, from the
    ``nn.scan`` block-stack params; matmul kernels cast to the compute
    dtype, LN params stay f32 (the kernel lifts them itself)."""
    e = h_params["ln_1"]["weight"].shape[-1]
    nl = h_params["ln_1"]["weight"].shape[0]
    zeros = lambda d: jnp.zeros((nl, d), cdt)
    w = lambda a: a.astype(cdt)
    return {
        "ln1_w": h_params["ln_1"]["weight"],
        "ln1_b": h_params["ln_1"].get("bias", zeros(e)),
        "qkv_w": w(h_params["c_attn"]["kernel"]),
        "qkv_b": h_params["c_attn"].get("bias", zeros(3 * e)),
        "proj_w": w(h_params["c_proj"]["kernel"]),
        "proj_b": h_params["c_proj"].get("bias", zeros(e)),
        "ln2_w": h_params["ln_2"]["weight"],
        "ln2_b": h_params["ln_2"].get("bias", zeros(e)),
        "fc_w": w(h_params["c_fc"]["kernel"]),
        "fc_b": h_params["c_fc"].get("bias", zeros(4 * e)),
        "fc2_w": w(h_params["mlp_c_proj"]["kernel"]),
        "fc2_b": h_params["mlp_c_proj"].get("bias", zeros(e)),
    }


def quantize_decode_weights(params, dtype=jnp.bfloat16) -> dict:
    """w8a16 serving mode: quantize the block-stack matmul weights to int8
    with per-(layer, out-lane) scales (fused_decode.quantize_weights). Call
    ONCE per decode dispatch — outside the token scan — and hand the result
    to ``decode_step(..., qweights=...)``. Accepts GPT or Franky param
    trees. Only the fused TPU decode path consumes it."""
    p = params.get("params", params)
    if "llm_model" in p:
        p = p["llm_model"]
    return fused_decode.quantize_weights(_stack_decode_weights(p["h"], dtype))


def _dense(feats, use_bias, dtype, name, kernel_init=None):
    return nn.Dense(feats, use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=kernel_init or nn.initializers.normal(0.02),
                    bias_init=nn.initializers.zeros, name=name)


class _LN(nn.Module):
    dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
             if self.use_bias else None)
        return norms.layer_norm(x, w, b, eps=1e-5)  # GPT-2 eps (reference:gpt2_model.py:27)


class GPTBlock(nn.Module):
    """One pre-LN block, written scan-compatible:
    ``(carry, per-layer cache) -> (carry, updated cache)``.

    Dropout mirrors the nanoGPT fork: on the attention probabilities, after
    the attention projection, and after the MLP projection
    (reference:gpt2_model.py:33,40,51,66-71). Active only when
    ``deterministic=False`` (training) and ``cfg.dropout > 0``.

    The carry threads a scalar MoE auxiliary-loss accumulator (always 0.0
    for the dense MLP) so ``nn.scan`` sums the per-layer Switch
    load-balancing losses without a mutable collection."""

    cfg: GPTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, layer_cache, deterministic: bool = True):
        c = self.cfg
        x, length, aux = carry
        k_cache, v_cache = layer_cache
        b, t, _ = x.shape
        dropping = (not deterministic) and c.dropout > 0.0

        proj_init = nn.initializers.normal(0.02 / (2 * c.n_layer) ** 0.5)
        h = _LN(c.n_embd, c.bias, name="ln_1")(x)
        qkv = _dense(3 * c.n_embd, c.bias, self.dtype, "c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        s = k_cache.shape[1]

        # append this segment's K/V at [length, length+t) — heads folded
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, length, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, length, 0))
        head_shape = (b, s, c.n_head, c.head_dim)
        y = attn_ops.cached_attention(
            q.reshape(b, t, c.n_head, c.head_dim),
            k_cache.reshape(head_shape), v_cache.reshape(head_shape),
            length + 1,
            probs_dropout_rate=c.dropout if dropping else 0.0,
            dropout_rng=self.make_rng("dropout") if dropping else None)
        y = _dense(c.n_embd, c.bias, self.dtype, "c_proj", proj_init)(
            y.reshape(b, t, c.n_embd))
        y = nn.Dropout(c.dropout, deterministic=deterministic)(y)
        x = x + y

        h = _LN(c.n_embd, c.bias, name="ln_2")(x)
        if c.moe_experts > 0:
            from frankenstein_tpu.models.moe import MoESwiGLU
            h, aux_l = MoESwiGLU(dim=c.n_embd, hidden_dim=4 * c.n_embd,
                                 n_experts=c.moe_experts, k=c.moe_k,
                                 capacity_factor=c.moe_capacity,
                                 mesh_axis="model", dtype=self.dtype,
                                 name="moe")(h)
            aux = aux + aux_l
        else:
            h = nn.gelu(_dense(4 * c.n_embd, c.bias, self.dtype, "c_fc")(h),
                        approximate=False)
            h = _dense(c.n_embd, c.bias, self.dtype, "mlp_c_proj", proj_init)(h)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        x = x + h
        return (x, length, aux), (k_cache, v_cache)


class GPT(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (c.vocab_size, c.n_embd), jnp.float32)
        self.wpe = self.param("wpe", nn.initializers.normal(0.02),
                              (c.block_size, c.n_embd), jnp.float32)
        self.h = nn.scan(
            GPTBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=c.n_layer,
            in_axes=(0, nn.broadcast), out_axes=0,
        )(c, self.dtype, name="h")
        self.ln_f = _LN(c.n_embd, c.bias, name="ln_f")
        self.drop = nn.Dropout(c.dropout)

    def _lm_head(self, x):
        # tied weights: logits = x @ wte^T (reference:gpt2_model.py:138).
        # The transpose is EXPLICIT so XLA hoists the [V, E] -> [E, V]
        # relayout out of decode loops — contracting wte's minor dim in
        # place measured +0.53 ms per decode step at batch 128 on v5e.
        return jnp.einsum("btd,dv->btv", x,
                          jnp.transpose(self.wte.astype(x.dtype)),
                          preferred_element_type=jnp.float32)

    def _embed(self, idx, prefix, deterministic: bool = True):
        tok_emb = jnp.take(self.wte, idx, axis=0).astype(self.dtype)
        if prefix is not None:
            tok_emb = jnp.concatenate([prefix.astype(self.dtype), tok_emb], axis=1)
        t_full = tok_emb.shape[1]
        pos_emb = self.wpe[:t_full].astype(self.dtype)
        x = tok_emb + pos_emb[None]
        # embedding dropout (reference:gpt2_model.py:61,67)
        return self.drop(x, deterministic=deterministic)

    def _run_blocks(self, x, cache, length, deterministic: bool = True):
        """Returns (x, cache, moe_aux) — moe_aux is the summed per-layer
        Switch balancing loss (0.0 for the dense MLP)."""
        (x, _, aux), cache = self.h((x, length, jnp.float32(0.0)), cache,
                                    deterministic)
        return x, cache, aux

    def __call__(self, idx, prefix=None, targets=None, train: bool = False):
        """Full forward. idx: [B, Tw] int32; prefix: [B, Tc, n_embd] or None.

        Returns (loss, logits) with loss=None at inference, logits over text
        positions only (last position only when targets is None), matching
        reference:gpt2_model.py:178-216. ``train=True`` enables dropout
        (requires a 'dropout' rng when cfg.dropout > 0).
        """
        t_words = idx.shape[1]
        det = not train
        x = self._embed(idx, prefix, deterministic=det)
        cache = init_cache(self.cfg, x.shape[0], x.shape[1], dtype=self.dtype)
        x, _, aux = self._run_blocks(x, cache, jnp.int32(0), deterministic=det)
        x = x[:, -t_words:]
        x = self.ln_f(x)

        if targets is not None:
            logits = self._lm_head(x)
            loss = cross_entropy_ignore(logits[:, :-1], targets[:, 1:])
            if self.cfg.moe_experts > 0:
                loss = loss + self.cfg.moe_aux_weight * aux
            return loss, logits
        logits = self._lm_head(x[:, -1:])
        return None, logits

    # ---------------- KV-cached decode path ----------------

    def prefill(self, idx, prefix, cache):
        """Run the prefix + initial tokens once, filling the cache.

        Returns (logits_last [B, vocab], cache, length). ``cache`` supplies
        the decode-width S and dtype; its contents are ignored.

        TPU shape note: the blocks run against a cache sized to THIS
        segment's t positions, widened to S by one pad at the end — NOT
        against the S-row decode cache. DUS-ing each layer's K/V into the
        wide cache inside the scan made every layer pay a [B, t, E] -> S-row
        pad plus layout-retiling copies of both cache operands, and priced
        attention at S key columns instead of t (optimized-HLO cost model,
        tools/prefill_probe.py: ~0.25 ms/layer of pure data movement at
        b=128, t=33, S=59). With a t-sized cache the per-layer DUS covers
        the whole buffer and XLA elides it."""
        x = self._embed(idx, prefix)
        b, t = x.shape[0], x.shape[1]
        small = init_cache(self.cfg, b, t, dtype=cache[0].dtype)
        x, small, _ = self._run_blocks(x, small, jnp.int32(0))
        x = self.ln_f(x[:, -1:])
        logits = self._lm_head(x)[:, 0]
        s = cache[0].shape[2]
        widen = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, s - t), (0, 0)))
        return (logits, (widen(small[0]), widen(small[1])),
                jnp.int32(x_len(idx, prefix)))

    def _decode_blocks(self, x, cache, length, qweights=None):
        """Run all blocks for ONE position. x: [B, 1, E] -> (x, cache).

        Dispatch: fused Pallas program (TPU, supported geometries) for both
        float and ``QuantCache`` caches; otherwise the scanned XLA path —
        a QuantCache dequantizes around it (old rows round-trip exactly,
        see fused_decode.quantize_with_scales). ``qweights`` (int8 block
        weights from ``quantize_decode_weights``) require the fused path."""
        c = self.cfg
        k_cache = cache[0]
        quant = isinstance(cache, QuantCache)
        if c.moe_experts == 0 and fused_decode.supported(
                c.n_layer, c.n_head, c.head_dim,
                k_cache.shape[1], k_cache.shape[2],
                jnp.dtype(k_cache.dtype).itemsize):
            xo, cache = _fused_blocks(
                c, self.variables["params"]["h"], x[:, 0], cache, length,
                compute_dtype=self.dtype if quant else None,
                stacked=qweights)
            return xo[:, None], cache
        if qweights is not None:
            raise NotImplementedError(
                "int8 decode weights require the fused TPU decode path "
                "(ops/pallas/fused_decode.py); drop qweights off-TPU")
        if quant:
            deq = (fused_decode.dequantize_cache_side(cache.k, cache.k_scale,
                                                      self.dtype),
                   fused_decode.dequantize_cache_side(cache.v, cache.v_scale,
                                                      self.dtype))
            xo, (kf, vf), _ = self._run_blocks(x, deq, length)
            return xo, QuantCache(
                fused_decode.quantize_with_scales(kf, cache.k_scale),
                fused_decode.quantize_with_scales(vf, cache.v_scale),
                cache.k_scale, cache.v_scale)
        xo, cache, _ = self._run_blocks(x, cache, length)
        return xo, cache

    def decode_step(self, token, cache, length, qweights=None):
        """One decode step. token: [B] int32 at absolute position ``length``.

        Returns (logits [B, vocab], cache, length+1). On TPU, supported
        geometries run all blocks in ONE fused Pallas program
        (ops/pallas/fused_decode.py) — the scanned per-layer path is ~6x off
        its HBM roofline at batch 128. ``cache`` may be a ``QuantCache``
        (int8 KV, built by ``quantize_cache`` after prefill); ``qweights``
        an int8 block-weight dict (``quantize_decode_weights``, w8a16)."""
        tok_emb = jnp.take(self.wte, token[:, None], axis=0).astype(self.dtype)
        pos_emb = jax.lax.dynamic_slice_in_dim(self.wpe, length, 1).astype(self.dtype)
        x = tok_emb + pos_emb[None]
        x, cache = self._decode_blocks(x, cache, length, qweights)
        x = self.ln_f(x)
        logits = self._lm_head(x)[:, 0]
        return logits, cache, length + 1

    def lm_head_table(self):
        """The tied LM-head table, pre-transposed to [E, V] in the compute
        dtype. Call ONCE per decode dispatch (outside the token scan) and
        pass to ``decode_step_topk`` — relying on XLA to hoist the 77 MB
        relayout out of the scan body measured +~0.2 ms/step at batch 128."""
        return jnp.transpose(self.wte.astype(self.dtype))

    def decode_step_topk(self, token, cache, length, w_t=None, *, k: int):
        """One decode step returning COMPACT logits: the exact top-k.

        Returns (vals [B, k] f32 desc-sorted, idx [B, k] int32, logz [B] f32
        full-vocab logsumexp, cache, length+1). ``vals - logz`` are exact
        log-probs. On TPU the ln_f + tied lm_head + top-k all run in ONE
        Pallas program (ops/pallas/lm_head_topk.py) — the [B, 50304] f32
        logits tensor never exists. End-to-end this measured a slight LOSS
        vs the dense chain (44.5 vs 43.1 ms/25-token batch at b=128 on v5e;
        the in-kernel iterative top-k costs more than the saved logits
        round-trip), so sampling defaults to the dense path — this contract
        remains for exact top-k log-probs without materializing the vocab.
        Off-TPU falls back to the dense head + approx_max_k."""
        tok_emb = jnp.take(self.wte, token[:, None], axis=0).astype(self.dtype)
        pos_emb = jax.lax.dynamic_slice_in_dim(self.wpe, length, 1).astype(self.dtype)
        x = tok_emb + pos_emb[None]
        c = self.cfg
        x, cache = self._decode_blocks(x, cache, length)
        x = x[:, 0]
        b, e = x.shape
        if lm_head_topk.supported(b, e, c.vocab_size):
            lnf = self.variables["params"]["ln_f"]
            ln_b = lnf.get("bias", jnp.zeros((e,), jnp.float32))
            if w_t is None:
                w_t = self.lm_head_table()
            cv, ci, logz = lm_head_topk.lm_head_topk(
                x, lnf["weight"], ln_b, w_t, k=k)
            vals, pos = jax.lax.top_k(cv, k)
            idx = jnp.take_along_axis(ci, pos, axis=1)
        else:
            logits = self._lm_head(self.ln_f(x[:, None]))[:, 0]
            vals, idx = jax.lax.approx_max_k(logits, k, recall_target=0.99,
                                             aggregate_to_topk=True)
            logz = jax.nn.logsumexp(logits, axis=-1)
        return vals, idx, logz, cache, length + 1

    @staticmethod
    def reorder_cache(cache, flat_idx, group: int = 0):
        """Gather cache rows to new (beam) order; batch is axis 1 ([L, B, ...]).
        QuantCache scales are per-(layer, lane) — no batch axis, no gather.

        ``group > 0`` asserts the beam-search contract that indices never
        cross their ``group``-row sentence block (row g*w + n gathers from
        g*w + p with p < w): qualifying TPU geometries then reorder through
        ONE streaming Pallas pass (ops/pallas/beam_reorder.py) instead of
        XLA's gather + relayout, which measured ~10% of HBM bandwidth and
        72% of the whole width-5 beam step at b=128 (BASELINE.md round 3)."""
        from frankenstein_tpu.ops.pallas import beam_reorder as br
        sides = (cache.k, cache.v) if isinstance(cache, QuantCache) \
            else tuple(cache)
        if group > 0 and all(br.supported(c, group) for c in sides):
            local = flat_idx.astype(jnp.int32) % group
            take = lambda c: br.beam_reorder(c, local, w=group)
        else:
            take = lambda c: jnp.take(c, flat_idx, axis=1)
        if isinstance(cache, QuantCache):
            return QuantCache(take(cache.k), take(cache.v),
                              cache.k_scale, cache.v_scale)
        return jax.tree_util.tree_map(take, cache)


def _fused_blocks(cfg: GPTConfig, h_params, x, cache, length,
                  interpret: bool = False, compute_dtype=None, stacked=None):
    """Run all blocks for one token via the fused kernel.

    x: [B, E]; cache: ([L, B, S, E], ...) or QuantCache; returns
    (x [B, E], cache) with the new K/V rows written at row ``length`` BY THE
    KERNEL ITSELF — the cache outputs alias the inputs (scalar-prefetch
    output index map), so there is no XLA-side scatter at all. The earlier
    dynamic_update_slice design was in-place for the cache but paid two
    layout-retiling copies of the new rows per step (~0.4 ms at b=128;
    tools/chain_attr.py + HLO cost model). QuantCache rows quantize
    in-kernel with the cache's fixed scales. ``h_params`` is the stacked-[L]
    param dict that ``nn.scan`` stores for the block stack; ``stacked``
    overrides it with a prebuilt kernel-weight dict (e.g. int8 w8a16
    weights from ``quantize_decode_weights``)."""
    quant = isinstance(cache, QuantCache)
    k_cache, v_cache = cache[0], cache[1]
    cdt = compute_dtype if compute_dtype is not None else (
        jnp.bfloat16 if quant else k_cache.dtype)
    if stacked is None:
        stacked = _stack_decode_weights(h_params, cdt)
    x, kc, vc = fused_decode.fused_decode_blocks(
        x, stacked, k_cache, v_cache, length,
        cache.k_scale if quant else None, cache.v_scale if quant else None,
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        interpret=interpret)
    if quant:
        return x, QuantCache(kc, vc, cache.k_scale, cache.v_scale)
    return x, (kc, vc)


def x_len(idx, prefix):
    return idx.shape[1] + (0 if prefix is None else prefix.shape[1])


def init_cache(cfg: GPTConfig, batch: int, max_len: int, dtype=jnp.float32):
    """Fixed-shape stacked KV cache: ([L, B, S, E], [L, B, S, E]).

    Heads stay FOLDED in the cache: a [L, B, S, H, D] layout gets XLA's
    (8, 128) tiling on its (H, D) minor dims — 2.7x padded memory at
    H=12, D=64 — and every reshape around the fused decode kernel becomes a
    physical retiling copy of the whole cache (measured ~1 ms/step at
    batch 128). Attention reshapes [B, S, E] -> [B, S, H, D] per use."""
    shape = (cfg.n_layer, batch, max_len, cfg.n_embd)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def cross_entropy_ignore(logits, targets, ignore_index: int = IGNORE_INDEX):
    """Mean CE over non-ignored positions (reference:gpt2_model.py:204-210)."""
    logits = logits.astype(jnp.float32)
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_targets[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)
