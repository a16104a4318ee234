"""LLaMA-family decoder LM: the north-star rescoring stage.

The reference's roadmap is ``VQVAE -> MAE -> Perceiver -> LLAMA 3``
(reference:README.md:19) but the LLaMA stage exists only as intent. This
module implements it TPU-first:

- standard LLaMA architecture (RMSNorm pre-norm, rotary GQA attention,
  SwiGLU, tied-or-untied head), one ``nn.scan`` over stacked layers;
- brain-prefix conditioning exactly like the GPT-2 path (soft prompt
  vectors prepended to the token embeddings);
- n-best RESCORING: score beam candidates under the LM and combine with the
  decoder scores (``rescore_candidates``);
- tensor parallelism via sharding RULES (parallel/sharding.py): column-split
  q/k/v/gate/up projections, row-split o/down projections over the 'model'
  mesh axis — XLA inserts the all-reduces over ICI;
- HF ``LlamaForCausalLM`` import from a locally available state dict.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import _SerializableMixin, IGNORE_INDEX
from frankenstein_tpu.models.gpt2 import cross_entropy_ignore
from frankenstein_tpu.ops import attention as attn_ops
from frankenstein_tpu.ops import norms, rope as rope_ops
from frankenstein_tpu.ops.pallas import fused_llama_decode


def _stack_llama_decode_weights(layer_params, cdt):
    """The stacked-[L] dict the fused LLaMA decode kernel consumes, from the
    ``nn.scan`` layer-stack params; matmul kernels cast to the compute
    dtype, RMSNorm weights stay f32 (the kernel lifts them itself)."""
    w = lambda name: layer_params[name]["kernel"].astype(cdt)
    return {
        "norm1_w": layer_params["input_norm"]["weight"],
        "wq": w("q_proj"), "wk": w("k_proj"), "wv": w("v_proj"),
        "wo": w("o_proj"),
        "norm2_w": layer_params["post_attn_norm"]["weight"],
        "wg": w("gate_proj"), "wu": w("up_proj"), "wd": w("down_proj"),
    }


def quantize_decode_weights(params, dtype=jnp.bfloat16) -> dict:
    """w8a16 serving mode for the LLaMA decode path: quantize the block
    matmul weights to int8 with per-(layer, out-lane) scales
    (fused_llama_decode.quantize_weights). Call ONCE per decode dispatch —
    outside the token scan — and hand the result to
    ``decode_step(..., qweights=...)``. Accepts Llama or FrankyLlama param
    trees. Only the fused TPU decode path consumes it."""
    p = params.get("params", params)
    if "llm_model" in p:
        p = p["llm_model"]
    return fused_llama_decode.quantize_weights(
        _stack_llama_decode_weights(p["layers"], dtype))


@dataclass(frozen=True)
class LlamaConfig(_SerializableMixin):
    vocab_size: int = 128256        # llama-3 defaults
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    hidden_dim: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 8192
    tie_embeddings: bool = False

    # Mixture-of-Experts MLP (models/moe.py): 0 keeps the dense SwiGLU; >0
    # swaps every block's MLP for a top-moe_k-routed MoESwiGLU with experts
    # sharded over the 'model' mesh axis (MOE_EP_RULES). The Switch
    # balancing loss joins the LM loss with weight moe_aux_weight.
    moe_experts: int = 0
    moe_k: int = 2
    moe_capacity: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


def tiny_llama_config(**kw) -> LlamaConfig:
    base = dict(vocab_size=128, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                hidden_dim=64, max_seq_len=64)
    base.update(kw)
    return LlamaConfig(**base)


class _RMS(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        return norms.rms_norm(x, w, self.eps)


class LlamaBlock(nn.Module):
    """Scan-compatible: (carry=(x, length, rope), layer_cache) -> same."""

    cfg: LlamaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, layer_cache):
        c = self.cfg
        x, length, aux = carry
        k_cache, v_cache = layer_cache
        b, t, _ = x.shape
        hd, nh, nkv = c.head_dim, c.n_heads, c.n_kv_heads
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02), name=name)

        h = _RMS(c.dim, c.norm_eps, name="input_norm")(x)
        q = dense(nh * hd, "q_proj")(h).reshape(b, t, nh, hd)
        k = dense(nkv * hd, "k_proj")(h).reshape(b, t, nkv, hd)
        v = dense(nkv * hd, "v_proj")(h).reshape(b, t, nkv, hd)

        # rotary at absolute positions [length, length+t)
        cache_len = k_cache.shape[1]
        rope_table = rope_ops.build_rope_cache(hd, cache_len, c.rope_theta)
        pos = length + jnp.arange(t)
        rope = rope_ops.rope_for_positions(rope_table, pos[None])
        q = rope_ops.apply_rope(q, jnp.broadcast_to(rope, (b,) + rope.shape[1:]))
        k = rope_ops.apply_rope(k, jnp.broadcast_to(rope, (b,) + rope.shape[1:]))

        # GQA: the cache stores the kv heads UNEXPANDED ([B, S, E_kv] —
        # half the cache bytes and half the decode cache stream at 2x
        # grouping; the fused kernel's slot-grouped attention reads it
        # directly). Heads stay FOLDED in the cache (same trade as
        # models/gpt2.py:init_cache — the [B, S, H, D] layout gets (8, 128)
        # tiling on its (H, D) minor dims and every kernel-boundary reshape
        # becomes a physical retiling copy of the whole cache); this
        # scanned path expands per use with one jnp.repeat.
        s = k_cache.shape[1]
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.reshape(b, t, nkv * hd).astype(k_cache.dtype),
            (0, length, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.reshape(b, t, nkv * hd).astype(v_cache.dtype),
            (0, length, 0))
        kh = k_cache.reshape(b, s, nkv, hd)
        vh = v_cache.reshape(b, s, nkv, hd)
        if nkv != nh:
            rep = nh // nkv
            kh = jnp.repeat(kh, rep, axis=2)
            vh = jnp.repeat(vh, rep, axis=2)
        y = attn_ops.cached_attention(q, kh, vh, length + 1)
        x = x + dense(c.dim, "o_proj")(y.reshape(b, t, nh * hd))

        h = _RMS(c.dim, c.norm_eps, name="post_attn_norm")(x)
        if c.moe_experts > 0:
            from frankenstein_tpu.models.moe import MoESwiGLU
            y, aux_l = MoESwiGLU(dim=c.dim, hidden_dim=c.hidden_dim,
                                 n_experts=c.moe_experts, k=c.moe_k,
                                 capacity_factor=c.moe_capacity,
                                 mesh_axis="model", dtype=self.dtype,
                                 name="moe")(h)
            x = x + y
            aux = aux + aux_l
        else:
            gate = nn.silu(dense(c.hidden_dim, "gate_proj")(h))
            up = dense(c.hidden_dim, "up_proj")(h)
            x = x + dense(c.dim, "down_proj")(gate * up)
        return (x, length, aux), (k_cache, v_cache)


class Llama(nn.Module):
    cfg: LlamaConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = self.param("embed", nn.initializers.normal(0.02),
                                (c.vocab_size, c.dim), jnp.float32)
        if not c.tie_embeddings:
            self.lm_head_w = self.param("lm_head", nn.initializers.normal(0.02),
                                        (c.vocab_size, c.dim), jnp.float32)
        self.layers = nn.scan(
            LlamaBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.n_layers, in_axes=0, out_axes=0,
        )(c, self.dtype, name="layers")
        self.norm_f = _RMS(c.dim, c.norm_eps, name="norm_f")

    def _head(self, x):
        w = self.embed if self.cfg.tie_embeddings else self.lm_head_w
        return jnp.einsum("btd,dv->btv", x, jnp.transpose(w.astype(x.dtype)),
                          preferred_element_type=jnp.float32)

    def _embed_in(self, idx, prefix):
        x = jnp.take(self.embed, idx, axis=0).astype(self.dtype)
        if prefix is not None:
            x = jnp.concatenate([prefix.astype(self.dtype), x], axis=1)
        return x

    def __call__(self, idx, prefix=None, targets=None):
        """Same contract as the GPT-2 path (loss over text positions)."""
        t_words = idx.shape[1]
        x = self._embed_in(idx, prefix)
        cache = init_llama_cache(self.cfg, x.shape[0], x.shape[1],
                                 dtype=self.dtype)
        (x, _, aux), _ = self.layers((x, jnp.int32(0), jnp.float32(0.0)),
                                     cache)
        x = self.norm_f(x[:, -t_words:])
        if targets is not None:
            logits = self._head(x)
            loss = cross_entropy_ignore(logits[:, :-1], targets[:, 1:])
            if self.cfg.moe_experts > 0:
                loss = loss + self.cfg.moe_aux_weight * aux
            return loss, logits
        return None, self._head(x[:, -1:])

    def sequence_logprob(self, idx, prefix=None,
                         ignore_index: int = IGNORE_INDEX):
        """Total log P(idx | prefix), ignoring -100 padding — the rescoring
        primitive. idx: [B, T] with trailing -100 pads. Returns [B]."""
        mask = idx != ignore_index
        input_ids = jnp.where(mask, idx, 0)
        _, logits = self(input_ids, prefix=prefix, targets=input_ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = input_ids[:, 1:]
        tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(tok_lp * mask[:, 1:], axis=-1)

    def prefill(self, idx, prefix, cache):
        """Run the prefix + initial tokens once, filling the cache.

        TPU shape note: the blocks run against a cache sized to THIS
        segment's t positions, widened to the decode width S by one pad at
        the end — NOT against the S-row decode cache. The wide-cache
        version paid a per-layer pad + layout-retiling copy of both cache
        operands and priced attention at S key columns instead of t; the
        t-sized rewrite measured 13.4 -> 9.1 ms on the GPT-2 path
        (models/gpt2.py:prefill, tools/prefill_probe.py)."""
        x = self._embed_in(idx, prefix)
        b, t = x.shape[0], x.shape[1]
        small = init_llama_cache(self.cfg, b, t, dtype=cache[0].dtype)
        (x, _, _), small = self.layers((x, jnp.int32(0), jnp.float32(0.0)),
                                       small)
        x = self.norm_f(x[:, -1:])
        s = cache[0].shape[2]
        widen = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, s - t), (0, 0)))
        from frankenstein_tpu.models.gpt2 import x_len
        return (self._head(x)[:, 0], (widen(small[0]), widen(small[1])),
                jnp.int32(x_len(idx, prefix)))

    def init_decode_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        """Model-specific KV cache for decode/sampling.py's generic drivers
        (generate/beam_search build the cache through this hook; GPT-family
        modules without it default to gpt2.init_cache)."""
        return init_llama_cache(self.cfg, batch, max_len, dtype)

    def decode_step(self, token, cache, length, qweights=None):
        """One decode step. On TPU, supported geometries run all blocks in
        ONE fused Pallas program (ops/pallas/fused_llama_decode.py —
        RMSNorm + in-kernel rope + slot-grouped GQA attention over the
        unexpanded kv cache + SwiGLU; measured 1.47x over the scanned path
        at the ~110M rescorer shape); ``FK_LLAMA_FUSED=0`` reverts to the
        scanned XLA path. ``cache`` may be a ``gpt2.QuantCache`` (int8 KV,
        built by ``gpt2.quantize_cache`` after prefill — halves the cache
        stream AND footprint on top of the unexpanded GQA halving);
        ``qweights`` (an int8 block-weight dict from
        ``quantize_decode_weights``, w8a16) requires the fused path — the
        weight stream it halves is ~73% of the LLaMA decode step's HBM
        bytes at rescorer batch sizes."""
        from frankenstein_tpu.models.gpt2 import QuantCache
        from frankenstein_tpu.ops.pallas import fused_decode
        c = self.cfg
        quant = isinstance(cache, QuantCache)
        k_cache = cache[0]
        b, s = k_cache.shape[1], k_cache.shape[2]
        # default ON: TPU-priced at 1.47x over the scanned path (0.639 vs
        # 0.941 ms/token, ~110M llama b=32; parity max logit drift 0.027 at
        # rms 0.64 — bf16 accumulation-order class, BASELINE.md round 4).
        # FK_LLAMA_FUSED=0 reverts. NOTE: read at TRACE time — the first
        # decode dispatch bakes the value into the jit cache (same pitfall
        # sampling.COMPACT_TOPK documents); set it before the first decode,
        # and use separate processes for fused-vs-scanned control runs.
        import os
        if (os.environ.get("FK_LLAMA_FUSED", "1") == "1"
                and c.moe_experts == 0 and fused_llama_decode.supported(
                    c.n_heads, c.head_dim, c.n_kv_heads, c.hidden_dim, b, s,
                    itemsize=jnp.dtype(self.dtype).itemsize,
                    cache_itemsize=jnp.dtype(k_cache.dtype).itemsize,
                    w_itemsize=1 if qweights is not None else None,
                    n_layers=c.n_layers)):
            x = jnp.take(self.embed, token, axis=0).astype(self.dtype)
            table = rope_ops.build_rope_cache(c.head_dim, s, c.rope_theta)
            cos_e, sin_e = rope_ops.folded_tables(table, c.n_heads)
            cos = jax.lax.dynamic_slice_in_dim(cos_e, length, 1)
            sin = jax.lax.dynamic_slice_in_dim(sin_e, length, 1)
            stacked = qweights if qweights is not None else (
                _stack_llama_decode_weights(
                    self.variables["params"]["layers"], self.dtype))
            xo, kc, vc = fused_llama_decode.fused_llama_decode_blocks(
                x, stacked, k_cache, cache[1], length, cos, sin,
                cache.k_scale if quant else None,
                cache.v_scale if quant else None,
                n_layers=c.n_layers, n_heads=c.n_heads,
                head_dim=c.head_dim, n_kv_heads=c.n_kv_heads,
                hidden=c.hidden_dim, eps=c.norm_eps)
            x = self.norm_f(xo[:, None])
            new_cache = (QuantCache(kc, vc, cache.k_scale, cache.v_scale)
                         if quant else (kc, vc))
            return self._head(x)[:, 0], new_cache, length + 1
        if qweights is not None:
            raise NotImplementedError(
                "w8a16 Llama decode requires the fused TPU path "
                "(ops/pallas/fused_llama_decode.py); drop qweights off-TPU")
        x = jnp.take(self.embed, token[:, None], axis=0).astype(self.dtype)
        if quant:
            # non-fused fallback: dequantize, run, requantize with the
            # FIXED scales (old rows round-trip exactly —
            # fused_decode.quantize_with_scales; the gpt2 path's contract)
            deq = (fused_decode.dequantize_cache_side(cache.k, cache.k_scale,
                                                      self.dtype),
                   fused_decode.dequantize_cache_side(cache.v, cache.v_scale,
                                                      self.dtype))
            (x, _, _), (kf, vf) = self.layers((x, length, jnp.float32(0.0)),
                                              deq)
            x = self.norm_f(x)
            new_cache = QuantCache(
                fused_decode.quantize_with_scales(kf, cache.k_scale),
                fused_decode.quantize_with_scales(vf, cache.v_scale),
                cache.k_scale, cache.v_scale)
            return self._head(x)[:, 0], new_cache, length + 1
        (x, _, _), cache = self.layers((x, length, jnp.float32(0.0)), cache)
        x = self.norm_f(x)
        return self._head(x)[:, 0], cache, length + 1

    @staticmethod
    def reorder_cache(cache, flat_idx, group: int = 0):
        """Beam-order gather; ``group`` routes group-local patterns through
        the streaming Pallas reorder on TPU (ops/pallas/beam_reorder.py)."""
        from frankenstein_tpu.models.gpt2 import GPT
        return GPT.reorder_cache(cache, flat_idx, group=group)

    @staticmethod
    def expand_cache(cache, w: int):
        """Replicate a batch-B prefilled cache to B*W beam rows (each
        sentence's W beams adjacent) — the ``decode/sampling.py:
        _beam_expand`` hook for caches whose batch axis is NOT axis 0:
        llama caches are [L, B, S, E_kv] (batch at axis 1), and QuantCache
        scales carry no batch axis at all."""
        from frankenstein_tpu.models.gpt2 import QuantCache
        rep = lambda c: jnp.repeat(c, w, axis=1)
        if isinstance(cache, QuantCache):
            return QuantCache(rep(cache.k), rep(cache.v),
                              cache.k_scale, cache.v_scale)
        return tuple(rep(c) for c in cache)


def init_llama_cache(cfg: LlamaConfig, batch: int, max_len: int,
                     dtype=jnp.float32):
    """Fixed-shape stacked KV cache: ([L, B, S, E_kv], [L, B, S, E_kv])
    with the GQA kv heads UNEXPANDED (E_kv = n_kv_heads * head_dim) and
    heads FOLDED into the lane dim — the same folding rationale as
    models/gpt2.py:init_cache (clean (8, 128) tiling, no whole-cache
    retiling copies at kernel boundaries). Storing kv heads unexpanded
    (vs the r4 pre-expanded layout) halves the cache bytes and the
    per-step cache stream at 16q/8kv — the stream that broke decode
    scaling (0.639 -> 0.852 ms/token from b=32 -> b=128, BASELINE.md
    round 4); the fused kernel's slot-grouped attention and the scanned
    path's per-use jnp.repeat both read it directly."""
    shape = (cfg.n_layers, batch, max_len,
             cfg.n_kv_heads * cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def candidates_from_beams(toks, eot_id: int, seed_id: Optional[int] = None):
    """[B, W, T] n-best beam tokens (beam_search(n_best=True)) -> the
    [B, W, T+1] rescore_candidates input: the seed token (default: eot_id,
    the decode prompt) is PREPENDED and the first EOT is KEPT; only the
    frozen pad tail strictly after it becomes IGNORE_INDEX. So every
    hypothesis — including one that stops immediately — is priced as
    log P(tokens, EOT | seed), a strictly negative number. (Masking the
    EOT itself would hand a degenerate empty hypothesis an LM score of
    exactly 0, which dominates every real sentence's negative normalized
    log-prob and biases rescoring toward empty predictions.) Host-side
    numpy."""
    import numpy as np
    toks = np.asarray(toks)
    b, w, t = toks.shape
    seed = eot_id if seed_id is None else seed_id
    out = np.full((b * w, t + 1), seed, toks.dtype)
    out[:, 1:] = toks.reshape(b * w, t)
    for row in out:
        hits = np.where(row[1:] == eot_id)[0]
        if len(hits):
            row[hits[0] + 2:] = IGNORE_INDEX
    return jnp.asarray(out.reshape(b, w, t + 1))


def rescore_candidates(module, params, candidates, decoder_scores=None,
                       prefix=None, alpha: float = 0.5,
                       length_normalize: bool = True):
    """Rescore n-best beam outputs with the LM.

    candidates: [B, N, T] token ids (pad with -100); decoder_scores: [B, N]
    from the beam search; prefix: [B, P, dim] brain vectors projected into
    the LM's embedding space, broadcast over candidates. Returns
    (best_idx [B], combined [B, N]).
    """
    b, n, t = candidates.shape
    flat = candidates.reshape(b * n, t)
    pfx = (jnp.repeat(prefix, n, axis=0) if prefix is not None else None)
    lm_scores = module.apply(params, flat, pfx,
                             method=type(module).sequence_logprob)
    lm_scores = lm_scores.reshape(b, n)
    if length_normalize:
        lengths = jnp.sum(candidates != IGNORE_INDEX, axis=-1)
        lm_scores = lm_scores / jnp.maximum(lengths - 1, 1)
    combined = lm_scores if decoder_scores is None else (
        alpha * lm_scores + (1 - alpha) * decoder_scores)
    return jnp.argmax(combined, axis=-1), combined


def params_from_hf_llama(hf_model):
    """Import transformers.LlamaForCausalLM weights (offline, local)."""
    import numpy as np
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in hf_model.state_dict().items()}
    hc = hf_model.config
    cfg = LlamaConfig(
        vocab_size=hc.vocab_size, dim=hc.hidden_size,
        n_layers=hc.num_hidden_layers, n_heads=hc.num_attention_heads,
        n_kv_heads=hc.num_key_value_heads, hidden_dim=hc.intermediate_size,
        rope_theta=hc.rope_theta, norm_eps=hc.rms_norm_eps,
        max_seq_len=hc.max_position_embeddings,
        tie_embeddings=getattr(hc, "tie_word_embeddings", False))

    def dense(name):
        return {"kernel": jnp.asarray(sd[name].T)}

    layers = []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}"
        layers.append({
            "input_norm": {"weight": jnp.asarray(sd[f"{pre}.input_layernorm.weight"])},
            "q_proj": dense(f"{pre}.self_attn.q_proj.weight"),
            "k_proj": dense(f"{pre}.self_attn.k_proj.weight"),
            "v_proj": dense(f"{pre}.self_attn.v_proj.weight"),
            "o_proj": dense(f"{pre}.self_attn.o_proj.weight"),
            "post_attn_norm": {"weight": jnp.asarray(
                sd[f"{pre}.post_attention_layernorm.weight"])},
            "gate_proj": dense(f"{pre}.mlp.gate_proj.weight"),
            "up_proj": dense(f"{pre}.mlp.up_proj.weight"),
            "down_proj": dense(f"{pre}.mlp.down_proj.weight"),
        })
    p = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "norm_f": {"weight": jnp.asarray(sd["model.norm.weight"])},
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = jnp.asarray(sd["lm_head.weight"])
    return {"params": p}, cfg
