"""Autoregressive decoding: KV-cached top-k sampling and batched beam search.

The reference generates by re-forwarding the WHOLE sequence (prefix + all
tokens so far) for every new token with no KV cache
(reference:models/gpt2_model.py:328-353) and runs beam search as Python loops
over beams with sequential re-forwards (reference:gpt2_model.py:355-454).
Here:

- one prefill pass fills a fixed-shape KV cache, then each token costs a
  single-position forward (``lax.scan`` over steps, jit-compiled once);
- beams are VECTORIZED into the batch dimension — a W-beam search over a
  batch of B sentences is one [B*W] decode; cache rows are re-gathered by
  parent-beam index each step;
- everything is static-shaped: fixed max_new_tokens (the dataset caps
  sentences at 25 tokens, reference:utils/data_utils.py:12).

All drivers take the module + params explicitly (pure functions — jit/shard
them like any other step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from frankenstein_tpu.models import gpt2

NEG_INF = -1e30

# Route top-k sampling through the module's compact decode_step_topk contract
# (fused ln_f + lm_head + top-k Pallas program on TPU) when available.
# Measured on v5e at the flagship shape (b=128, 25 tokens): 44.5 ms/batch vs
# 43.1 ms for the dense chain — the fused head saves the [B, vocab] f32
# round-trip but its in-kernel iterative top-k costs slightly more than it
# saves (the loop's overhead is the serial XLA op chain, not any one op's
# formulation). Default OFF; kept as a tested alternate and for the exact
# log-prob (logz) contract it provides.
COMPACT_TOPK = False


# one dispatch each — eager quantization is ~30 small jnp ops, and this
# harness's remote tunnel charges a fixed ~33 ms per dispatch
_quantize_cache_jit = jax.jit(lambda cache: gpt2.quantize_cache(cache))
_quantize_weights_jit = jax.jit(gpt2.quantize_decode_weights,
                                static_argnums=(1,))


@functools.lru_cache(maxsize=1)
def _quantize_llama_weights_jit():
    from frankenstein_tpu.models import llama as llama_mod
    return jax.jit(llama_mod.quantize_decode_weights, static_argnums=(1,))


def _quantize_weights_for(module, params):
    """Route ``int8_weights=True`` to the model family's quantizer: GPT
    trees stack blocks under "h", LLaMA trees under "layers" (both possibly
    below a Franky composite's "llm_model")."""
    dt = getattr(module, "dtype", jnp.bfloat16)
    p = params.get("params", params)
    p = p.get("llm_model", p)
    if "layers" in p and "h" not in p:
        return _quantize_llama_weights_jit()(params, dt)
    return _quantize_weights_jit(params, dt)


def quantize_serving_weights(module, params):
    """Precompute the w8a16 decode-weight tree ONCE for a serving loop and
    pass it as ``qweights=`` to generate/beam_search/sampled_beam_search:
    per-call quantization (``int8_weights=True`` alone) costs a device
    read+write of the whole block-weight tree per request plus a separate
    dispatch — on a remote-tunnel harness that dispatch is a full ~33 ms
    RTT of request latency. At 1B scale the on-device cost alone is
    ~2.7 ms/request (BASELINE.md round 5). Routes to the model family's
    quantizer (GPT "h" stacks / LLaMA "layers", possibly under a Franky
    composite)."""
    return _quantize_weights_for(module, params)


def _round_cache_len(n: int, mult: int = 16) -> int:
    """Round the KV-cache length up to a TPU-tileable multiple — padding rows
    are masked out anyway, and the fused decode kernel
    (ops/pallas/fused_decode.py) needs a clean seq tiling."""
    return -(-n // mult) * mult


def _reorder(module, cache, flat_idx, group: int = 0):
    """Gather cache rows to the surviving-beam order; the module owns its
    cache layout (GPT stacks layers at axis 0, batch at axis 1).

    ``group``: beam width when indices are guaranteed group-local (beam
    parents never cross their sentence's w-row block) — modules may exploit
    it (GPT routes to a streaming Pallas reorder on TPU)."""
    reorder = getattr(type(module), "reorder_cache", None)
    if reorder is not None:
        try:
            return reorder(cache, flat_idx, group=group)
        except TypeError:  # module's reorder_cache predates the group hint
            return reorder(cache, flat_idx)
    return jax.tree_util.tree_map(lambda c: jnp.take(c, flat_idx, axis=0), cache)


def _topk_filter(logits: jnp.ndarray, k: Optional[int],
                 exact: bool = False) -> jnp.ndarray:
    """Keep top-k logits, set the rest to -inf (reference:gpt2_model.py:343-345).

    Uses the TPU-native ``approx_max_k`` by default: exact ``lax.top_k`` over
    a 50k vocab costs more than an entire decode step (measured ~6 ms vs
    ~4 ms/step on v5e); the approximate variant has >=0.99 recall here and is
    ~10x cheaper. Pass exact=True for bit-exact reference semantics."""
    if k is None or k >= logits.shape[-1]:
        return logits
    if exact:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    else:
        kth = jax.lax.approx_max_k(logits, k, recall_target=0.99,
                                   aggregate_to_topk=True)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


@functools.partial(jax.jit, static_argnames=("module", "max_len"))
def _prefill_args(module, params, idx0, prefix, max_len):
    b = idx0.shape[0]
    # cache in the model's compute dtype (bf16 halves decode HBM traffic);
    # modules with their own cache construction provide ``init_decode_cache``
    # (llama: folded [L, B, S, E_kv], GQA kv heads UNEXPANDED) — the GPT
    # family defaults to gpt2.init_cache
    dt = getattr(module, "dtype", jnp.float32)
    if hasattr(type(module), "init_decode_cache"):
        cache = module.init_decode_cache(b, max_len, dtype=dt)
    else:
        gpt_cfg = module.cfg.gpt if hasattr(module.cfg, "gpt") else module.cfg
        cache = gpt2.init_cache(gpt_cfg, b, max_len, dtype=dt)
    logits, cache, length = module.apply(params, idx0, prefix, cache,
                                         method=type(module).prefill)
    return logits, cache, length


def generate(module, params, idx0, prefix, rng, *, max_new_tokens: int,
             temperature: float = 1.0, top_k: Optional[int] = None,
             greedy: bool = False, int8_kv: bool = False,
             int8_weights: bool = False, qweights=None) -> jnp.ndarray:
    """Top-k sampling (or greedy) with a KV cache.

    idx0: [B, T0] prompt ids (the reference seeds with <|endoftext|>);
    prefix: [B, P, n_embd] soft prompt or None. Returns [B, max_new_tokens].

    ``int8_kv=True`` quantizes the prefilled cache to int8 (symmetric
    per-(layer, lane) scales, models/gpt2.py:QuantCache) — halves the decode
    kernel's dominant cache HBM stream and the cache footprint; accuracy is
    property-tested (logit drift small vs the bf16 cache). ``int8_weights=
    True`` (w8a16) additionally quantizes the block matmul weights ONCE per
    call with per-(layer, out-lane) scales — fused TPU decode path only.
    A serving loop calling repeatedly with the SAME params should instead
    pass ``qweights`` precomputed once (``quantize_serving_weights``):
    per-call quantization costs a weight-tree read+write on device PLUS a
    separate dispatch (~33 ms RTT on this harness's remote tunnel — real
    request latency, not just device time).

    Prefill and the sampling scan are jitted SEPARATELY (not one fused
    program): the remote-compile path of this TPU harness rejects the
    combined flagship program, and two dispatches cost one tunnel RTT.
    When called inside an outer jit both inline into one program as usual.
    """
    max_len = _round_cache_len(
        idx0.shape[1] + (prefix.shape[1] if prefix is not None else 0)
        + max_new_tokens + 1)
    logits, cache, length = _prefill_args(module, params, idx0, prefix, max_len)
    if int8_kv:
        cache = _quantize_cache_jit(cache)
    if qweights is None and int8_weights:
        qweights = _quantize_weights_for(module, params)
    return _sample_scan(module, params, logits, cache, length, rng,
                        qweights=qweights,
                        max_new_tokens=max_new_tokens, temperature=temperature,
                        top_k=top_k, greedy=greedy,
                        compact_topk=COMPACT_TOPK)


@functools.partial(jax.jit, static_argnames=("module", "max_new_tokens",
                                             "top_k", "greedy",
                                             "compact_topk"))
def _sample_scan(module, params, logits, cache, length, rng, *,
                 qweights=None, max_new_tokens: int, temperature: float = 1.0,
                 top_k: Optional[int] = None, greedy: bool = False,
                 compact_topk: Optional[bool] = None):
    # Compact-logits path: when the module can return just the top-k
    # (GPT.decode_step_topk — on TPU one fused ln_f+lm_head+top-k Pallas
    # program), the [B, vocab] logits tensor never exists in the scan.
    # decode_step_topk has no qweights contract — w8a16 requests must not be
    # silently dropped, so they take the dense route below.
    # compact_topk is a STATIC arg (callers pass the module-level
    # COMPACT_TOPK eagerly): reading the module global here would bake its
    # first-call value into the jit cache and silently ignore later toggles.
    if compact_topk is None:
        compact_topk = COMPACT_TOPK
    if (compact_topk and qweights is None and top_k is not None
            and top_k < logits.shape[-1]
            and not greedy and hasattr(type(module), "decode_step_topk")):
        return _sample_scan_topk(module, params, logits, cache, length, rng,
                                 max_new_tokens=max_new_tokens,
                                 temperature=temperature, top_k=top_k)

    def pick(logits, r):
        logits = logits.astype(jnp.float32) / temperature
        if greedy:
            return jnp.argmax(logits, axis=-1)
        if top_k is not None and top_k < logits.shape[-1]:
            # sample among the top-k candidates directly: categorical over
            # the k values == categorical over the -inf-filtered vocab, but
            # draws k gumbels per row instead of vocab-size (50k) — the
            # full-width gumbel generation cost ~0.3 ms/step at b=128 on v5e
            vals, idx = jax.lax.approx_max_k(logits, top_k,
                                             recall_target=0.99,
                                             aggregate_to_topk=True)
            choice = jax.random.categorical(r, vals, axis=-1)     # [B]
            return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
        return jax.random.categorical(r, _topk_filter(logits, top_k), axis=-1)

    def step(carry, r):
        logits, cache, length = carry
        tok = pick(logits, r)
        logits, cache, length = module.apply(
            params, tok, cache, length, qweights,
            method=type(module).decode_step)
        return (logits, cache, length), tok

    rngs = jax.random.split(rng, max_new_tokens)
    _, toks = jax.lax.scan(step, (logits, cache, length), rngs)
    return jnp.transpose(toks)                      # [B, max_new_tokens]


def _sample_scan_topk(module, params, logits, cache, length, rng, *,
                      max_new_tokens: int, temperature: float, top_k: int):
    """Top-k sampling over the module's compact (vals, idx) decode contract.

    Sampling among the top-k values IS categorical over the -inf-filtered
    vocab (softmax renormalizes), and /temperature commutes with top-k
    selection — identical semantics to the dense path, minus a [B, vocab]
    round-trip per step."""
    vals0, idx0 = jax.lax.approx_max_k(
        logits.astype(jnp.float32), top_k, recall_target=0.99,
        aggregate_to_topk=True)                     # prefill logits are dense
    # transpose the tied table ONCE, outside the scan (77 MB relayout)
    w_t = (module.apply(params, method=type(module).lm_head_table)
           if hasattr(type(module), "lm_head_table") else None)

    def step(carry, r):
        vals, idx, cache, length = carry
        choice = jax.random.categorical(r, vals / temperature, axis=-1)
        tok = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
        vals, idx, _, cache, length = module.apply(
            params, tok, cache, length, w_t, k=top_k,
            method=type(module).decode_step_topk)
        return (vals, idx, cache, length), tok

    rngs = jax.random.split(rng, max_new_tokens)
    _, toks = jax.lax.scan(step, (vals0, idx0, cache, length), rngs)
    return jnp.transpose(toks)                      # [B, max_new_tokens]


def beam_search(module, params, idx0, prefix, *, max_new_tokens: int,
                beam_width: int = 3, length_normalize: bool = False,
                eos_id: Optional[int] = None, pad_id: Optional[int] = None,
                length_penalty: float = 0.0, int8_kv: bool = False,
                int8_weights: bool = False, qweights=None,
                n_best: bool = False):
    """Deterministic batched beam search (the behavior of
    reference:gpt2_model.py:415-454, vectorized) with EOS handling the
    reference lacks: when ``eos_id`` is given, a beam that emits it is FROZEN
    — it stops accumulating log-prob and emits ``pad_id`` (default: eos_id)
    for the remaining steps. Final ranking uses HF-style length penalty:
    ``score / gen_len**length_penalty`` where gen_len counts tokens up to and
    including EOS (unfinished beams count max_new_tokens).

    Returns (tokens [B, max_new_tokens], scores [B]) of the best beam
    (scores are the normalized selection scores); with ``n_best=True``,
    ALL beam_width hypotheses best-first as ([B, W, max_new_tokens],
    [B, W]) — the n-best list for external rescoring
    (models/llama.py:rescore_candidates).
    Prefill and the beam scan are separate jits (see generate()).
    """
    b, t0 = idx0.shape
    w = beam_width
    rep = lambda x: jnp.repeat(x, w, axis=0) if x is not None else None
    max_len = _round_cache_len(
        t0 + (prefix.shape[1] if prefix is not None else 0)
        + max_new_tokens + 1)
    if length_normalize:           # legacy alias: plain 1/len normalization
        length_penalty = 1.0
    logits, cache, length = _prefill_args(module, params, rep(idx0),
                                          rep(prefix), max_len)
    if int8_kv:
        cache = _quantize_cache_jit(cache)
    if qweights is None and int8_weights:
        qweights = _quantize_weights_for(module, params)
    return _beam_scan(module, params, logits, cache, length, b,
                      qweights=qweights,
                      max_new_tokens=max_new_tokens, beam_width=w,
                      eos_id=eos_id,
                      pad_id=eos_id if pad_id is None else pad_id,
                      length_penalty=length_penalty, n_best=n_best)


@functools.partial(jax.jit, static_argnames=("module", "w"))
def _beam_expand(module, logits, cache, w):
    """Replicate a batch-B prefilled decode state to B*W beam rows (each
    sentence's W beams are adjacent, matching the beam scan's group
    layout). Default: every cache leaf has batch at AXIS 0 (the whisper
    layout). A module whose cache differs (GPT/llama stack layers at axis
    0 — those beam through ``beam_search``, which replicates BEFORE
    prefill) must provide ``expand_cache(cache, w)``."""
    rep = lambda x: jnp.repeat(x, w, axis=0)
    expand = getattr(type(module), "expand_cache", None)
    return (rep(logits),
            expand(cache, w) if expand is not None
            else jax.tree_util.tree_map(rep, cache))


def beam_from_prefill(module, params, logits, cache, length, *,
                      max_new_tokens: int, beam_width: int = 5,
                      eos_id: Optional[int] = None,
                      pad_id: Optional[int] = None,
                      length_penalty: float = 1.0, n_best: bool = False):
    """Deterministic beam search from an already-prefilled decode state —
    the seq2seq entry point (whisper/llama), where prefill is model-specific
    (encoder + cross-KV + prompt) and runs ONCE at batch B before the state
    is replicated to B*W beams here. The module needs the
    ``decode_step(token, cache, length, qweights) -> (logits, cache, length)``
    contract; caches whose batch axis is axis 0 of every leaf (whisper)
    replicate by default, anything else (llama's layer-leading [L, B, S,
    E_kv] tuple / QuantCache) must provide ``expand_cache(cache, w)`` —
    Llama and FrankyLlama do (tested in tests/test_llama.py).

    Matches reference:whisper_hugging_face.ipynb cells 25-27 (HF
    ``generate(num_beams=5)``): ranking divides by ``gen_len**length_penalty``
    (HF default 1.0; pass 0.0 for raw log-prob ranking).

    Returns (tokens [B, max_new_tokens], scores [B]).
    """
    b = logits.shape[0]
    logits, cache = _beam_expand(module, logits, cache, beam_width)
    return _beam_scan(module, params, logits, cache, length, b,
                      max_new_tokens=max_new_tokens, beam_width=beam_width,
                      eos_id=eos_id,
                      pad_id=(eos_id if pad_id is None else pad_id),
                      length_penalty=length_penalty, n_best=n_best)


def _freeze_finished(logp, finished, pad_id):
    """Rows of finished beams get a single continuation: pad with logp 0 —
    the beam's score and (post-EOS) content are frozen."""
    if finished is None:
        return logp
    pad_row = jnp.full((logp.shape[-1],), NEG_INF, logp.dtype)
    pad_row = pad_row.at[pad_id].set(0.0)
    return jnp.where(finished[:, None], pad_row[None], logp)


@functools.partial(jax.jit, static_argnames=("module", "b", "max_new_tokens",
                                             "beam_width", "eos_id", "pad_id",
                                             "length_penalty", "n_best"))
def _beam_scan(module, params, logits, cache, length, b, *,
               qweights=None, max_new_tokens: int, beam_width: int,
               eos_id: Optional[int], pad_id: Optional[int],
               length_penalty: float, n_best: bool = False):
    w = beam_width
    vocab = logits.shape[-1]

    # beams 1..W-1 start dead so the first expansion draws W distinct tokens
    beam_scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (w - 1)), (b,))
    finished0 = jnp.zeros((b * w,), bool)
    gen_len0 = jnp.zeros((b * w,), jnp.int32)

    def step(carry, i):
        logits, cache, length, scores, toks, finished, gen_len = carry
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if eos_id is not None:
            logp = _freeze_finished(logp, finished, pad_id)
        total = scores[:, None] + logp                     # [B*W, V]
        total = total.reshape(b, w * vocab)
        # approx_max_k: exact top_k over W*V dominates the step cost on TPU
        top_scores, top_idx = jax.lax.approx_max_k(
            total, w, recall_target=0.99, aggregate_to_topk=True)  # [B, W]
        parent = top_idx // vocab                          # beam index in [0, W)
        token = top_idx % vocab

        flat_parent = (jnp.arange(b)[:, None] * w + parent).reshape(-1)
        token_flat = token.reshape(-1)

        # reorder cache + token history to the surviving beams
        cache = _reorder(module, cache, flat_parent, group=w)
        toks = jnp.take(toks, flat_parent, axis=0)
        toks = toks.at[:, i].set(token_flat)

        if eos_id is not None:
            parent_fin = jnp.take(finished, flat_parent)
            parent_len = jnp.take(gen_len, flat_parent)
            finished = parent_fin | (token_flat == eos_id)
            gen_len = jnp.where(parent_fin, parent_len, i + 1)

        logits, cache, length = module.apply(
            params, token_flat, cache, length, qweights,
            method=type(module).decode_step)
        return (logits, cache, length, top_scores.reshape(-1), toks,
                finished, gen_len), None

    toks0 = jnp.zeros((b * w, max_new_tokens), jnp.int32)
    (logits, cache, length, scores, toks, finished, gen_len), _ = jax.lax.scan(
        step, (logits, cache, length, beam_scores, toks0, finished0, gen_len0),
        jnp.arange(max_new_tokens))

    scores = scores.reshape(b, w)
    if length_penalty != 0.0:
        if eos_id is not None:
            eff_len = jnp.where(finished, gen_len, max_new_tokens)
        else:
            eff_len = jnp.full_like(gen_len, max_new_tokens)
        scores = scores / (eff_len.reshape(b, w).astype(jnp.float32)
                           ** length_penalty)
    toks = toks.reshape(b, w, max_new_tokens)
    if n_best:
        # all W hypotheses, best-first (the n-best list an external
        # rescorer consumes — models/llama.py:rescore_candidates)
        order = jnp.argsort(-scores, axis=-1)              # [B, W]
        return (jnp.take_along_axis(toks, order[..., None], axis=1),
                jnp.take_along_axis(scores, order, axis=1))
    best = jnp.argmax(scores, axis=-1)                     # [B]
    return (jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0],
            jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0])


def sampled_beam_search(module, params, idx0, prefix, rng, *,
                        max_new_tokens: int, beam_width: int = 5,
                        topk: int = 20, temperature: float = 1.0,
                        eos_id: Optional[int] = None,
                        pad_id: Optional[int] = None,
                        length_penalty: float = 0.0,
                        int8_kv: bool = False, int8_weights: bool = False,
                        qweights=None, n_best: bool = False):
    """Stochastic beam search: each beam samples ``beam_width`` candidates
    from its top-k distribution, the global best W survive — the behavior of
    reference:gpt2_model.py:355-412, vectorized and cached. EOS handling as
    in ``beam_search``: finished beams freeze (emit pad, score unchanged);
    final ranking divides by gen_len**length_penalty.

    Returns (tokens [B, max_new_tokens], scores [B]) of the best beam;
    with ``n_best=True``, ALL beam_width hypotheses best-first as
    ([B, W, max_new_tokens], [B, W]) — so the reference's sampled-beam
    variant can feed the LLaMA rescorer
    (models/llama.py:rescore_candidates) exactly like ``beam_search``.
    """
    b, t0 = idx0.shape
    w = beam_width
    rep = lambda x: jnp.repeat(x, w, axis=0) if x is not None else None
    max_len = _round_cache_len(
        t0 + (prefix.shape[1] if prefix is not None else 0)
        + max_new_tokens + 1)
    logits, cache, length = _prefill_args(module, params, rep(idx0),
                                          rep(prefix), max_len)
    if int8_kv:
        cache = _quantize_cache_jit(cache)
    if qweights is None and int8_weights:
        qweights = _quantize_weights_for(module, params)
    return _sampled_beam_scan(module, params, logits, cache, length, rng, b,
                              qweights=qweights,
                              max_new_tokens=max_new_tokens, beam_width=w,
                              topk=topk, temperature=temperature,
                              eos_id=eos_id,
                              pad_id=eos_id if pad_id is None else pad_id,
                              length_penalty=length_penalty, n_best=n_best)


@functools.partial(jax.jit, static_argnames=("module", "b", "max_new_tokens",
                                             "beam_width", "topk", "eos_id",
                                             "pad_id", "length_penalty",
                                             "n_best"))
def _sampled_beam_scan(module, params, logits, cache, length, rng, b, *,
                       qweights=None, max_new_tokens: int, beam_width: int,
                       topk: int,
                       temperature: float, eos_id: Optional[int],
                       pad_id: Optional[int], length_penalty: float,
                       n_best: bool = False):
    w = beam_width
    vocab = logits.shape[-1]
    beam_scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (w - 1)), (b,))
    finished0 = jnp.zeros((b * w,), bool)
    gen_len0 = jnp.zeros((b * w,), jnp.int32)

    def step(carry, sr):
        i, r = sr
        logits, cache, length, scores, toks, finished, gen_len = carry
        logp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature,
                                  axis=-1)                 # [B*W, V]
        if eos_id is not None:
            logp = _freeze_finished(logp, finished, pad_id)
        top_logp, top_tok = jax.lax.approx_max_k(
            logp, topk, recall_target=0.99, aggregate_to_topk=True)  # [B*W, K]

        # sample W candidates per beam WITHOUT replacement (Gumbel top-k)
        g = jax.random.gumbel(r, top_logp.shape)
        pick = jax.lax.top_k(top_logp + g, w)[1]           # [B*W, W] idx into K
        cand_logp = jnp.take_along_axis(top_logp, pick, axis=-1)
        cand_tok = jnp.take_along_axis(top_tok, pick, axis=-1)

        total = scores[:, None] + cand_logp               # [B*W, W]
        total = total.reshape(b, w * w)
        top_scores, top_idx = jax.lax.top_k(total, w)      # [B, W]
        parent = top_idx // w
        flat_parent = (jnp.arange(b)[:, None] * w + parent).reshape(-1)
        token_flat = jnp.take_along_axis(cand_tok.reshape(b, w * w),
                                         top_idx, axis=-1).reshape(-1)

        cache = _reorder(module, cache, flat_parent, group=w)
        toks = jnp.take(toks, flat_parent, axis=0)
        toks = toks.at[:, i].set(token_flat)

        if eos_id is not None:
            parent_fin = jnp.take(finished, flat_parent)
            parent_len = jnp.take(gen_len, flat_parent)
            finished = parent_fin | (token_flat == eos_id)
            gen_len = jnp.where(parent_fin, parent_len, i + 1)

        logits, cache, length = module.apply(
            params, token_flat, cache, length, qweights,
            method=type(module).decode_step)
        return (logits, cache, length, top_scores.reshape(-1), toks,
                finished, gen_len), None

    toks0 = jnp.zeros((b * w, max_new_tokens), jnp.int32)
    rngs = jax.random.split(rng, max_new_tokens)
    (logits, cache, length, scores, toks, finished, gen_len), _ = jax.lax.scan(
        step, (logits, cache, length, beam_scores, toks0, finished0, gen_len0),
        (jnp.arange(max_new_tokens), rngs))

    scores = scores.reshape(b, w)
    if length_penalty != 0.0:
        if eos_id is not None:
            eff_len = jnp.where(finished, gen_len, max_new_tokens)
        else:
            eff_len = jnp.full_like(gen_len, max_new_tokens)
        scores = scores / (eff_len.reshape(b, w).astype(jnp.float32)
                           ** length_penalty)
    toks = toks.reshape(b, w, max_new_tokens)
    if n_best:
        # all W hypotheses, best-first (the n-best list an external
        # rescorer consumes — models/llama.py:rescore_candidates)
        order = jnp.argsort(-scores, axis=-1)              # [B, W]
        return (jnp.take_along_axis(toks, order[..., None], axis=1),
                jnp.take_along_axis(scores, order, axis=1))
    best = jnp.argmax(scores, axis=-1)
    return (jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0],
            jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0])


def trim_at_eot(tokens, eot_id: int):
    """Host-side: cut each row at the first eot (intended behavior of the
    reference's broken Franky.generate, franky_baseline_gpt2.ipynb cell 4)."""
    import numpy as np
    out = []
    for row in np.asarray(tokens):
        stops = np.where(row == eot_id)[0]
        out.append(list(row[: stops[0]] if len(stops) else row))
    return out


@functools.partial(jax.jit, static_argnames=("module", "max_new_tokens"))
def greedy_decode_scan(module, params, logits, cache, length, *,
                       max_new_tokens: int) -> jnp.ndarray:
    """Greedy KV-cached decode as ONE scanned dispatch, for any module with
    the ``decode_step(token, cache, length) -> (logits, cache, length)``
    contract (whisper, llama, gpt). Emits argmax(prefill logits) first, then
    max_new_tokens - 1 cached steps — token-identical to the per-step
    Python loop it replaces (eval/evaluate.py used to dispatch decode_step
    per token: ~33 ms of tunnel round-trip per TOKEN on this harness,
    reference:whisper_hugging_face.ipynb cells 25-27 generate server-side).
    Returns [B, max_new_tokens]."""
    def step(carry, _):
        logits, cache, length = carry
        tok = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        logits, cache, length = module.apply(
            params, tok, cache, length, method=type(module).decode_step)
        return (logits, cache, length), tok

    _, toks = jax.lax.scan(step, (logits, cache, length), None,
                           length=max_new_tokens)
    return jnp.transpose(toks)                      # [B, max_new_tokens]
