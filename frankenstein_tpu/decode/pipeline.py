"""High-level brain->text prediction pipeline: signal window in, sentence out.

Implements the intended behavior of the reference's broken ``Franky.generate``
(reference:notebooks_trainer/franky_baseline_gpt2.ipynb cell 4: seeds with
<|endoftext|>, samples up to 25 tokens with top-k 10, trims at the stop
token) on the KV-cached decode stack, plus a beam-search variant, batched.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frankenstein_tpu.config import GPT2_EOT
from frankenstein_tpu.decode import sampling


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Pre-cast fp32 params to the compute dtype once: XLA does NOT hoist the
    per-op casts out of the decode scan, so this saves ~20%% of decode time
    (measured on v5e)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype")
        and a.dtype == jnp.float32 else a, params)


def make_franky_predictor(model, params, tokenizer, *,
                          max_new_tokens: int = 25,
                          temperature: float = 1.0,
                          top_k: Optional[int] = 10,
                          beam_width: int = 0,
                          eot_id: int = GPT2_EOT,
                          seed: int = 0,
                          rescorer=None,
                          int8_weights: bool = False,
                          int8_kv: bool = False) -> Callable:
    """Returns predict_fn(xs [B, T, C]) -> list[str] (length B).

    ``rescorer``: optional ``(lm_module, lm_params)`` or
    ``(lm_module, lm_params, alpha)`` — with ``beam_width > 1`` the full
    n-best list is re-ranked by interpolated LM log-probability
    (models/llama.py:rescore_candidates; the reference README's
    `... -> LLAMA 3` stage, unimplemented there).

    ``int8_weights=True`` streams w8a16 block weights through the decode
    scans (per-out-lane-scale dequant, tolerance-tested): measured 1.08x
    on GPT-2 decode at b=128 and 1.20x on the FrankyLlama LLaMA at b=32
    (BASELINE.md). Off by default here so eval/WER flows stay
    exact-weight unless the caller opts in. The w8 path only exists in
    the fused TPU decode kernel — off-TPU, or at a batch the fused gate
    rejects (kernel tiles rows in 8s; b>=8 on the flagship), the decode
    raises the loud ``NotImplementedError`` guard rather than silently
    timing float weights.

    ``int8_kv=True`` quantizes the prefilled KV cache to int8 (fixed
    per-(layer, lane) scales; in-kernel requant of new rows on TPU, a
    scanned dequant fallback elsewhere): measured +4.9% on the FrankyLlama
    rescored-beams chain at b=32 w=5 (199.4 -> 209.1 sent/s/chip,
    BASELINE.md round 5 — beam reorders stream half the bytes). Off by
    default: fidelity is the documented rescoring-grade caveat, so WER
    flows opt in explicitly."""
    counter = {"n": 0}
    params = cast_params_for_inference(params, getattr(model, "dtype",
                                                       jnp.float32))
    # quantize ONCE at predictor build: the predictor is a serving-loop
    # closure, and per-call quantization costs a device weight-tree
    # read+write plus a separate dispatch per request (sampling.
    # quantize_serving_weights)
    qweights = (sampling.quantize_serving_weights(model, params)
                if int8_weights else None)

    def predict(xs) -> List[str]:
        b = xs.shape[0]
        x = jnp.asarray(xs, jnp.float32)
        prefix = model.apply(params, x, method=type(model).encode)
        idx0 = jnp.full((b, 1), eot_id, jnp.int32)
        counter["n"] += 1
        rng = jax.random.fold_in(jax.random.key(seed), counter["n"])
        if beam_width > 1:
            # EOS-aware beams + HF-default length penalty 1.0 (the reference's
            # beams keep accumulating log-prob past <|endoftext|>,
            # reference:gpt2_model.py:415-454 — a pure WER pessimization)
            toks, scores = sampling.beam_search(
                model, params, idx0, prefix,
                max_new_tokens=max_new_tokens, beam_width=beam_width,
                eos_id=eot_id, length_penalty=1.0,
                n_best=rescorer is not None,
                int8_weights=int8_weights, qweights=qweights,
                int8_kv=int8_kv)
            if rescorer is not None:
                from frankenstein_tpu.models import llama as llama_mod
                lm_module, lm_params = rescorer[0], rescorer[1]
                alpha = rescorer[2] if len(rescorer) > 2 else 0.5
                cands = llama_mod.candidates_from_beams(toks, eot_id)
                best, _ = llama_mod.rescore_candidates(
                    lm_module, lm_params, cands,
                    decoder_scores=scores, alpha=alpha)
                toks = jnp.take_along_axis(
                    toks, best[:, None, None], axis=1)[:, 0]
        else:
            toks = sampling.generate(model, params, idx0, prefix, rng,
                                     max_new_tokens=max_new_tokens,
                                     temperature=temperature, top_k=top_k,
                                     int8_weights=int8_weights,
                                     qweights=qweights, int8_kv=int8_kv)
        trimmed = sampling.trim_at_eot(toks, eot_id)
        return [tokenizer.decode(t, skip_special_tokens=True) for t in trimmed]

    return predict
