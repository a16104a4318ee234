"""End-to-end WER evaluation drivers (the reference's compute_metrics /
predict_with_generate loop, reference:whisper_hugging_face.ipynb cells 11,19).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frankenstein_tpu.config import GPT2_EOT
from frankenstein_tpu.data.text import process_string
from frankenstein_tpu.decode import sampling
from frankenstein_tpu.eval.wer import corpus_wer

import functools


@functools.partial(jax.jit, static_argnames=("model",))
def _whisper_prefill_jit(model, params, tok0, mels, cache):
    return model.apply(params, tok0, mels, cache, method=type(model).prefill)


def evaluate_franky_wer(model, params, dataset, tokenizer, *,
                        batch_size: int = 32, max_new_tokens: int = 25,
                        beam_width: int = 0, top_k: int = 10,
                        eot_id: int = GPT2_EOT, seed: int = 0,
                        rescorer=None,
                        normalize: Callable = process_string):
    """Decode every trial, normalize, return (corpus WER, predictions).

    Works for any module with the predictor contract (Franky, FrankyLlama).
    ``rescorer=(lm, lm_params[, alpha])`` with ``beam_width > 1`` re-ranks
    each trial's n-best list by interpolated LM log-prob before scoring
    (decode/pipeline.py)."""
    from frankenstein_tpu.decode.pipeline import make_franky_predictor
    predict = make_franky_predictor(model, params, tokenizer,
                                    max_new_tokens=max_new_tokens,
                                    top_k=top_k, beam_width=beam_width,
                                    eot_id=eot_id, seed=seed,
                                    rescorer=rescorer)
    preds, refs = [], []
    n = len(dataset)
    for s in range(0, n, batch_size):
        ids = range(s, min(s + batch_size, n))
        xs = np.stack([dataset[i][0] for i in ids])
        # pad the final partial batch to keep shapes static
        pad = batch_size - xs.shape[0]
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)])
        sents = predict(xs)[:len(list(ids))]
        preds.extend(sents)
    refs = [normalize(t) for t in dataset.targets]
    preds = [normalize(p) for p in preds]
    return corpus_wer(refs, preds), preds


def evaluate_seq2seq_wer(model, params, mels, sentences, tokenizer, *,
                         start_id: Optional[int] = None, batch_size: int = 16,
                         max_new_tokens: int = 32, eot_id: Optional[int] = None,
                         beam_width: int = 0, length_penalty: float = 1.0,
                         int8_kv: bool = False,
                         normalize: Callable = process_string):
    """Whisper-path WER: cached decode over [N, n_mels, T] inputs — greedy
    by default, deterministic beam search with ``beam_width > 1`` (the
    reference evaluates both ``generate()`` and ``generate(num_beams=5)``,
    reference:whisper_hugging_face.ipynb cells 25-27; beams rank by
    HF-style ``score / gen_len**length_penalty``).

    With ``start_id=None`` the decoder is prompted with the model's own SOT
    sequence (``<|startoftranscript|><|lang|><|task|><|notimestamps|>`` for an
    HF-imported checkpoint — the reference decodes through the HF processor
    with exactly this prompt), and generation is trimmed at the model's end
    token.

    ``int8_kv=True`` quantizes the prefilled self- and cross-KV to int8
    (``whisper.quantize_whisper_cache``, fixed per-(head, dim) scales):
    measured 435.0 -> 524.4 sentences/sec/chip on w=5 beams at b=32
    (BASELINE.md round 5); fidelity is tolerance-tested in
    tests/test_whisper.py."""
    from frankenstein_tpu.models import whisper as whisper_lib

    cfg = model.cfg
    if start_id is None:
        prompt = model.sot_prompt()
        eot = model.eot_id() if eot_id is None else eot_id
    else:
        prompt = (start_id,)
        eot = eot_id
    preds = []
    n = mels.shape[0]
    for s in range(0, n, batch_size):
        xs = mels[s:s + batch_size]
        pad = batch_size - xs.shape[0]
        real = xs.shape[0]
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)])
        # one prefill dispatch + ONE scanned decode dispatch (the per-token
        # Python loop this replaces paid this harness's fixed ~33 ms tunnel
        # cost per TOKEN; the jits stay separate per the remote-compile
        # size limit — see CLAUDE.md)
        tok0 = jnp.tile(jnp.asarray(prompt, jnp.int32)[None], (batch_size, 1))
        cache = whisper_lib.init_whisper_cache(
            cfg, batch_size, len(prompt) + max_new_tokens + 2)
        logits, cache, length = _whisper_prefill_jit(model, params, tok0,
                                                     jnp.asarray(xs), cache)
        if int8_kv:
            cache = whisper_lib.quantize_whisper_cache(cache)
        if beam_width > 1:
            seqs, _ = sampling.beam_from_prefill(
                model, params, logits, cache, length,
                max_new_tokens=max_new_tokens, beam_width=beam_width,
                eos_id=eot, length_penalty=length_penalty)
            seqs = np.asarray(seqs)[:real]
        else:
            seqs = np.asarray(sampling.greedy_decode_scan(
                model, params, logits, cache, length,
                max_new_tokens=max_new_tokens))[:real]
        if eot is not None:
            seqs_list = sampling.trim_at_eot(seqs, eot)
        else:
            seqs_list = [list(row) for row in seqs]
        for row in seqs_list:
            preds.append(tokenizer.decode(list(row), skip_special_tokens=True))
    refs = [normalize(t) for t in sentences]
    preds = [normalize(p) for p in preds]
    return corpus_wer(refs, preds), preds
