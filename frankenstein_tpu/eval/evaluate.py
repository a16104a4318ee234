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


def evaluate_franky_wer(model, params, dataset, tokenizer, *,
                        batch_size: int = 32, max_new_tokens: int = 25,
                        beam_width: int = 0, top_k: int = 10,
                        eot_id: int = GPT2_EOT, seed: int = 0,
                        normalize: Callable = process_string):
    """Decode every trial, normalize, return (corpus WER, predictions)."""
    from frankenstein_tpu.decode.pipeline import make_franky_predictor
    predict = make_franky_predictor(model, params, tokenizer,
                                    max_new_tokens=max_new_tokens,
                                    top_k=top_k, beam_width=beam_width,
                                    eot_id=eot_id, seed=seed)
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
                         start_id: int, batch_size: int = 16,
                         max_new_tokens: int = 32,
                         normalize: Callable = process_string):
    """Whisper-path WER: greedy cached decode over [N, n_mels, T] inputs."""
    from frankenstein_tpu.models import whisper as whisper_lib

    cfg = model.cfg
    preds = []
    n = mels.shape[0]
    for s in range(0, n, batch_size):
        xs = mels[s:s + batch_size]
        pad = batch_size - xs.shape[0]
        real = xs.shape[0]
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)])
        tok0 = jnp.full((batch_size, 1), start_id, jnp.int32)
        cache = whisper_lib.init_whisper_cache(cfg, batch_size,
                                               max_new_tokens + 2)
        logits, cache, length = model.apply(params, tok0, jnp.asarray(xs),
                                            cache,
                                            method=type(model).prefill)
        toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
        for _ in range(max_new_tokens - 1):
            logits, cache, length = model.apply(
                params, toks[-1], cache, length,
                method=type(model).decode_step)
            toks.append(jnp.argmax(logits, -1).astype(jnp.int32))
        seqs = np.stack([np.asarray(t) for t in toks], axis=1)[:real]
        for row in seqs:
            preds.append(tokenizer.decode(list(row), skip_special_tokens=True))
    refs = [normalize(t) for t in sentences]
    preds = [normalize(p) for p in preds]
    return corpus_wer(refs, preds), preds
