"""End-to-end inference pipeline + streaming windows: the reference's
generate->normalize->sub.txt chain, on tiny models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                     PerceiverConfig)
from frankenstein_tpu.data import tokenizers
from frankenstein_tpu.decode import pipeline, streaming
from frankenstein_tpu.eval import submission
from frankenstein_tpu.models.franky import Franky


def tiny_franky():
    cfg = FrankyConfig(
        brain=PerceiverConfig(
            encoder=MAEConfig(window_size=32, n_electrodes=8, patch_size=8,
                              dim=16, n_layers=1, head_dim=8, hidden_dim=32,
                              n_heads=2, n_kv_heads=2, n_dec_layers=1,
                              decoder_dim=16),
            n_output_tokens=4, output_dim=24, dim=16, n_layers=1, head_dim=8,
            hidden_dim=32, n_heads=2, n_kv_heads=2),
        gpt=GPTConfig(block_size=32, vocab_size=300, n_layer=1, n_head=2,
                      n_embd=24),
        max_tokens=8, pad_token_id=299)
    model = Franky(cfg)
    x = jnp.ones((1, 32, 8))
    y = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), x, y)
    return model, params, cfg


@pytest.mark.slow
def test_predictor_to_submission(tmp_path):
    model, params, cfg = tiny_franky()
    tok = tokenizers.ByteTokenizer(eot_id=299)
    predict = pipeline.make_franky_predictor(
        model, params, tok, max_new_tokens=6, top_k=5, eot_id=299)
    xs = np.random.default_rng(0).standard_normal((3, 32, 8)).astype(np.float32)
    sents = predict(xs)
    assert len(sents) == 3
    assert all(isinstance(s, str) for s in sents)

    p = submission.create_string_file(tmp_path / "sub.txt", sents)
    assert len(p.read_text().splitlines()) == 3

    # beam variant
    predict_b = pipeline.make_franky_predictor(
        model, params, tok, max_new_tokens=6, beam_width=2, eot_id=299)
    sents_b = predict_b(xs)
    assert len(sents_b) == 3


def test_predictor_w8a16_plumbing():
    """int8_weights=True threads w8a16 through both predictor branches
    (greedy generate + beam search). The w8 path only executes inside the
    fused TPU decode kernel, so off-TPU the plumbing must reach the
    documented loud guard (models/gpt2.py) — NOT silently fall back to
    float weights; the numeric contract is TPU-side and lives in the
    tolerance tests (test_gpt2.py / test_decode.py)."""
    import pytest

    model, params, cfg = tiny_franky()
    tok = tokenizers.ByteTokenizer(eot_id=299)
    xs = np.random.default_rng(5).standard_normal((2, 32, 8)).astype(np.float32)

    # 'fused TPU' matches BOTH family guards: the GPT message says 'fused
    # TPU decode path' (models/gpt2.py), the LLaMA one 'fused TPU path'
    # (models/llama.py) — ADVICE r4
    for kwargs in ({"top_k": 5}, {"beam_width": 2}):
        predict = pipeline.make_franky_predictor(
            model, params, tok, max_new_tokens=6, eot_id=299,
            int8_weights=True, **kwargs)
        with pytest.raises(NotImplementedError, match="fused TPU"):
            predict(xs)


def test_predictor_w8a16_plumbing_llama():
    """The FrankyLlama branch of the same contract: int8_weights must reach
    the LLaMA-family loud guard off-TPU (models/llama.py), covering the
    guard message the GPT-only parametrization missed (ADVICE r4)."""
    import pytest
    from frankenstein_tpu.models.franky import FrankyLlama, FrankyLlamaConfig
    from frankenstein_tpu.models import llama as llama_mod

    cfg = FrankyLlamaConfig(
        brain=PerceiverConfig(
            encoder=MAEConfig(window_size=32, n_electrodes=8, patch_size=8,
                              dim=16, n_layers=1, head_dim=8, hidden_dim=32,
                              n_heads=2, n_kv_heads=2, n_dec_layers=1,
                              decoder_dim=16),
            n_output_tokens=4, output_dim=32, dim=16, n_layers=1, head_dim=8,
            hidden_dim=32, n_heads=2, n_kv_heads=2),
        lm=llama_mod.tiny_llama_config(vocab_size=300))
    model = FrankyLlama(cfg)
    x1 = jnp.zeros((1, 32, 8), jnp.float32)
    y1 = jnp.zeros((1, cfg.max_tokens), jnp.int32)
    params = model.init(jax.random.key(0), x1, y1)
    tok = tokenizers.ByteTokenizer(eot_id=299)
    xs = np.random.default_rng(5).standard_normal((2, 32, 8)).astype(np.float32)

    predict = pipeline.make_franky_predictor(
        model, params, tok, max_new_tokens=6, eot_id=299,
        int8_weights=True, top_k=5)
    with pytest.raises(NotImplementedError, match="fused TPU"):
        predict(xs)


def test_predictor_int8_kv():
    """int8_kv=True (the FrankyLlama bench serving default, BASELINE r5)
    must serve through the predictor on BOTH decode branches — off-TPU it
    takes the scanned dequant fallback, so unlike w8a16 the contract is
    'produces sentences', not a loud guard."""
    model, params, cfg = tiny_franky()
    tok = tokenizers.ByteTokenizer(eot_id=299)
    xs = np.random.default_rng(7).standard_normal((2, 32, 8)).astype(np.float32)

    for kwargs in ({"top_k": 5}, {"beam_width": 2}):
        predict = pipeline.make_franky_predictor(
            model, params, tok, max_new_tokens=6, eot_id=299,
            int8_kv=True, **kwargs)
        sents = predict(xs)
        assert len(sents) == 2 and all(isinstance(s, str) for s in sents)


def test_predictor_with_llama_rescorer():
    """The full reference-README chain (brain -> GPT beams -> LLaMA rescore):
    alpha=0 (pure decoder scores) must reproduce the plain beam output since
    the n-best list is sorted best-first; alpha>0 must still produce valid
    strings."""
    from frankenstein_tpu.models import llama

    model, params, cfg = tiny_franky()
    tok = tokenizers.ByteTokenizer(eot_id=299)
    lm_cfg = llama.tiny_llama_config(vocab_size=300)
    lm = llama.Llama(lm_cfg)
    lm_params = lm.init(jax.random.key(7), jnp.zeros((1, 4), jnp.int32))

    xs = np.random.default_rng(2).standard_normal((2, 32, 8)).astype(np.float32)
    plain = pipeline.make_franky_predictor(
        model, params, tok, max_new_tokens=6, beam_width=3, eot_id=299)(xs)
    alpha0 = pipeline.make_franky_predictor(
        model, params, tok, max_new_tokens=6, beam_width=3, eot_id=299,
        rescorer=(lm, lm_params, 0.0))(xs)
    assert alpha0 == plain

    rescored = pipeline.make_franky_predictor(
        model, params, tok, max_new_tokens=6, beam_width=3, eot_id=299,
        rescorer=(lm, lm_params, 0.5))(xs)
    assert len(rescored) == 2 and all(isinstance(s, str) for s in rescored)


def test_sliding_windows():
    sig = np.arange(100 * 2, dtype=np.float32).reshape(100, 2)
    ws = list(streaming.sliding_windows(sig, window_size=32, stride=8))
    assert all(w.shape == (32, 2) for w in ws)
    assert len(ws) == (100 - 32) // 8 + 1
    np.testing.assert_array_equal(ws[1], sig[8:40])


def test_stream_predict_batches():
    model, params, cfg = tiny_franky()
    sig = np.random.default_rng(1).standard_normal((100, 8)).astype(np.float32)
    outs = streaming.stream_predict(model, params, sig, window_size=32,
                                    stride=16, batch_windows=4)
    assert len(outs) == (100 - 32) // 16 + 1
    assert outs[0].shape == (4, 24)   # n_output_tokens x output_dim
