"""WER evaluation drivers end-to-end on tiny models + whisper-through-trainer."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import TrainConfig, WhisperConfig
from frankenstein_tpu.data import datasets, tokenizers
from frankenstein_tpu.eval import evaluate
from frankenstein_tpu.models import whisper
from frankenstein_tpu.train import trainer
from tests.test_pipeline import tiny_franky


@pytest.mark.slow
def test_evaluate_franky_wer():
    model, params, cfg = tiny_franky()
    tok = tokenizers.ByteTokenizer(eot_id=299)
    ds = datasets.BrainDataset.synthetic(
        n_trials=5, tokenize_function=tokenizers.get_tokenizer(tok),
        n_electrodes=8, max_input_len=32, max_tokens=8)
    wer, preds = evaluate.evaluate_franky_wer(
        model, params, ds, tok, batch_size=4, max_new_tokens=6, eot_id=299)
    assert len(preds) == 5
    assert 0.0 <= wer  # untrained model: any finite WER
    assert np.isfinite(wer)


@pytest.mark.slow
def test_evaluate_franky_llama_wer_with_rescorer():
    """The eval harness drives the FrankyLlama composite and threads a
    rescorer through the beam path (the full north-star serving chain)."""
    from frankenstein_tpu.models import llama
    from tests.test_franky_llama import tiny_cfg
    from frankenstein_tpu.models.franky import FrankyLlama

    cfg = tiny_cfg()
    model = FrankyLlama(cfg)
    x = jnp.ones((1, 32, 8))
    y = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), x, y)

    tok = tokenizers.ByteTokenizer(eot_id=299)
    ds = datasets.BrainDataset.synthetic(
        n_trials=5, tokenize_function=tokenizers.get_tokenizer(tok),
        n_electrodes=8, max_input_len=32, max_tokens=8)

    lm = llama.Llama(llama.tiny_llama_config(vocab_size=300))
    lm_params = lm.init(jax.random.key(7), jnp.zeros((1, 4), jnp.int32))
    wer, preds = evaluate.evaluate_franky_wer(
        model, params, ds, tok, batch_size=4, max_new_tokens=6,
        beam_width=2, eot_id=299, rescorer=(lm, lm_params, 0.5))
    assert len(preds) == 5 and np.isfinite(wer)


@pytest.mark.slow
def test_whisper_through_trainer_and_wer(tmp_path):
    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=16,
                        n_audio_head=2, n_audio_layer=1, n_vocab=64,
                        n_text_ctx=16, n_text_state=16, n_text_head=2,
                        n_text_layer=1)
    model = whisper.BrainWhisper(cfg)
    spec = trainer.TrainableSpec(module=model)

    rng = np.random.default_rng(0)
    mels = rng.standard_normal((8, cfg.n_mels, 32)).astype(np.float32)
    labels = rng.integers(0, 60, (8, 6)).astype(np.int64)
    labels[:, 5:] = -100
    batch = (mels, labels, np.zeros((8,), np.int32))

    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_iters=0,
                       use_scheduler=False)
    state, tx = trainer.init_state(spec, tcfg, batch)
    step = trainer.make_train_step(spec, tx, tcfg)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    l0 = None
    for i in range(5):
        state, loss, _ = step(state, jb, jax.random.key(i))
        l0 = l0 or float(loss)
    assert float(loss) < l0  # learns the tiny batch

    tok = tokenizers.ByteTokenizer(eot_id=63)
    wer, preds = evaluate.evaluate_seq2seq_wer(
        model, {"params": state.params}, mels, ["a b"] * 8, tok,
        start_id=int(model.cfg.n_vocab - 3), batch_size=4, max_new_tokens=5)
    assert len(preds) == 8 and np.isfinite(wer)
