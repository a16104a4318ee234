"""FrankyLlama: the reference's north-star composite
(`VQVAE -> MAE -> Perceiver -> LLAMA 3`, reference:README.md:19 — the LLaMA
stage is unimplemented there). Covers the trainable contract, cached-decode
parity through the generic sampling drivers (init_decode_cache hook), beams,
prefix-conditioned self-rescoring, and a short training descent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.config import MAEConfig, PerceiverConfig, TrainConfig
from frankenstein_tpu.decode import sampling
from frankenstein_tpu.models import llama
from frankenstein_tpu.models.franky import FrankyLlama, FrankyLlamaConfig

EOT = 299


def tiny_cfg(**lm_kw):
    lm = llama.tiny_llama_config(vocab_size=300, **lm_kw)
    return FrankyLlamaConfig(
        brain=PerceiverConfig(
            encoder=MAEConfig(window_size=32, n_electrodes=8, patch_size=8,
                              dim=16, n_layers=1, head_dim=8, hidden_dim=32,
                              n_heads=2, n_kv_heads=2, n_dec_layers=1,
                              decoder_dim=16),
            n_output_tokens=4, output_dim=lm.dim, dim=16, n_layers=1,
            head_dim=8, hidden_dim=32, n_heads=2, n_kv_heads=2),
        lm=lm, max_tokens=8, pad_token_id=EOT)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_cfg()
    model = FrankyLlama(cfg)
    x = jnp.ones((1, 32, 8))
    y = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), x, y)
    return model, params, cfg


def test_forward_contract(tiny):
    model, params, cfg = tiny
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    tgt = np.asarray(rng.integers(0, 300, (2, 8)), np.int32)
    tgt[:, 5:] = -100
    loss, logits = model.apply(params, x, jnp.asarray(tgt))
    assert logits.shape == (2, 8, 300)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_cached_decode_matches_full_forward(tiny):
    """Greedy generate (prefill + decode_step scan via the generic sampling
    driver and the init_decode_cache hook) must equal token-by-token full
    re-forwards of the inner LM on the same prefix."""
    model, params, cfg = tiny
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    prefix = model.apply(params, x, method=FrankyLlama.encode)
    idx0 = jnp.full((2, 1), EOT, jnp.int32)

    got = sampling.generate(model, params, idx0, prefix,
                            jax.random.key(0), max_new_tokens=5, greedy=True)

    idx = idx0
    for _ in range(5):
        _, logits = model.apply(params, idx, prefix,
                                method=lambda m, i, p: m.llm_model(i, p))
        idx = jnp.concatenate(
            [idx, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]],
            axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(idx[:, 1:]))


def test_beams_and_self_rescoring(tiny):
    """Beam search works through the llama cache layout, and the composite
    can rescore its own n-best list brain-conditioned (sequence_logprob with
    prefix=encode(x))."""
    model, params, cfg = tiny
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    prefix = model.apply(params, x, method=FrankyLlama.encode)
    idx0 = jnp.full((2, 1), EOT, jnp.int32)

    toks, scores = sampling.beam_search(
        model, params, idx0, prefix, max_new_tokens=5, beam_width=3,
        eos_id=EOT, length_penalty=1.0, n_best=True)
    assert toks.shape == (2, 3, 5) and scores.shape == (2, 3)

    cands = llama.candidates_from_beams(toks, EOT)
    best, combined = llama.rescore_candidates(
        model, params, cands,
        decoder_scores=scores,
        prefix=prefix, alpha=0.5)
    assert best.shape == (2,) and combined.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(combined)))


def test_tensor_parallel_matches_single_device(tiny):
    """LLAMA_TP_RULES are path regexes — they reach the composite's nested
    llm_model params unchanged (brain encoder replicates)."""
    from frankenstein_tpu.parallel import mesh as mesh_lib
    from frankenstein_tpu.parallel import sharding as shard_lib

    model, params, cfg = tiny
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh((2, 4))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 32, 8)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 300, (4, 8)), jnp.int32)

    _, ref = model.apply(params, x, tgt)

    with mesh:
        tp_params = shard_lib.shard_params(mesh, params,
                                           shard_lib.LLAMA_TP_RULES)
        sx, st = mesh_lib.shard_batch(mesh, x), mesh_lib.shard_batch(mesh, tgt)
        _, out = jax.jit(lambda p, a, t: model.apply(p, a, t))(
            tp_params, sx, st)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    flat = jax.tree_util.tree_flatten_with_path(tp_params)[0]
    sharded = ["/".join(getattr(k, "key", str(k)) for k in p)
               for p, x_ in flat
               if "model" in str(x_.sharding.spec)]
    assert any("llm_model" in s and "q_proj" in s for s in sharded)


@pytest.mark.slow
def test_short_training_descends():
    from frankenstein_tpu.train import trainer

    cfg = tiny_cfg()
    model = FrankyLlama(cfg)
    spec = trainer.TrainableSpec(module=model)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 32, 8)).astype(np.float32)
    y = rng.integers(0, 300, (8, 8)).astype(np.int32)
    d = np.zeros((8,), np.int32)
    batch = (x, y, d)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2, warmup_iters=1,
                       use_scheduler=False)
    state, tx = trainer.init_state(spec, tcfg, batch)
    step = trainer.make_train_step(spec, tx, tcfg)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = []
    for i in range(8):
        state, loss, _ = step(state, jb, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
