"""LLaMA rescorer: forward/loss, cached decode parity, HF import parity,
rescoring picks the higher-probability candidate, and tensor-parallel
execution on a (2, 4) mesh matches single-device output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.models import llama
from frankenstein_tpu.parallel import mesh as mesh_lib
from frankenstein_tpu.parallel import sharding as shard_lib


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.tiny_llama_config()
    model = llama.Llama(cfg)
    idx = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), idx)
    return model, params, cfg


def test_forward_loss_and_gqa(tiny):
    model, params, cfg = tiny
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)))
    tgt = np.asarray(idx).copy()
    tgt[:, 4:] = -100
    loss, logits = model.apply(params, idx, targets=jnp.asarray(tgt))
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert np.isfinite(float(loss))


def test_cached_decode_matches_full(tiny):
    model, params, cfg = tiny
    rng = np.random.default_rng(1)
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 3)))
    prefix = jnp.asarray(rng.standard_normal((2, 2, cfg.dim)), jnp.float32)

    idx = idx0
    for _ in range(4):
        _, logits = model.apply(params, idx, prefix=prefix)
        idx = jnp.concatenate(
            [idx, jnp.argmax(logits[:, -1], -1)[:, None]], axis=1)

    cache = llama.init_llama_cache(cfg, 2, 16)
    logits, cache, length = model.apply(params, idx0, prefix, cache,
                                        method=llama.Llama.prefill)
    toks = [jnp.argmax(logits, -1)]
    for _ in range(3):
        logits, cache, length = model.apply(params, toks[-1], cache, length,
                                            method=llama.Llama.decode_step)
        toks.append(jnp.argmax(logits, -1))
    got = np.stack([np.asarray(t) for t in toks], 1)
    np.testing.assert_array_equal(got, np.asarray(idx[:, 3:]))


def test_hf_llama_import_parity():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLC, LlamaForCausalLM
    hf_cfg = HFLC(vocab_size=96, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, max_position_embeddings=32,
                  rope_theta=10000.0, rms_norm_eps=1e-5,
                  tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params, cfg = llama.params_from_hf_llama(hf)
    model = llama.Llama(cfg)

    rng = np.random.default_rng(2)
    idx = rng.integers(0, 96, (2, 7))
    with torch.no_grad():
        ref = hf(torch.tensor(idx)).logits.numpy()
    _, ours = model.apply(params, jnp.asarray(idx),
                          targets=jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-3)


def test_candidates_from_beams_masks_pad_tail():
    # first EOT and the frozen pad tail behind it become IGNORE_INDEX;
    # beams without EOT pass through untouched
    toks = jnp.asarray([[[5, 9, 9, 3], [1, 2, 3, 4]]], jnp.int32)
    out = llama.candidates_from_beams(toks, eot_id=9)
    assert out.shape == (1, 2, 4)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), [5, -100, -100, -100])
    np.testing.assert_array_equal(np.asarray(out[0, 1]), [1, 2, 3, 4])


def test_rescoring_prefers_probable_sequence(tiny):
    model, params, cfg = tiny
    rng = np.random.default_rng(3)
    # candidate 0: greedy continuation (high prob); candidate 1: random tokens
    idx0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 1)))
    greedy = idx0
    for _ in range(5):
        _, logits = model.apply(params, greedy)
        greedy = jnp.concatenate(
            [greedy, jnp.argmax(logits[:, -1], -1)[:, None]], axis=1)
    random_cand = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)))
    cands = jnp.stack([greedy.astype(jnp.int32),
                       random_cand.astype(jnp.int32)], axis=1)  # [1, 2, 6]
    best, combined = llama.rescore_candidates(model, params, cands)
    assert int(best[0]) == 0
    assert combined.shape == (1, 2)


def test_tensor_parallel_matches_single_device(tiny):
    model, params, cfg = tiny
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh((2, 4))
    rng = np.random.default_rng(4)
    idx = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 6)))

    _, ref = model.apply(params, idx, targets=idx)

    with mesh:
        tp_params = shard_lib.shard_params(mesh, params,
                                           shard_lib.LLAMA_TP_RULES)
        sharded_idx = mesh_lib.shard_batch(mesh, idx)
        _, out = jax.jit(lambda p, i: model.apply(p, i, targets=i))(
            tp_params, sharded_idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # verify the rules actually sharded something over 'model'
    flat = jax.tree_util.tree_flatten_with_path(tp_params)[0]
    sharded = ["/".join(getattr(k, "key", str(k)) for k in p)
               for p, x in flat
               if "model" in str(x.sharding.spec)]
    assert any("q_proj" in s for s in sharded)
    assert any("down_proj" in s for s in sharded)


def test_llama_moe_mlp():
    """LlamaConfig.moe_experts>0 swaps the SwiGLU for a routed MoE: finite
    loss including the balancing aux, grads to experts and router, and the
    cached decode still matches the full forward."""
    # generous capacity: fixed-capacity MoE couples tokens per dispatch, so
    # prefill(T=7)/full(T=8) caps differ and drops would break exact parity
    cfg = llama.tiny_llama_config(moe_experts=4, moe_k=2, moe_capacity=8.0)
    lm = llama.Llama(cfg)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    params = lm.init(jax.random.key(0), idx)
    layers = params["params"]["layers"]
    assert "moe" in layers and "gate_proj" not in layers
    assert layers["moe"]["w1"].shape == (2, 4, 32, 64)   # [L, E, D, H]

    def loss_fn(p):
        loss, _ = lm.apply(p, idx, targets=idx)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = grads["params"]["layers"]["moe"]
    assert all(np.abs(np.asarray(x)).sum() > 0 for x in (g["w1"], g["wg"]))

    # cached decode parity with the full forward
    _, logits_full = lm.apply(params, idx)
    cache = llama.init_llama_cache(cfg, 2, 16)
    logits_pre, cache, length = lm.apply(params, idx[:, :-1], None, cache,
                                         method=llama.Llama.prefill)
    logits_step, _, _ = lm.apply(params, idx[:, -1], cache, length,
                                 method=llama.Llama.decode_step)
    np.testing.assert_allclose(np.asarray(logits_step),
                               np.asarray(logits_full[:, -1]),
                               atol=2e-4, rtol=2e-4)
