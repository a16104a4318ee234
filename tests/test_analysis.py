"""Analysis utilities + date conditioning + GPT layer cropping."""

import numpy as np
import jax
import jax.numpy as jnp

from frankenstein_tpu import analysis
from frankenstein_tpu.config import GPTConfig, MAEConfig
from frankenstein_tpu.models import gpt2
from frankenstein_tpu.models.brainformer import Encoder


def test_dataset_stats():
    brains = [np.zeros((919, 4)), np.zeros((100, 4)), np.zeros((800, 4))]
    stats = analysis.dataset_stats(brains, token_lists=[[1] * 24, [1] * 5, [1] * 10])
    assert stats["max_len"] == 919
    assert stats["n_over_768"] == 2
    assert stats["max_tokens"] == 24
    assert analysis.find_long_samples(brains, 768) == [0, 2]


def test_dimensionality_reduction_methods():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    for method in ("pca", "ica", "nmf"):
        z = analysis.reduce_dimensionality(x, 3, method=method)
        assert z.shape == (50, 3)


def test_crop_gpt_layers_and_block_size():
    cfg = GPTConfig(block_size=32, vocab_size=64, n_layer=4, n_head=2, n_embd=16)
    model = gpt2.GPT(cfg)
    idx = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), idx)

    cropped = analysis.crop_gpt_layers(params, 2)
    small_cfg = cfg.replace(n_layer=2)
    small = gpt2.GPT(small_cfg)
    _, logits = small.apply(cropped, idx)
    assert logits.shape == (1, 1, 64)
    # cropped layers are the FIRST two of the original stack
    np.testing.assert_array_equal(
        np.asarray(cropped["params"]["h"]["c_attn"]["kernel"]),
        np.asarray(params["params"]["h"]["c_attn"]["kernel"][:2]))

    p2, cfg2 = analysis.crop_block_size(params, cfg, 16)
    assert p2["params"]["wpe"].shape[0] == 16 and cfg2.block_size == 16


def test_date_conditioning_changes_output():
    cfg = MAEConfig(window_size=32, n_electrodes=8, patch_size=8, dim=16,
                    n_layers=1, head_dim=8, hidden_dim=32, n_heads=2,
                    n_kv_heads=2, n_sessions=24)
    enc = Encoder(cfg)
    x = jnp.ones((2, 32, 8))
    params = enc.init(jax.random.key(0), x, jnp.zeros((2,), jnp.int32))
    out0 = enc.apply(params, x, jnp.asarray([0, 0]))
    out1 = enc.apply(params, x, jnp.asarray([1, 1]))
    out_none = enc.apply(params, x)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    assert out_none.shape == out0.shape
