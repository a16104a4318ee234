"""BrainFormer family: shape contracts from the reference's smoke cells,
masking invariants, gradient flow, Franky end-to-end loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                     PerceiverConfig)
from frankenstein_tpu.models import brainformer
from frankenstein_tpu.models.franky import Franky


def tiny_mae_cfg(**kw):
    base = dict(window_size=32, n_electrodes=8, patch_size=8, dim=16,
                n_layers=2, head_dim=8, hidden_dim=32, n_heads=2, n_kv_heads=2,
                n_dec_layers=1, decoder_dim=16)
    base.update(kw)
    return MAEConfig(**base)


def test_patch_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 8)).astype(np.float32)
    p = brainformer.to_patches(jnp.asarray(x), 8)
    assert p.shape == (2, 4 * 8, 8)
    back = brainformer.from_patches(p, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), x)

    # token order: token (t_slab, electrode) holds x[t_slab*p:(t_slab+1)*p, e]
    np.testing.assert_array_equal(np.asarray(p)[0, 0], x[0, :8, 0])
    np.testing.assert_array_equal(np.asarray(p)[0, 8 + 3], x[0, 8:16, 3])


def test_encoder_output_shape():
    cfg = tiny_mae_cfg()
    enc = brainformer.Encoder(cfg)
    x = jnp.zeros((2, cfg.window_size, cfg.n_electrodes))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, cfg.block_size, cfg.dim)


def test_masking_indices_partition():
    masked, unmasked = brainformer.masking_indices(jax.random.key(0), 4, 32, 0.75)
    assert masked.shape == (4, 24) and unmasked.shape == (4, 8)
    for b in range(4):
        both = np.concatenate([np.asarray(masked[b]), np.asarray(unmasked[b])])
        np.testing.assert_array_equal(np.sort(both), np.arange(32))
        # sorted within each set (reference:brainformer.py:387-388)
        assert (np.diff(np.asarray(masked[b])) > 0).all()


@pytest.mark.slow
def test_mae_forward_and_grads():
    """Reference smoke cell: MAE on ones returns finite loss
    (reference:notebooks_trainer/train_mae.ipynb)."""
    cfg = tiny_mae_cfg()
    mae = brainformer.MAE(cfg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, cfg.window_size, cfg.n_electrodes)), jnp.float32)
    params = mae.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)

    def loss_fn(p):
        loss, _ = mae.apply(p, x, rngs={"mask": jax.random.key(2)})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter that should learn gets gradient signal
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for _, g in flat)
    assert nonzero >= len(flat) - 2  # pos-emb rows beyond block may be zero


def test_mae_return_preds_shapes():
    cfg = tiny_mae_cfg()
    mae = brainformer.MAE(cfg)
    x = jnp.ones((1, cfg.window_size, cfg.n_electrodes))
    params = mae.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    loss, recon, binary = mae.apply(params, x, return_preds=True,
                                    rngs={"mask": jax.random.key(2)})
    assert recon.shape == x.shape and binary.shape == x.shape
    frac = float(jnp.mean(binary))
    assert abs(frac - 0.75) < 0.05  # 75% masked


def test_brainformer_l1_loss():
    cfg = PerceiverConfig(encoder=tiny_mae_cfg(), n_output_tokens=4,
                          output_dim=12, dim=16, n_layers=1, head_dim=8,
                          hidden_dim=32, n_heads=2, n_kv_heads=2)
    model = brainformer.BrainFormer(cfg)
    x = jnp.ones((2, 32, 8))
    tgt = jnp.zeros((2, 4, 12))
    params = model.init(jax.random.key(0), x, tgt)
    loss, pred = model.apply(params, x, tgt)
    assert pred.shape == (2, 4, 12)
    np.testing.assert_allclose(float(loss), np.abs(np.asarray(pred)).mean(),
                               rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_franky():
    cfg = FrankyConfig(
        brain=PerceiverConfig(encoder=tiny_mae_cfg(), n_output_tokens=4,
                              output_dim=24, dim=16, n_layers=1, head_dim=8,
                              hidden_dim=32, n_heads=2, n_kv_heads=2),
        gpt=GPTConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2,
                      n_embd=24),
        max_tokens=8,
        pad_token_id=63,
    )
    model = Franky(cfg)
    x = jnp.ones((2, 32, 8))
    tgt = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 8)))
    params = model.init(jax.random.key(0), x, tgt)
    return model, params, cfg


@pytest.mark.slow
def test_franky_loss_and_grads(tiny_franky):
    """Reference smoke: Franky loss on random input
    (reference:franky_baseline_gpt2.ipynb cell 7)."""
    model, params, cfg = tiny_franky
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 8)),
                    jnp.float32)
    tgt = np.random.default_rng(2).integers(0, 64, (2, 8))
    tgt[:, 6:] = -100
    loss, logits = model.apply(params, x, jnp.asarray(tgt))
    assert np.isfinite(float(loss))
    assert logits.shape == (2, 8, 64)

    grads = jax.grad(
        lambda p: model.apply(p, x, jnp.asarray(tgt))[0])(params)
    gsum = sum(float(np.abs(np.asarray(g)).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
