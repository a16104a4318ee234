"""VQ layer + SoundStream codec: causality, shapes, EMA/k-means behavior,
pad-masked loss, perplexity (reference smoke:
``x=zeros(16,768,512); loss,pred = model(x)``, reference:vq_brain.py:12-20)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.config import VQVAEConfig
from frankenstein_tpu.models import vq_brain
from frankenstein_tpu.ops.conv import CausalConv1d, CausalConvTranspose1d
from frankenstein_tpu.ops.vq import VectorQuantize, codebook_perplexity


def small_cfg(**kw):
    base = dict(n_electrodes=16, C=16, D=8, codebook_size=32)
    base.update(kw)
    return VQVAEConfig(**base)


def test_causal_conv_is_causal():
    conv = CausalConv1d(4, kernel_size=5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 20, 3)),
                    jnp.float32)
    params = conv.init(jax.random.key(0), x)
    y1 = conv.apply(params, x)
    x2 = x.at[0, 10:].set(99.0)   # perturb the future
    y2 = conv.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y1[0, :10]), np.asarray(y2[0, :10]),
                               atol=1e-6)
    assert y1.shape == (1, 20, 4)


def test_causal_conv_strided_length():
    conv = CausalConv1d(4, kernel_size=4, stride=2)
    x = jnp.zeros((1, 16, 3))
    params = conv.init(jax.random.key(0), x)
    assert conv.apply(params, x).shape == (1, 8, 4)


def test_causal_transpose_conv_length_and_causality():
    ct = CausalConvTranspose1d(4, kernel_size=4, stride=2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 3)),
                    jnp.float32)
    params = ct.init(jax.random.key(0), x)
    y1 = ct.apply(params, x)
    assert y1.shape == (1, 16, 4)
    x2 = x.at[0, 4:].set(7.0)
    y2 = ct.apply(params, x2)
    # output frames < 4*stride depend only on inputs < 4
    np.testing.assert_allclose(np.asarray(y1[0, :8]), np.asarray(y2[0, :8]),
                               atol=1e-6)


def test_vq_assigns_nearest_and_ema_moves_codebook():
    cfg = small_cfg(kmeans_init=False)
    vq = VectorQuantize(cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 6, cfg.D)),
                    jnp.float32)
    variables = vq.init({"params": jax.random.key(0), "vq": jax.random.key(1)},
                        x, train=False)
    q, idx, commit = vq.apply(variables, x, train=False)
    assert q.shape == x.shape and idx.shape == (4, 6)
    assert float(commit) >= 0

    # training step mutates the codebook
    (q2, idx2, c2), mutated = vq.apply(
        variables, x, train=True, mutable=["vq"], rngs={"vq": jax.random.key(3)})
    assert not np.allclose(np.asarray(mutated["vq"]["codebook"]),
                           np.asarray(variables["vq"]["codebook"]))
    assert bool(mutated["vq"]["initted"])


def test_vq_straight_through_gradient():
    cfg = small_cfg(kmeans_init=False)
    vq = VectorQuantize(cfg)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4, cfg.D)),
                    jnp.float32)
    variables = vq.init({"params": jax.random.key(0), "vq": jax.random.key(1)},
                        x, train=False)

    def f(x):
        q, _, commit = vq.apply(variables, x, train=False)
        return jnp.sum(q) + commit

    g = jax.grad(f)(x)
    # straight-through: dq/dx = identity => grad of sum(q) wrt x ~ 1 + commit term
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_kmeans_init_uses_batch():
    cfg = small_cfg(kmeans_init=True)
    vq = VectorQuantize(cfg)
    rng = np.random.default_rng(4)
    # two well-separated clusters
    x = np.concatenate([rng.standard_normal((50, cfg.D)) + 10,
                        rng.standard_normal((50, cfg.D)) - 10])[None]
    x = jnp.asarray(x, jnp.float32)
    variables = vq.init({"params": jax.random.key(0), "vq": jax.random.key(1)},
                        x, train=False)
    assert not bool(variables["vq"]["initted"])
    (_, idx, _), mutated = vq.apply(
        variables, x, train=True, mutable=["vq"], rngs={"vq": jax.random.key(5)})
    assert bool(mutated["vq"]["initted"])
    # codes actually used (perplexity > 1)
    assert float(codebook_perplexity(idx, cfg.codebook_size)) > 1.5


def test_soundstream_shapes_and_masked_loss():
    cfg = small_cfg()
    model = vq_brain.SoundStream(cfg)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 32, cfg.n_electrodes)).astype(np.float32)
    x[1, 24:] = 0.0   # padded tail
    x = jnp.asarray(x)
    variables = model.init({"params": jax.random.key(0), "vq": jax.random.key(1)},
                           x, train=False)
    (loss, recon), aux = model.apply(variables, x, train=False, mutable=["aux"])
    assert recon.shape == x.shape
    assert np.isfinite(float(loss))
    perp = float(aux["aux"]["perplexity"][0])
    assert 1.0 <= perp <= cfg.codebook_size

    # 4x temporal downsample in the bottleneck
    idx, q = model.apply(variables, x, method=vq_brain.SoundStream.get_quantize_vectors)
    assert idx.shape == (2, 8)
    assert q.shape == (2, 8, cfg.D)


def test_masked_l1_ignores_padded_rows():
    gt = np.zeros((1, 4, 3), np.float32)
    gt[0, :2] = 1.0
    pred = np.zeros((1, 4, 3), np.float32)
    pred[0, 2:] = 100.0   # error only on padded rows -> ignored
    loss = vq_brain.masked_l1_loss(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)
