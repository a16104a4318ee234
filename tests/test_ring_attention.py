"""Ring attention (parallel/ring_attention.py): parity with dense attention
over the global sequence, on the 8-device CPU mesh, for all three mask
patterns the models use — plus gradient parity (sequence-parallel training).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from frankenstein_tpu.parallel import ring_attention as ra


def dense_oracle(q, k, v, causal, slab):
    """Straightforward full-sequence softmax attention (numpy-style)."""
    b, t, h, d = q.shape
    sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) / np.sqrt(d)
    pos = np.arange(t)
    if slab is not None:
        mask = (pos[:, None] // slab) >= (pos[None, :] // slab)
    elif causal:
        mask = pos[:, None] >= pos[None, :]
    else:
        mask = np.ones((t, t), bool)
    sc = jnp.where(jnp.asarray(mask)[None, None], sc, ra.NEG_INF)
    p = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def seq_mesh(n, data=1):
    devs = np.asarray(jax.devices()[:data * n])
    if data > 1:
        return Mesh(devs.reshape(data, n), ("data", ra.SEQ_AXIS))
    return Mesh(devs.reshape(n), (ra.SEQ_AXIS,))


def rand_qkv(b, t, h, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal,slab", [(False, None), (True, None),
                                         (False, 16)])
def test_ring_matches_dense(causal, slab):
    b, t, h, d = 2, 64, 2, 8
    q, k, v = rand_qkv(b, t, h, d)
    want = dense_oracle(q, k, v, causal, slab)
    mesh = seq_mesh(8)
    got = ra.ring_attention_sharded(mesh, q, k, v, causal=causal, slab=slab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_gradients_match():
    """Sequence-parallel training: autodiff through the ring (reverse
    ppermutes) must reproduce the dense attention gradient."""
    b, t, h, d = 1, 32, 2, 8
    q, k, v = rand_qkv(b, t, h, d, seed=3)
    mesh = seq_mesh(4)

    def loss_dense(qkv):
        return jnp.sum(dense_oracle(*qkv, True, None) ** 2)

    def loss_ring(qkv):
        q, k, v = qkv
        return jnp.sum(
            ra.ring_attention_sharded(mesh, q, k, v, causal=True)
            .astype(jnp.float32) ** 2)

    gd = jax.grad(loss_dense)((q, k, v))
    gr = jax.jit(jax.grad(loss_ring))((q, k, v))
    for a, b_ in zip(gd, gr):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_ring_slab_causal_first_slab_sees_itself():
    """Every query attends at least its own slab — no NaNs from fully-masked
    rows even on the first shard."""
    b, t, h, d = 1, 64, 1, 8
    q, k, v = rand_qkv(b, t, h, d, seed=5)
    mesh = seq_mesh(8)
    out = ra.ring_attention_sharded(mesh, q, k, v, slab=8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ring_rejects_indivisible_sequence():
    mesh = seq_mesh(8)
    q = jnp.zeros((1, 60, 1, 8))
    with pytest.raises(ValueError):
        ra.ring_attention_sharded(mesh, q, q, q)


def test_encoder_seq_parallel_matches_single_device():
    """MAEConfig.seq_parallel routes the Encoder's slab attention through
    ring attention when a 'seq' mesh is active — output must match the
    single-device encoder (same params) to fp tolerance."""
    from frankenstein_tpu.config import MAEConfig
    from frankenstein_tpu.models.brainformer import Encoder

    cfg = MAEConfig(window_size=32, n_electrodes=8, patch_size=8, dim=32,
                    n_layers=2, head_dim=8, hidden_dim=64, n_heads=4,
                    n_kv_heads=4, seq_parallel=True)
    model = Encoder(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    ref = model.apply(params, x)                  # no mesh -> normal path
    with seq_mesh(8):
        out = jax.jit(model.apply)(params, x)     # ring path over 8 shards
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_encoder_seq_parallel_grads_match():
    from frankenstein_tpu.config import MAEConfig
    from frankenstein_tpu.models.brainformer import Encoder

    cfg = MAEConfig(window_size=32, n_electrodes=8, patch_size=8, dim=32,
                    n_layers=1, head_dim=8, hidden_dim=64, n_heads=4,
                    n_kv_heads=4, seq_parallel=True)
    model = Encoder(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    def loss(p, x):
        return jnp.mean(model.apply(p, x) ** 2)

    g_ref = jax.grad(loss)(params, x)
    with seq_mesh(8):
        g_sp = jax.jit(jax.grad(loss))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)
