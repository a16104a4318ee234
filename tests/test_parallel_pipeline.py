"""Pipeline parallelism (parallel/pipeline.py): forward + gradient parity
with the plain sequential layer stack, on the 8-device CPU mesh.

The reference has no pipeline parallelism (single-node DDP only,
reference:utils/train_utils.py:97-122); the oracle here is the unsharded
scan over all layers — the pipelined result must match it exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from frankenstein_tpu.parallel import pipeline as pp

E, F = 16, 32


def make_layers(n_layers, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w1": jnp.asarray(rng.standard_normal((n_layers, E, F)) * 0.3),
        "b1": jnp.asarray(rng.standard_normal((n_layers, F)) * 0.1),
        "w2": jnp.asarray(rng.standard_normal((n_layers, F, E)) * 0.3),
        "b2": jnp.asarray(rng.standard_normal((n_layers, E)) * 0.1),
    }


def layer_fn(lp, h):
    # residual MLP block: the same shape contract as a transformer block
    y = jnp.tanh(h @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"]
    return h + y


def sequential(params, x):
    def body(carry, lp):
        return layer_fn(lp, carry), None
    out, _ = jax.lax.scan(body, x, params)
    return out


def stage_mesh(n_stages, data=1):
    devs = np.asarray(jax.devices()[:data * n_stages])
    if data > 1:
        return Mesh(devs.reshape(data, n_stages), ("data", pp.STAGE_AXIS))
    return Mesh(devs.reshape(n_stages), (pp.STAGE_AXIS,))


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 1), (8, 3)])
def test_gpipe_matches_sequential(n_stages, n_micro):
    n_layers = 2 * n_stages
    params = make_layers(n_layers)
    rng = np.random.default_rng(1)
    b = n_micro * 2
    x = jnp.asarray(rng.standard_normal((b, E)))

    want = sequential(params, x)
    mesh = stage_mesh(n_stages)
    got = pp.pipelined_apply(mesh, pp.stage_scan(layer_fn), params, x,
                             n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_gradients_match():
    """jax.grad through the pipelined scan (reverse ppermutes inserted by
    autodiff) must equal the sequential gradient — pipelined TRAINING."""
    n_stages, n_micro = 4, 4
    params = make_layers(2 * n_stages)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, E)))
    tgt = jnp.asarray(rng.standard_normal((8, E)))

    def loss_seq(p):
        return jnp.mean((sequential(p, x) - tgt) ** 2)

    mesh = stage_mesh(n_stages)

    def loss_pp(p):
        y = pp.pipelined_apply(mesh, pp.stage_scan(layer_fn), p, x,
                               n_micro=n_micro)
        return jnp.mean((y - tgt) ** 2)

    g_seq = jax.grad(loss_seq)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for k in g_seq:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_seq[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_gpipe_dp_x_pp():
    """2-way data parallel x 4-stage pipeline on one 2x4 mesh."""
    n_stages, n_micro, dp = 4, 2, 2
    params = make_layers(2 * n_stages)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, E)))

    want = sequential(params, x)
    mesh = stage_mesh(n_stages, data=dp)
    got = pp.pipelined_apply(mesh, pp.stage_scan(layer_fn), params, x,
                             n_micro=n_micro, data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_rejects_bad_microbatching():
    params = make_layers(4)
    x = jnp.zeros((6, E))
    mesh = stage_mesh(2)
    with pytest.raises(ValueError):
        pp.pipelined_apply(mesh, pp.stage_scan(layer_fn), params, x,
                           n_micro=4)
