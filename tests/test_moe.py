"""MoE SwiGLU layer (models/moe.py): routing semantics vs a slow per-token
oracle, capacity dropping, load-balance loss, gradient sanity, and
expert-parallel sharding parity on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from frankenstein_tpu.models.moe import MoESwiGLU
from frankenstein_tpu.parallel import sharding as shard_lib

D, F, E = 8, 16, 4


def make(k=2, cap=8.0, mesh_axis=None, n_experts=E):
    return MoESwiGLU(dim=D, hidden_dim=F, n_experts=n_experts, k=k,
                     capacity_factor=cap, mesh_axis=mesh_axis)


def init_and_apply(model, x, seed=0):
    params = model.init(jax.random.key(seed), x)
    y, aux = model.apply(params, x)
    return params, y, aux


def oracle(params, x, k):
    """Per-token python loop: route to top-k, run each expert's SwiGLU,
    combine with renormalized gates. Generous capacity assumed (no drops)."""
    p = params["params"]
    xt = np.asarray(x).reshape(-1, D)
    probs = jax.nn.softmax(jnp.asarray(xt) @ p["wg"], axis=-1)
    probs = np.asarray(probs)
    out = np.zeros_like(xt)
    for n in range(xt.shape[0]):
        top = np.argsort(-probs[n])[:k]
        gates = probs[n][top] / probs[n][top].sum()
        for g, e in zip(gates, top):
            h = (np.asarray(jax.nn.silu(jnp.asarray(xt[n] @ p["w1"][e])))
                 * (xt[n] @ p["w3"][e]))
            out[n] += g * (h @ p["w2"][e])
    return out.reshape(np.asarray(x).shape)


def test_matches_per_token_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, D)), jnp.float32)
    model = make(k=2, cap=50.0)  # capacity >> tokens: nothing dropped
    params, y, aux = init_and_apply(model, x)
    want = oracle(params, x, k=2)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_top1_switch_routing():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, D)), jnp.float32)
    model = make(k=1, cap=50.0)
    params, y, aux = init_and_apply(model, x)
    want = oracle(params, x, k=1)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_capacity_drops_overflow_tokens():
    """With capacity_factor tiny, an oversubscribed expert keeps only its
    first ``cap`` tokens (in token order); dropped tokens output zero."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, D)), jnp.float32)
    mfull = make(k=1, cap=100.0)
    params, y_full, _ = init_and_apply(mfull, x)
    mtiny = make(k=1, cap=1.0 / 4)  # cap = 16*1/4/4 = 1 slot per expert
    y_tiny, _ = mtiny.apply(params, x)

    probs = jax.nn.softmax(
        np.asarray(x).reshape(-1, D) @ np.asarray(params["params"]["wg"]), -1)
    first = np.asarray(jnp.argmax(jnp.asarray(probs), -1))
    seen = set()
    for n in range(16):
        e = int(first[n])
        if e in seen:  # overflowed: output must be exactly zero
            np.testing.assert_allclose(np.asarray(y_tiny)[0, n], 0.0,
                                       atol=1e-6)
        else:
            seen.add(e)
            np.testing.assert_allclose(np.asarray(y_tiny)[0, n],
                                       np.asarray(y_full)[0, n],
                                       rtol=1e-4, atol=1e-5)


def test_aux_loss_uniform_router_is_one():
    """Switch loss == 1.0 when routing is perfectly uniform."""
    model = make(k=1, n_experts=2)
    x = jnp.zeros((1, 8, D))  # zero input -> uniform softmax
    params = model.init(jax.random.key(0), x)
    # zero the router so probs are exactly uniform and argmax ties resolve
    # deterministically; aux = E * sum_e (frac_e * 1/E) = E * 1/E = ... with
    # all-to-expert-0 fractions: E * (1 * 1/E) = 1
    params = jax.tree_util.tree_map(lambda a: a * 0, params)
    _, aux = model.apply(params, x)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_gradients_finite_and_router_learns():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 8, D)), jnp.float32)
    model = make(k=2, cap=2.0)
    params = model.init(jax.random.key(1), x)

    def loss(p):
        y, aux = model.apply(p, x)
        return jnp.mean((y - tgt) ** 2) + 0.01 * aux

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # router grad must be nonzero (gates are differentiable through combine)
    assert float(jnp.max(jnp.abs(g["params"]["wg"]))) > 0


def test_expert_parallel_matches_unsharded():
    """Experts sharded over a mesh axis (EP): identical outputs."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, D)), jnp.float32)
    model = make(k=2, cap=4.0)
    params, y_ref, aux_ref = init_and_apply(model, x)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("data", "model"))
    model_ep = make(k=2, cap=4.0, mesh_axis="model")
    p_ep = shard_lib.shard_params(mesh, params, shard_lib.MOE_EP_RULES)
    w1 = p_ep["params"]["w1"]
    assert w1.sharding.spec == P("model", None, None)
    with mesh:
        y_ep, aux_ep = jax.jit(model_ep.apply)(p_ep, x)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-5)
