"""Fused pre-norm SwiGLU sublayer kernel (ops/pallas/fused_mlp.py).

Oracle: the literal XLA module chain it replaces — x + SwiGLU(norm(x)) with
nn.Dense dtype-cast numerics (reference:models/brainformer.py:115-124,234-245).
Runs in Pallas interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frankenstein_tpu.models.layers import Block, SwiGLU
from frankenstein_tpu.ops.pallas import fused_mlp

B, T, E, H = 2, 256, 128, 256


def _params(key, e, h, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return dict(
        nw=1.0 + 0.1 * jax.random.normal(ks[0], (e,), jnp.float32),
        nb=0.1 * jax.random.normal(ks[1], (e,), jnp.float32),
        w1=jax.random.normal(ks[2], (e, h), jnp.float32) / np.sqrt(e),
        w3=jax.random.normal(ks[3], (e, h), jnp.float32) / np.sqrt(e),
        w2=jax.random.normal(ks[4], (h, e), jnp.float32) / np.sqrt(h),
    )


@pytest.mark.parametrize("kind", ["layernorm", "rmsnorm"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference_chain(kind, dtype):
    p = _params(jax.random.PRNGKey(0), E, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, E), jnp.float32).astype(dtype)
    nb = None if kind == "rmsnorm" else p["nb"]
    got = fused_mlp.fused_norm_swiglu(x, p["nw"], nb, p["w1"], p["w3"], p["w2"],
                                      kind=kind, interpret=True)
    want = fused_mlp.reference_chain(x, p["nw"], nb, p["w1"], p["w3"], p["w2"],
                                     kind=kind, dtype=dtype)
    assert got.dtype == want.dtype == dtype
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol, rtol=tol)


def test_gradients_match_reference_chain():
    p = _params(jax.random.PRNGKey(2), E, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, E), jnp.float32)

    def loss_fused(x, nw, nb, w1, w3, w2):
        y = fused_mlp.fused_norm_swiglu(x, nw, nb, w1, w3, w2,
                                        kind="layernorm", interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, nw, nb, w1, w3, w2):
        y = fused_mlp.reference_chain(x, nw, nb, w1, w3, w2,
                                      kind="layernorm", dtype=jnp.float32)
        return jnp.sum(jnp.sin(y))

    args = (x, p["nw"], p["nb"], p["w1"], p["w3"], p["w2"])
    g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_block_fused_path_matches_fallback(monkeypatch):
    """Block with the fused gate forced on (interpret) == plain XLA Block."""
    block = Block(dim=E, n_heads=4, head_dim=32, hidden_dim=H, norm="layernorm")
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, E), jnp.float32)
    params = block.init(jax.random.PRNGKey(5), x)
    want = block.apply(params, x)                       # CPU -> fallback chain
    monkeypatch.setattr(fused_mlp, "ENABLED", True)
    monkeypatch.setattr(fused_mlp, "FORCE_INTERPRET", True)
    assert fused_mlp.supported(B, T, E, H, 4)
    got = block.apply(params, x)                        # fused interpret path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_param_tree_unchanged():
    """The Dense-free SwiGLU must reproduce nn.Dense's exact param layout
    (checkpoints + TP sharding rules match on mlp/w{1,2,3}/kernel)."""
    block = Block(dim=E, n_heads=4, head_dim=32, hidden_dim=H, norm="layernorm")
    x = jnp.zeros((1, 8, E))
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    flat = {"/".join(str(k.key) for k in path): v.shape
            for path, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert flat["mlp/w1/kernel"] == (E, H)
    assert flat["mlp/w3/kernel"] == (E, H)
    assert flat["mlp/w2/kernel"] == (H, E)
    assert flat["ln_2/weight"] == (E,)
    assert flat["ln_2/bias"] == (E,)


def test_swiglu_init_matches_dense_init():
    """lecun_normal twin: same distribution family and fan-in scaling as the
    nn.Dense default — check variance statistically."""
    m = SwiGLU(dim=E, hidden_dim=H)
    params = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 4, E)))["params"]
    w1 = np.asarray(params["w1"]["kernel"])
    assert abs(w1.std() - 1.0 / np.sqrt(E)) < 0.1 / np.sqrt(E)
    assert abs(w1.mean()) < 0.01
