"""Attention backends: XLA path vs naive numpy; Pallas slab kernel (interpret
mode on CPU) vs XLA path, forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.ops import attention, masks
from frankenstein_tpu.ops.pallas import block_attention


def naive_attention(q, k, v, mask=None):
    b, tq, h, d = q.shape
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    if mask is not None:
        logits = np.where(mask, logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", w, v)


def rand_qkv(rng, b, t, h, d, tk=None):
    tk = tk or t
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    v = rng.standard_normal((b, tk, h, d)).astype(np.float32)
    return q, k, v


def test_xla_dense_matches_naive():
    rng = np.random.default_rng(0)
    q, k, v = rand_qkv(rng, 2, 16, 2, 8)
    out = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla"))
    np.testing.assert_allclose(out, naive_attention(q, k, v), atol=1e-5)


def test_xla_causal_matches_naive():
    rng = np.random.default_rng(1)
    q, k, v = rand_qkv(rng, 2, 12, 2, 8)
    m = np.asarray(masks.causal_mask(12, 12))[None, None]
    out = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_mode="causal", impl="xla"))
    np.testing.assert_allclose(out, naive_attention(q, k, v, m), atol=1e-5)


def test_xla_slab_matches_naive():
    rng = np.random.default_rng(2)
    q, k, v = rand_qkv(rng, 1, 24, 2, 8)
    m = np.asarray(masks.block_causal_mask(24, 8))[None, None]
    out = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_mode="slab", tok_per_time=8, impl="xla"))
    np.testing.assert_allclose(out, naive_attention(q, k, v, m), atol=1e-5)


def test_explicit_mask_combines_with_padding():
    rng = np.random.default_rng(3)
    q, k, v = rand_qkv(rng, 2, 10, 1, 4)
    valid = np.ones((2, 10), bool)
    valid[0, 7:] = False
    pair = np.asarray(masks.self_attention_padding_mask(jnp.asarray(valid)))
    out = np.asarray(attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=jnp.asarray(pair), impl="xla"))
    ref = naive_attention(q, k, v, pair[:, None])
    # padded queries produce garbage rows in both (softmax over -inf) — compare valid rows
    np.testing.assert_allclose(out[:, :7], ref[:, :7], atol=1e-5)


@pytest.mark.parametrize("t,p,h,d", [(64, 16, 2, 32), (96, 8, 1, 16)])
def test_pallas_slab_forward_matches_xla(t, p, h, d):
    rng = np.random.default_rng(4)
    q, k, v = rand_qkv(rng, 2, t, h, d)
    ref = attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_mode="slab", tok_per_time=p, impl="xla")
    out = block_attention.slab_causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_slab_grads_match_xla():
    rng = np.random.default_rng(5)
    t, p, h, d = 32, 8, 2, 16
    q, k, v = rand_qkv(rng, 1, t, h, d)

    def loss_pallas(q, k, v):
        o = block_attention.slab_causal_attention(q, k, v, p, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        o = attention.dot_product_attention(q, k, v, mask_mode="slab",
                                            tok_per_time=p, impl="xla")
        return jnp.sum(jnp.sin(o))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_cached_attention_matches_full():
    """Decode path: attending over a half-filled cache == full attention over
    the valid prefix."""
    rng = np.random.default_rng(6)
    b, s, h, d = 2, 16, 2, 8
    valid_len = 9
    q = rng.standard_normal((b, 1, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k_cache, v_cache = k.copy(), v.copy()
    k_cache[:, valid_len:] = 123.0   # garbage beyond cache_len must not matter
    v_cache[:, valid_len:] = -55.0

    out = np.asarray(attention.cached_attention(
        jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.full((b,), valid_len)))
    ref = naive_attention(q, k[:, :valid_len], v[:, :valid_len])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_dense_matches_xla():
    rng = np.random.default_rng(7)
    q, k, v = rand_qkv(rng, 2, 64, 2, 16)
    ref = attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
    out = block_attention.dense_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_dense_grads_match_xla():
    rng = np.random.default_rng(8)
    q, k, v = rand_qkv(rng, 1, 32, 2, 8)

    def lp(q, k, v):
        return jnp.sum(jnp.sin(block_attention.dense_flash_attention(
            q, k, v, tile=8, interpret=True)))

    def lx(q, k, v):
        return jnp.sum(jnp.sin(attention.dot_product_attention(
            q, k, v, impl="xla")))

    gp = jax.grad(lp, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gx = jax.grad(lx, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("block", [128, 256])
def test_pallas_production_tiling_forward_and_grads(block):
    """Flagship tiling path off-TPU: t a multiple of 1024 so _pick_qblock/
    _pick_chunk select the production (qb=1024, chunk=1024) schedule and the
    triangle-pair enumeration + scalar-prefetch index maps run multi-pair
    programs — regressions here previously only surfaced on real hardware."""
    assert block_attention._pick_qblock(2048, block) == 1024
    assert block_attention._pick_chunk(2048, block) == 1024

    rng = np.random.default_rng(9)
    t, h, d = 2048, 1, 32
    q, k, v = rand_qkv(rng, 1, t, h, d)
    ref = attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_mode="slab", tok_per_time=block, impl="xla")
    out = block_attention.slab_causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def lp(q, k, v):
        return jnp.sum(jnp.sin(block_attention.slab_causal_attention(
            q, k, v, block, interpret=True)))

    def lx(q, k, v):
        return jnp.sum(jnp.sin(attention.dot_product_attention(
            q, k, v, mask_mode="slab", tok_per_time=block, impl="xla")))

    gp = jax.grad(lp, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gx = jax.grad(lx, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_packed_forward_matches_xla():
    """Head-packed (P=4, blockdiag-K) forward path: shapes with h%4==0,
    d=32, t%1024==0 ride the packed kernel (bit-identical to the per-head
    kernel on TPU; here vs the XLA oracle in interpret mode), fwd + grads."""
    rng = np.random.default_rng(13)
    t, p, h, d = 2048, 256, 4, 32
    assert block_attention._pack_plan(t, d, h, p) == (4, 512, 1024)
    q, k, v = rand_qkv(rng, 1, t, h, d)
    ref = attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_mode="slab", tok_per_time=p, impl="xla")
    out = block_attention.slab_causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # grads: packed fwd emits the lse the (per-head) backward consumes
    def lp(q, k, v):
        return jnp.sum(jnp.sin(block_attention.slab_causal_attention(
            q, k, v, p, interpret=True)))

    def lx(q, k, v):
        return jnp.sum(jnp.sin(attention.dot_product_attention(
            q, k, v, mask_mode="slab", tok_per_time=p, impl="xla")))

    gp = jax.grad(lp, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gx = jax.grad(lx, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_packed_dense_matches_xla():
    """Non-causal (MAE decoder) shape on the packed path."""
    rng = np.random.default_rng(14)
    t, h, d = 1024, 4, 32
    q, k, v = rand_qkv(rng, 1, t, h, d)
    ref = attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
    out = block_attention.dense_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tile=256,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def sorted_subset(rng, b, n_full, n_keep):
    pos = np.stack([np.sort(rng.choice(n_full, size=n_keep, replace=False))
                    for _ in range(b)]).astype(np.int32)
    return pos


@pytest.mark.parametrize("n_full,n_keep,p", [(512, 256, 32), (1024, 256, 128)])
def test_gathered_slab_kernel_matches_xla(n_full, n_keep, p):
    """MAE kept-token path: kernel with position-tile masks == XLA with the
    dense mask built from positions (reference:brainformer.py:392-413 gathers
    a materialized submatrix; both paths here are O(1)-mask)."""
    rng = np.random.default_rng(10)
    b, h, d = 2, 2, 32
    pos = sorted_subset(rng, b, n_full, n_keep)
    q, k, v = rand_qkv(rng, b, n_keep, h, d)
    m = np.asarray(masks.block_causal_mask_from_positions(
        jnp.asarray(pos), jnp.asarray(pos), p))[:, None]
    ref = naive_attention(q, k, v, m)
    out = block_attention.gathered_slab_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos), p,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_gathered_slab_grads_match_xla():
    rng = np.random.default_rng(11)
    b, n_full, n_keep, p, h, d = 1, 256, 128, 16, 2, 16
    pos = jnp.asarray(sorted_subset(rng, b, n_full, n_keep))
    q, k, v = map(jnp.asarray, rand_qkv(rng, b, n_keep, h, d))

    def lp(q, k, v):
        o = block_attention.gathered_slab_attention(q, k, v, pos, p,
                                                    interpret=True)
        return jnp.sum(jnp.sin(o))

    def lx(q, k, v):
        o = attention.dot_product_attention(q, k, v,
                                            mask_mode="gathered_slab",
                                            positions=pos, tok_per_time=p,
                                            impl="xla")
        return jnp.sum(jnp.sin(o))

    gp = jax.grad(lp, (0, 1, 2))(q, k, v)
    gx = jax.grad(lx, (0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_gathered_dispatch_falls_back_on_cpu():
    """dot_product_attention(mask_mode='gathered_slab') must produce the same
    values whether the kernel qualifies or the XLA fallback runs."""
    rng = np.random.default_rng(12)
    b, n_keep, p = 2, 128, 16
    pos = jnp.asarray(sorted_subset(rng, b, 512, n_keep))
    q, k, v = map(jnp.asarray, rand_qkv(rng, b, n_keep, 2, 16))
    via_dispatch = attention.dot_product_attention(
        q, k, v, mask_mode="gathered_slab", positions=pos, tok_per_time=p)
    via_kernel = block_attention.gathered_slab_attention(q, k, v, pos, p,
                                                         interpret=True)
    np.testing.assert_allclose(np.asarray(via_dispatch),
                               np.asarray(via_kernel), atol=3e-5)


def test_supported_accepts_flagship_shape():
    """The production gate must admit the flagship geometry (b=128 h=8 t=6144
    d=32, slab 256) — and reject shapes the kernel can't tile."""
    q = jnp.zeros((1, 6144, 1, 32), jnp.bfloat16)
    assert block_attention.supported(q, q, 256, interpret=True)
    assert not block_attention.supported(q, q, 100, interpret=True)  # %128
    q2 = jnp.zeros((1, 6000, 1, 32), jnp.bfloat16)                   # t%tile
    assert not block_attention.supported(q2, q2, 256, interpret=True)


def test_folded_slab_attention_matches_unfolded():
    """slab_attention_folded on [B, T, E] (packed kernel in interpret mode)
    == per-head dot_product_attention, forward and grads."""
    rng = np.random.default_rng(21)
    t, p, h, d = 2048, 256, 8, 32
    e = h * d
    q, k, v = rand_qkv(rng, 1, t, h, d)
    fold = lambda a: jnp.asarray(a).reshape(1, t, e)
    ref = attention.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_mode="slab", tok_per_time=p, impl="xla")
    out = attention.slab_attention_folded(fold(q), fold(k), fold(v),
                                          n_heads=h, tok_per_time=p,
                                          impl="pallas")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).reshape(1, t, e), atol=3e-5)

    def lf(q, k, v):
        o = attention.slab_attention_folded(q, k, v, n_heads=h,
                                            tok_per_time=p, impl="pallas")
        return jnp.sum(jnp.sin(o))

    def lx(q, k, v):
        o = attention.dot_product_attention(
            q.reshape(1, t, h, d), k.reshape(1, t, h, d),
            v.reshape(1, t, h, d), mask_mode="slab", tok_per_time=p,
            impl="xla")
        return jnp.sum(jnp.sin(o))

    gf = jax.grad(lf, (0, 1, 2))(fold(q), fold(k), fold(v))
    gx = jax.grad(lx, (0, 1, 2))(fold(q), fold(k), fold(v))
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_rope_fused_matches_rope_plus_slab():
    """The rope-fused [B, T, E] kernel (RoPE rotated IN KERNEL, production
    qb=512/chunk=1024 tiling) must match apply_rope + the XLA slab oracle —
    forward and grads (the bwd path rotates with the folded XLA rope, runs
    the triangle bwd kernels, and rotates dq/dk back by R(-theta))."""
    from frankenstein_tpu.ops import rope as rope_ops
    from frankenstein_tpu.ops.pallas import block_attention

    rng = np.random.default_rng(33)
    b, t, h, d, p = 2, 2048, 8, 32, 256
    e = h * d
    assert block_attention.rope_fused_supported(b, t, e, h, p, 4,
                                                interpret=True)
    q = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.3
    k, v = q * 1.01, q * 0.99
    cache = rope_ops.build_rope_cache(d, t)
    r4 = lambda x: x.reshape(b, t, h, d)

    out = block_attention.slab_causal_attention_rope(q, k, v, p, cache, h,
                                                     interpret=True)
    qr = rope_ops.apply_rope(r4(q), cache)
    kr = rope_ops.apply_rope(r4(k), cache)
    ref = attention.dot_product_attention(qr, kr, r4(v), mask_mode="slab",
                                          tok_per_time=p, impl="xla"
                                          ).reshape(b, t, e)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    w = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)

    def lf(q, k, v):
        o = block_attention.slab_causal_attention_rope(q, k, v, p, cache, h,
                                                       interpret=True)
        return jnp.sum(o * w)

    def lx(q, k, v):
        qr = rope_ops.apply_rope(r4(q), cache)
        kr = rope_ops.apply_rope(r4(k), cache)
        o = attention.dot_product_attention(qr, kr, r4(v), mask_mode="slab",
                                            tok_per_time=p, impl="xla")
        return jnp.sum(o.reshape(b, t, e) * w)

    gf = jax.grad(lf, (0, 1, 2))(q, k, v)
    gx = jax.grad(lx, (0, 1, 2))(q, k, v)
    for a, bb in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4)


def test_rope_fused_dispatch_falls_back_off_tpu():
    """slab_attention_rope_fused must produce oracle results through the
    fallback chain when the kernel gate rejects (CPU backend)."""
    from frankenstein_tpu.ops import rope as rope_ops

    rng = np.random.default_rng(34)
    b, t, h, d, p = 1, 512, 8, 32, 128
    e = h * d
    q = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.3
    cache = rope_ops.build_rope_cache(d, t)
    out = attention.slab_attention_rope_fused(q, k, v, n_heads=h,
                                              tok_per_time=p, rope_cache=cache)
    r4 = lambda x: x.reshape(b, t, h, d)
    qr = rope_ops.apply_rope(r4(q), cache)
    kr = rope_ops.apply_rope(r4(k), cache)
    ref = attention.dot_product_attention(qr, kr, r4(v), mask_mode="slab",
                                          tok_per_time=p, impl="xla"
                                          ).reshape(b, t, e)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _qk_int8_setup(seed=57, b=2, t=2048, h=8, d=32, p=256):
    """Flagship-geometry (scaled-t) inputs for the qk_int8 drift tests.

    Uses realistic activation magnitudes (unit-normal rows) — max-abs
    symmetric int8 quantization drift is relative to the per-(row, head)
    dynamic range, so these bounds transfer to the production shape."""
    from frankenstein_tpu.ops import rope as rope_ops

    rng = np.random.default_rng(seed)
    e = h * d
    assert block_attention.rope_fused_supported(b, t, e, h, p, 4,
                                                interpret=True)
    q = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    v = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.5
    cache = rope_ops.build_rope_cache(d, t)
    return q, k, v, cache, p, h


def test_rope_fused_qk_int8_forward_tolerance():
    """qk_int8=True vs exact (qk_int8=False) forward drift at slab geometry:
    int8 symmetric max-abs QK quantization is serving-grade — outputs stay
    within ~1e-2 absolute of the exact kernel on unit-scale activations
    (the attention output is a convex combination of V rows, so output
    error is bounded by the softmax-weight perturbation)."""
    q, k, v, cache, p, h = _qk_int8_setup()
    exact = block_attention.slab_causal_attention_rope(
        q, k, v, p, cache, h, interpret=True)
    quant = block_attention.slab_causal_attention_rope(
        q, k, v, p, cache, h, interpret=True, qk_int8=True)
    err = np.abs(np.asarray(quant) - np.asarray(exact))
    assert float(err.max()) < 1e-2, f"max drift {err.max():.4g}"
    assert float(err.mean()) < 1e-3, f"mean drift {err.mean():.4g}"
    # and it must actually differ from the exact path (the int8 dot ran,
    # not a silent bf16 fallback)
    assert float(err.max()) > 0.0


def test_rope_fused_qk_int8_grad_tolerance():
    """qk_int8 gradients are approximately straight-through: the bwd
    recomputes exact bf16 scores against the QUANTIZED forward's out/lse
    residuals, so grads deviate from the true exact-path grads by a bound
    set by the quantization error (~2e-2 relative at unit scale)."""
    q, k, v, cache, p, h = _qk_int8_setup(seed=58, t=1024)
    w = jnp.asarray(np.random.default_rng(59).standard_normal(q.shape),
                    jnp.float32)

    def loss(qk_int8):
        def f(q, k, v):
            o = block_attention.slab_causal_attention_rope(
                q, k, v, p, cache, h, interpret=True, qk_int8=qk_int8)
            return jnp.sum(o * w)
        return f

    g_exact = jax.grad(loss(False), (0, 1, 2))(q, k, v)
    g_quant = jax.grad(loss(True), (0, 1, 2))(q, k, v)
    for a, b_ in zip(g_quant, g_exact):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = np.abs(b_).max() + 1e-12
        rel = np.abs(a - b_).max() / denom
        assert rel < 2e-2, f"grad drift {rel:.4g}"


def test_qk_int8_fallback_signals():
    """qk_int8 on a non-qualifying path must WARN (and raise under
    FK_QK_INT8_STRICT=1), never silently compute bf16 (ADVICE r3)."""
    import warnings

    from frankenstein_tpu.ops import rope as rope_ops

    rng = np.random.default_rng(60)
    b, t, h, d, p = 1, 512, 8, 32, 128
    e = h * d
    q = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32) * 0.3
    cache = rope_ops.build_rope_cache(d, t)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = attention.slab_attention_rope_fused(
            q, q, q, n_heads=h, tok_per_time=p, rope_cache=cache,
            qk_int8=True)  # CPU backend -> gate rejects -> fallback
    assert out.shape == (b, t, e)
    assert any("qk_int8" in str(w.message) for w in rec)

    import os
    os.environ["FK_QK_INT8_STRICT"] = "1"
    try:
        with pytest.raises(ValueError, match="qk_int8"):
            attention.slab_attention_rope_fused(
                q, q, q, n_heads=h, tok_per_time=p, rope_cache=cache,
                qk_int8=True)
    finally:
        del os.environ["FK_QK_INT8_STRICT"]


@pytest.mark.parametrize("t,p,dtype", [(2048, 256, np.float32),
                                        (2048, 512, np.float32),
                                        (2048, 256, "bfloat16")])
def test_packed_bwd_matches_per_head_bwd(t, p, dtype):
    """The head-packed backward (_bwd_packed: dense [NB, T, P*D] tiles, all
    four dots block-diagonal staged) must match the per-head triangle
    backward (_bwd) on the same residuals — tight tolerance rather than
    bit-exact (the packed dots' accumulation trees interleave exact zeros
    around the same addends). Covers f32 and the production bf16 dtype
    and two slab sizes."""
    rng = np.random.default_rng(31)
    h, d = 8, 32
    e = h * d
    b = 1
    npack = block_attention.PACK_LANES // d
    ng = h // npack
    pd = npack * d
    q, k, v = rand_qkv(rng, b, t, h, d)
    cast = lambda a: jnp.asarray(a).astype(jnp.bfloat16) if dtype == "bfloat16" else jnp.asarray(a)
    fold = lambda a: cast(a).reshape(b, t, e)
    pk = lambda x: block_attention._pack_groups(fold(x), ng, pd)
    q4, k4, v4 = pk(q), pk(k), pk(v)
    scale = 1.0 / (d ** 0.5)

    out4, lse4 = block_attention._packed_call_single(
        q4, k4, v4, block=p, scale=scale, interpret=True, causal=True,
        npack=npack, qb=512, chunk=1024)
    do4 = pk(rng.standard_normal((b, t, h, d)).astype(np.float32))

    got = block_attention._bwd_packed(
        q4, k4, v4, out4, do4, lse4, block=p, scale=scale, interpret=True,
        causal=True, npack=npack, d=d)

    nb = b * ng
    to3 = lambda x4: jnp.transpose(
        x4.reshape(nb, t, npack, d), (0, 2, 1, 3)).reshape(nb * npack, t, d)
    lse = lse4.reshape(nb * npack, t)[:, None, :]
    want = block_attention._bwd(
        to3(q4), to3(k4), to3(v4), to3(out4), to3(do4), lse,
        block=p, scale=scale, interpret=True, causal=True)
    to4 = lambda x3: jnp.transpose(
        x3.reshape(nb, npack, t, d), (0, 2, 1, 3)).reshape(nb, t, pd)
    tol = dict(atol=2e-5, rtol=1e-5) if dtype == np.float32 else \
        dict(atol=3e-2, rtol=3e-2)   # bf16 operand rounding
    for g, w in zip(got, (to4(x) for x in want)):
        np.testing.assert_allclose(np.asarray(g).astype(np.float32),
                                   np.asarray(w).astype(np.float32), **tol)


def test_packed_bwd_gate_accepts_flagship():
    """The hardware gate admits the flagship training shape (bf16, t=6144,
    block=256, d=32) and rejects unalignable t."""
    assert block_attention._bwd_packed_supported(6144, 32, 4, 2, 256)
    assert not block_attention._bwd_packed_supported(6144 + 512, 32, 4, 2,
                                                     256)  # t % 1024 != 0
    assert not block_attention._bwd_packed_supported(6144, 128, 1, 2, 256)


def test_dense_flash_grads_packed_bwd_match_xla():
    """dense_flash_attention (the MAE decoder's kernel) at a shape that
    qualifies for the packed backward (h=8, d=32, t % 1024 == 0,
    causal=False): grads must match the XLA dense oracle."""
    rng = np.random.default_rng(33)
    t, h, d = 1024, 8, 32
    q, k, v = rand_qkv(rng, 1, t, h, d)

    def lp(q, k, v):
        o = block_attention.dense_flash_attention(q, k, v, tile=256,
                                                  interpret=True)
        return jnp.sum(jnp.sin(o))

    def lx(q, k, v):
        o = attention.dot_product_attention(q, k, v, impl="xla")
        return jnp.sum(jnp.sin(o))

    gp = jax.grad(lp, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v))
    gx = jax.grad(lx, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v))
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
