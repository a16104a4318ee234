"""RoPE: real sin/cos formulation must equal the reference's complex-multiply
formulation (reference:models/brainformer.py:56-91)."""

import numpy as np
import jax.numpy as jnp
import pytest

from frankenstein_tpu.ops import rope


def complex_reference_rope(x, seq_len, theta, align):
    """Numpy complex re-statement of the reference math."""
    b, t, h, d = x.shape
    freqs = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    angles = np.outer(np.arange(seq_len), freqs)
    cache = np.exp(1j * angles)                    # polar(1, angles)
    cache = cache[-t:] if align == "suffix" else cache[:t]
    xc = x.astype(np.float64).reshape(b, t, h, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * cache[None, :, None, :]
    res = np.stack([out.real, out.imag], axis=-1).reshape(b, t, h, d)
    return res.astype(np.float32)


@pytest.mark.parametrize("align", ["suffix", "prefix"])
@pytest.mark.parametrize("t,seq_len", [(16, 16), (10, 16)])
def test_rope_matches_complex_formulation(align, t, seq_len):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, t, 3, 32)).astype(np.float32)
    cache = rope.build_rope_cache(32, seq_len, theta=10000.0)
    ours = np.asarray(rope.apply_rope(jnp.asarray(x), cache, align=align))
    ref = complex_reference_rope(x, seq_len, 10000.0, align)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_rope_per_position_gather():
    """MAE gathers rope rows for unmasked positions
    (reference:models/brainformer.py:430-434): gathered table == gathering
    the rotated result."""
    rng = np.random.default_rng(2)
    seq_len, d = 24, 16
    x_full = rng.standard_normal((1, seq_len, 2, d)).astype(np.float32)
    cache = rope.build_rope_cache(d, seq_len)
    full = np.asarray(rope.apply_rope(jnp.asarray(x_full), cache, align="prefix"))

    idx = np.sort(rng.choice(seq_len, size=10, replace=False))
    gathered_cache = rope.rope_for_positions(cache, jnp.asarray(idx[None]))
    sub = np.asarray(rope.apply_rope(jnp.asarray(x_full[:, idx]), gathered_cache))
    np.testing.assert_allclose(sub, full[:, idx], atol=1e-6)


def test_rope_preserves_norm():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 4, 64)).astype(np.float32)
    cache = rope.build_rope_cache(64, 8)
    y = np.asarray(rope.apply_rope(jnp.asarray(x), cache))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_folded_rope_matches_unfolded():
    """apply_rope_folded on [B, T, H*D] == apply_rope on [B, T, H, D] for
    both alignments (the folded path never unfolds heads)."""
    import jax.numpy as jnp
    from frankenstein_tpu.ops import rope as rope_ops
    rng = np.random.default_rng(3)
    b, t, h, d, s = 2, 12, 4, 8, 16
    x = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    cache = rope_ops.build_rope_cache(d, s)
    cos_e, sin_e = rope_ops.folded_tables(cache, h)
    for align in ("suffix", "prefix"):
        ref = rope_ops.apply_rope(x, cache, align=align)
        out = rope_ops.apply_rope_folded(x.reshape(b, t, h * d),
                                         cos_e, sin_e, align=align)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.reshape(b, t, h * d)),
                                   atol=1e-6)
