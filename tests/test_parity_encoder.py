"""Strongest parity evidence for the core model: our Encoder's OUTPUT must
match an independent numpy restatement of the reference's composition
(reference:models/brainformer.py:271-352):

    patches('b (t p) c -> b (t c) p') -> Linear emb -> + space embedding
    -> N x [ x + SDPA(LN(x), slab mask, RoPE) ; x + SwiGLU(LN(x)) ]
    -> LN_f

The numpy oracle below is written from the equations (complex RoPE, tril+
block-diagonal mask, explicit softmax) — not from our implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import MAEConfig
from frankenstein_tpu.models.brainformer import Encoder


def np_layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_rope(x, theta):
    # complex formulation (reference:brainformer.py:56-91), adjacent pairing
    b, t, h, d = x.shape
    freqs = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    ang = np.outer(np.arange(t), freqs)
    rot = np.exp(1j * ang)[None, :, None, :]
    xc = x.reshape(b, t, h, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * rot
    return np.stack([out.real, out.imag], -1).reshape(b, t, h, d)


def np_encoder(x, params, cfg: MAEConfig):
    p = params["params"]
    b, T, C = x.shape
    ps = cfg.patch_size
    # patching 'b (t p) c -> b (t c) p'
    xt = x.reshape(b, T // ps, ps, C).transpose(0, 1, 3, 2)
    tok_in = xt.reshape(b, (T // ps) * C, ps)

    h = tok_in @ np.asarray(p["emb"]["kernel"]) + np.asarray(p["emb"]["bias"])
    space = np.asarray(p["space_embedding"])[0]               # [C, dim]
    space_full = np.tile(space, (T // ps, 1))                 # [(t c), dim]
    h = h + space_full[None]

    n = h.shape[1]
    # slab-causal mask: tril + full blocks on the diagonal slabs
    mask = np.tril(np.ones((n, n)))
    for s in range(0, n, cfg.n_electrodes):
        mask[s:s + cfg.n_electrodes, s:s + cfg.n_electrodes] = 1.0
    mask = mask.astype(bool)

    for li in range(cfg.n_layers):
        lp = p[f"h_{li}"]
        # attention
        a_in = np_layer_norm(h, np.asarray(lp["ln_1"]["weight"]),
                             np.asarray(lp["ln_1"]["bias"]))
        q = (a_in @ np.asarray(lp["attn"]["qw"]["kernel"])).reshape(
            b, n, cfg.n_heads, cfg.head_dim)
        k = (a_in @ np.asarray(lp["attn"]["kw"]["kernel"])).reshape(
            b, n, cfg.n_heads, cfg.head_dim)
        v = (a_in @ np.asarray(lp["attn"]["vw"]["kernel"])).reshape(
            b, n, cfg.n_heads, cfg.head_dim)
        q = np_rope(q, cfg.rope_theta)
        k = np_rope(k, cfg.rope_theta)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(cfg.head_dim)
        logits = np.where(mask[None, None], logits, -1e30)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, -1)
        h = h + att @ np.asarray(lp["attn"]["project"]["kernel"])
        # SwiGLU
        m_in = np_layer_norm(h, np.asarray(lp["ln_2"]["weight"]),
                             np.asarray(lp["ln_2"]["bias"]))
        g = m_in @ np.asarray(lp["mlp"]["w1"]["kernel"])
        g = g / (1.0 + np.exp(-g)) * (m_in @ np.asarray(lp["mlp"]["w3"]["kernel"]))
        h = h + g @ np.asarray(lp["mlp"]["w2"]["kernel"])

    return np_layer_norm(h, np.asarray(p["ln_f"]["weight"]),
                         np.asarray(p["ln_f"]["bias"]))


def test_encoder_matches_numpy_oracle():
    cfg = MAEConfig(window_size=24, n_electrodes=4, patch_size=8, dim=16,
                    n_layers=2, head_dim=8, hidden_dim=32, n_heads=2,
                    n_kv_heads=2)
    enc = Encoder(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 24, 4)).astype(np.float32)
    params = enc.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(enc.apply(params, jnp.asarray(x)))
    oracle = np_encoder(x.astype(np.float64), params, cfg)
    np.testing.assert_allclose(ours, oracle, atol=2e-4)
