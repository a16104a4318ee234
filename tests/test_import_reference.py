"""Reference-checkpoint import/export (models/import_reference.py).

Oracle strategy: the decisive test runs an INDEPENDENT numpy restatement of
the reference Encoder forward (reference:models/brainformer.py:271-352)
directly on a reference-named, torch-layout state dict — torch ``nn.Linear``
semantics ``y = x @ W.T + b`` — and requires our flax Encoder with the
IMPORTED params to reproduce it. Any transposition or misplaced tensor in the
name map breaks this. The GPT map is cross-checked against the parity-tested
HF importer (the reference's own ``from_pretrained`` defines the layout
relation between the two, reference:models/gpt2_model.py:268-277). Everything
else is covered by export->import round-trips.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                     PerceiverConfig)
from frankenstein_tpu.models import import_reference as ir
from frankenstein_tpu.models.brainformer import BrainEncoder, Encoder, MAE
from frankenstein_tpu.models.franky import Franky
from frankenstein_tpu.models.gpt2_import import params_from_hf_state_dict

CFG = MAEConfig(window_size=16, n_electrodes=4, patch_size=4, dim=32,
                n_layers=2, head_dim=8, hidden_dim=64, n_heads=4,
                n_kv_heads=4, n_dec_layers=1, decoder_dim=32)


# ---------------------------------------------------------------------------
# reference-named random state dicts (names/shapes restate
# reference:models/brainformer.py:115-173,234-268,271-352)
# ---------------------------------------------------------------------------


def _lin(rng, out_d, in_d, bias=False):
    d = {"weight": rng.normal(size=(out_d, in_d)).astype(np.float32) * 0.2}
    if bias:
        d["bias"] = rng.normal(size=(out_d,)).astype(np.float32) * 0.1
    return d


def _put(sd, prefix, tensors):
    for k, v in tensors.items():
        sd[f"{prefix}.{k}"] = v


def _ln_keys(sd, prefix, dim, rng):
    sd[f"{prefix}.weight"] = (1 + 0.1 * rng.normal(size=(dim,))).astype(np.float32)
    sd[f"{prefix}.bias"] = (0.1 * rng.normal(size=(dim,))).astype(np.float32)


def _block_keys(sd, prefix, cfg, rng):
    inner = cfg.n_heads * cfg.head_dim
    _ln_keys(sd, f"{prefix}.ln_1", cfg.dim, rng)
    for name in ("qw", "kw", "vw"):
        _put(sd, f"{prefix}.attn.{name}", _lin(rng, inner, cfg.dim))
    _put(sd, f"{prefix}.attn.project", _lin(rng, cfg.dim, inner))
    _ln_keys(sd, f"{prefix}.ln_2", cfg.dim, rng)
    _put(sd, f"{prefix}.mlp.w1", _lin(rng, cfg.hidden_dim, cfg.dim))
    _put(sd, f"{prefix}.mlp.w2", _lin(rng, cfg.dim, cfg.hidden_dim))
    _put(sd, f"{prefix}.mlp.w3", _lin(rng, cfg.hidden_dim, cfg.dim))


def ref_encoder_sd(cfg, rng, prefix=""):
    sd = {}
    _put(sd, f"{prefix}transformer.emb", _lin(rng, cfg.dim, cfg.patch_size, bias=True))
    sd[f"{prefix}space_embedding"] = rng.normal(
        size=(1, cfg.n_electrodes, cfg.dim)).astype(np.float32) * 0.2
    for i in range(cfg.n_layers):
        _block_keys(sd, f"{prefix}transformer.h.{i}", cfg, rng)
    _ln_keys(sd, f"{prefix}transformer.ln_f", cfg.dim, rng)
    return sd


# ---------------------------------------------------------------------------
# independent numpy twin of the reference forward, torch Linear semantics
# ---------------------------------------------------------------------------


def np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_rope(x, theta):
    b, t, h, d = x.shape
    freqs = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    ang = np.outer(np.arange(t), freqs)
    rot = np.exp(1j * ang)[None, :, None, :]
    xc = x.reshape(b, t, h, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * rot
    return np.stack([out.real, out.imag], -1).reshape(b, t, h, d)


def np_ref_encoder(x, sd, cfg, prefix=""):
    """reference Encoder.forward (brainformer.py:333-352) on the torch
    state dict itself: every Linear is x @ W.T (+ b)."""
    W = lambda k: sd[prefix + k + ".weight"]
    B = lambda k: sd[prefix + k + ".bias"]
    lin = lambda h, k: h @ W(k).T
    b, T, C = x.shape
    ps = cfg.patch_size
    xt = x.reshape(b, T // ps, ps, C).transpose(0, 1, 3, 2)
    h = xt.reshape(b, (T // ps) * C, ps) @ W("transformer.emb").T \
        + B("transformer.emb")
    space = sd[prefix + "space_embedding"][0]
    h = h + np.tile(space, (T // ps, 1))[None]

    n = h.shape[1]
    mask = np.tril(np.ones((n, n)))
    for s in range(0, n, cfg.n_electrodes):
        mask[s:s + cfg.n_electrodes, s:s + cfg.n_electrodes] = 1.0
    mask = mask.astype(bool)

    for i in range(cfg.n_layers):
        bp = f"transformer.h.{i}."
        a_in = np_ln(h, sd[prefix + bp + "ln_1.weight"],
                     sd[prefix + bp + "ln_1.bias"])
        shp = (b, n, cfg.n_heads, cfg.head_dim)
        q = np_rope(lin(a_in, bp + "attn.qw").reshape(shp), cfg.rope_theta)
        k = np_rope(lin(a_in, bp + "attn.kw").reshape(shp), cfg.rope_theta)
        v = lin(a_in, bp + "attn.vw").reshape(shp)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(cfg.head_dim)
        logits = np.where(mask[None, None], logits, -1e30)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, -1)
        h = h + lin(att, bp + "attn.project")
        m_in = np_ln(h, sd[prefix + bp + "ln_2.weight"],
                     sd[prefix + bp + "ln_2.bias"])
        g = lin(m_in, bp + "mlp.w1")
        silu = g / (1 + np.exp(-g))
        h = h + lin(silu * lin(m_in, bp + "mlp.w3"), bp + "mlp.w2")
    return np_ln(h, sd[prefix + "transformer.ln_f.weight"],
                 sd[prefix + "transformer.ln_f.bias"])


def test_encoder_import_matches_reference_twin():
    rng = np.random.default_rng(0)
    sd = ref_encoder_sd(CFG, rng)
    x = rng.normal(size=(2, CFG.window_size, CFG.n_electrodes)).astype(np.float32)
    want = np_ref_encoder(x, sd, CFG)
    params = ir.encoder_params(sd)
    got = Encoder(CFG).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_gpt_import_cross_checks_hf_importer():
    """HF sd (Conv1D [in,out]) and the reference's own layout (torch Linear,
    transposed per reference:gpt2_model.py:268-277) must land on the SAME
    flax tree through their respective importers."""
    cfg = GPTConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2,
                    n_embd=16, bias=True)
    rng = np.random.default_rng(1)
    e = cfg.n_embd
    hf = {
        "transformer.wte.weight": rng.normal(size=(cfg.vocab_size, e)),
        "transformer.wpe.weight": rng.normal(size=(cfg.block_size, e)),
    }
    dims = {"attn.c_attn": (e, 3 * e), "attn.c_proj": (e, e),
            "mlp.c_fc": (e, 4 * e), "mlp.c_proj": (4 * e, e)}
    for i in range(cfg.n_layer):
        for lnn in ("ln_1", "ln_2"):
            hf[f"transformer.h.{i}.{lnn}.weight"] = rng.normal(size=(e,))
            hf[f"transformer.h.{i}.{lnn}.bias"] = rng.normal(size=(e,))
        for name, (din, dout) in dims.items():
            hf[f"transformer.h.{i}.{name}.weight"] = rng.normal(size=(din, dout))
            hf[f"transformer.h.{i}.{name}.bias"] = rng.normal(size=(dout,))
    hf["transformer.ln_f.weight"] = rng.normal(size=(e,))
    hf["transformer.ln_f.bias"] = rng.normal(size=(e,))
    hf = {k: v.astype(np.float32) for k, v in hf.items()}

    # reference layout: nanoGPT's from_pretrained transposes exactly these
    transposed = ("attn.c_attn.weight", "attn.c_proj.weight",
                  "mlp.c_fc.weight", "mlp.c_proj.weight")
    ref = {k: (v.T if k.endswith(transposed) else v) for k, v in hf.items()}
    ref["lm_head.weight"] = hf["transformer.wte.weight"]  # tied

    p_hf = params_from_hf_state_dict(hf, cfg)
    p_ref = ir.gpt_params(ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_hf, p_ref)


def _assert_trees_equal(a, b):
    ja = jax.tree_util.tree_structure(a)
    jb = jax.tree_util.tree_structure(b)
    assert ja == jb, f"{ja}\n!=\n{jb}"
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                atol=1e-6), a, b)


def test_mae_roundtrip():
    model = MAE(CFG)
    x = jnp.zeros((1, CFG.window_size, CFG.n_electrodes))
    params = model.init({"params": jax.random.key(0),
                         "mask": jax.random.key(1)}, x)
    sd = ir.export_mae(params)
    _assert_trees_equal(ir.mae_params(sd), params)


PCFG = PerceiverConfig(encoder=CFG, n_output_tokens=4, output_dim=16,
                       dim=CFG.dim, n_layers=2, head_dim=8, hidden_dim=64,
                       n_heads=4, n_kv_heads=4)


def test_brain_encoder_roundtrip_and_apply():
    model = BrainEncoder(PCFG)
    x = jax.random.normal(jax.random.key(2),
                          (2, CFG.window_size, CFG.n_electrodes))
    params = model.init(jax.random.key(0), x)
    sd = ir.export_brain_encoder(params)          # perceiver.to_words head
    imported = ir.brain_encoder_params(sd)
    _assert_trees_equal(imported, params)
    np.testing.assert_allclose(np.asarray(model.apply(imported, x)),
                               np.asarray(model.apply(params, x)), atol=1e-6)


def test_brain_encoder_accepts_to_motion_head():
    model = BrainEncoder(PCFG)
    x = jnp.zeros((1, CFG.window_size, CFG.n_electrodes))
    params = model.init(jax.random.key(0), x)
    sd = ir.export_brain_encoder(params, head="to_motion")
    _assert_trees_equal(ir.brain_encoder_params(sd), params)


def test_franky_roundtrip_strict():
    cfg = FrankyConfig(
        brain=PerceiverConfig(encoder=CFG, n_output_tokens=4, output_dim=16,
                              dim=CFG.dim, n_layers=1, head_dim=8,
                              hidden_dim=64, n_heads=4, n_kv_heads=4),
        gpt=GPTConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2,
                      n_embd=16, bias=True))
    model = Franky(cfg)
    x = jnp.zeros((1, CFG.window_size, CFG.n_electrodes))
    y = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), x, y)
    sd = ir.export_franky(params)
    _assert_trees_equal(ir.franky_params(sd), params)
    with pytest.raises(ValueError, match="unmapped"):
        ir.franky_params({**sd, "stray.weight": np.zeros((1,), np.float32)})


def test_date_embedding_extension_zero_filled():
    """Reference checkpoints carry no session embedding (our extension):
    import must zero-fill it so outputs match the reference exactly even
    when date_info is passed."""
    import dataclasses
    cfg_dated = dataclasses.replace(CFG, n_sessions=3)
    rng = np.random.default_rng(3)
    sd = ref_encoder_sd(CFG, rng)
    x = rng.normal(size=(2, CFG.window_size, CFG.n_electrodes)).astype(np.float32)
    p0 = ir.encoder_params(sd)                       # n_sessions=0 tree
    p3 = ir.encoder_params(sd, n_sessions=3)
    assert p3["params"]["date_embedding"].shape == (3, CFG.dim)
    date = jnp.array([1, 2], jnp.int32)
    out3 = Encoder(cfg_dated).apply(p3, jnp.asarray(x), date_info=date)
    out0 = Encoder(CFG).apply(p0, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out0), atol=1e-6)


def test_safetensors_file_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    sd = ref_encoder_sd(CFG, rng)
    path = str(tmp_path / "ref.safetensors")
    ir.save_state_dict(sd, path)
    loaded = ir.load_state_dict(path)
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k])
