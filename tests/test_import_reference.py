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


# ---------------------------------------------------------------------------
# SoundStream VQ-VAE: conv layouts verified against torch itself
# (torch ships CPU-only in this environment; the twin below restates the
# reference conv stack semantics, reference:models/vq_brain.py:22-159)
# ---------------------------------------------------------------------------

import dataclasses

from frankenstein_tpu.config import VQVAEConfig
from frankenstein_tpu.models.vq_brain import ConvDecoder, ConvEncoder, SoundStream

VCFG = VQVAEConfig(n_electrodes=6, C=8, D=4, codebook_size=16, strides=(2, 2))


def ref_soundstream_sd(cfg, rng):
    sd = {}

    def conv(key, out_c, in_c, k):
        sd[key + ".weight"] = rng.normal(size=(out_c, in_c, k)).astype(np.float32) * 0.2
        sd[key + ".bias"] = rng.normal(size=(out_c,)).astype(np.float32) * 0.1

    def res_unit(key, c):
        conv(key + ".layers.0", c, c, 3)
        conv(key + ".layers.2", c, c, 1)

    C, D, E = cfg.C, cfg.D, cfg.n_electrodes
    conv("encoder.layers.0", C, E, 5)
    for li, s in zip((2, 4), cfg.strides):
        for ri in range(3):
            res_unit(f"encoder.layers.{li}.layers.{2 * ri}", C)
        conv(f"encoder.layers.{li}.layers.6", C, C, 2 * s)
    conv("encoder.layers.6", D, C, 3)

    conv("decoder.layers.0", C, D, 3)
    for li, s in zip((2, 4), cfg.strides):
        # ConvTranspose1d weight is [in, out, k]
        sd[f"decoder.layers.{li}.layers.0.weight"] = \
            rng.normal(size=(C, C, 2 * s)).astype(np.float32) * 0.2
        sd[f"decoder.layers.{li}.layers.0.bias"] = \
            rng.normal(size=(C,)).astype(np.float32) * 0.1
        for ri in range(3):
            res_unit(f"decoder.layers.{li}.layers.{2 * (ri + 1)}", C)
    conv("decoder.layers.6", E, C, 5)

    sd["quantizer._codebook.embed"] = rng.normal(
        size=(cfg.codebook_size, D)).astype(np.float32)
    sd["quantizer._codebook.cluster_size"] = np.ones(
        (cfg.codebook_size,), np.float32)
    return sd


def _torch_twin():
    import torch
    import torch.nn.functional as F

    def causal_conv(x, w, b, stride=1):
        pad = w.shape[2] - 1
        return F.conv1d(F.pad(x, [pad, 0]), w, b, stride=stride)

    def res_unit(x, W, p):
        h = F.elu(causal_conv(x, W(p + ".layers.0.weight"), W(p + ".layers.0.bias")))
        return x + F.conv1d(h, W(p + ".layers.2.weight"), W(p + ".layers.2.bias"))

    def encoder(x, W, strides):
        h = F.elu(causal_conv(x, W("encoder.layers.0.weight"),
                              W("encoder.layers.0.bias")))
        for li, s in zip((2, 4), strides):
            p = f"encoder.layers.{li}.layers"
            for ri in range(3):
                h = F.elu(res_unit(h, W, f"{p}.{2 * ri}"))
            h = F.elu(causal_conv(h, W(p + ".6.weight"), W(p + ".6.bias"), stride=s))
        return causal_conv(h, W("encoder.layers.6.weight"), W("encoder.layers.6.bias"))

    def decoder(z, W, strides):
        h = F.elu(causal_conv(z, W("decoder.layers.0.weight"),
                              W("decoder.layers.0.bias")))
        for li, s in zip((2, 4), strides):
            p = f"decoder.layers.{li}.layers"
            w = W(p + ".0.weight")
            k = w.shape[2]
            trim = (k - 1) + 1 - s          # reference causal_padding
            h = F.conv_transpose1d(h, w, W(p + ".0.bias"), stride=s)[..., :-trim]
            h = F.elu(h)
            for ri in range(3):
                h = res_unit(h, W, f"{p}.{2 * (ri + 1)}")
                if ri < 2:
                    h = F.elu(h)
            h = F.elu(h)
        return causal_conv(h, W("decoder.layers.6.weight"), W("decoder.layers.6.bias"))

    return encoder, decoder


def test_soundstream_convs_match_torch_twin():
    import torch

    rng = np.random.default_rng(10)
    sd = ref_soundstream_sd(VCFG, rng)
    W = lambda k: torch.tensor(sd[k])
    t_enc, t_dec = _torch_twin()

    x = rng.normal(size=(2, 16, VCFG.n_electrodes)).astype(np.float32)
    want_z = t_enc(torch.tensor(x).permute(0, 2, 1), W, VCFG.strides)
    want_z = want_z.permute(0, 2, 1).numpy()

    variables = ir.soundstream_params(sd)
    got_z = np.asarray(ConvEncoder(VCFG).apply(
        {"params": variables["params"]["encoder"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got_z, want_z, atol=1e-5, rtol=1e-5)

    z = rng.normal(size=(2, 4, VCFG.D)).astype(np.float32)
    want_y = t_dec(torch.tensor(z).permute(0, 2, 1), W, VCFG.strides)
    want_y = want_y.permute(0, 2, 1).numpy()
    got_y = np.asarray(ConvDecoder(VCFG).apply(
        {"params": variables["params"]["decoder"]}, jnp.asarray(z)))
    np.testing.assert_allclose(got_y, want_y, atol=1e-5, rtol=1e-5)


def test_soundstream_import_full_forward_and_roundtrip():
    rng = np.random.default_rng(11)
    sd = ref_soundstream_sd(VCFG, rng)
    variables = ir.soundstream_params(sd)
    q = variables["vq"]["quantizer"]
    np.testing.assert_array_equal(q["codebook"], sd["quantizer._codebook.embed"])
    assert bool(q["initted"])                   # trained ckpt: no k-means re-init

    model = SoundStream(VCFG)
    x = jax.random.normal(jax.random.key(0), (2, 16, VCFG.n_electrodes))
    (loss, recon), _ = model.apply(variables, x, mutable=["aux"])
    assert recon.shape == x.shape and np.isfinite(float(loss))

    back = ir.export_soundstream(variables)
    again = ir.soundstream_params(back)
    _assert_trees_equal(again["params"], variables["params"])
    _assert_trees_equal(
        {k: v for k, v in again["vq"]["quantizer"].items()},
        {k: v for k, v in variables["vq"]["quantizer"].items()})


def test_soundstream_accepts_3d_codebook():
    """Newer vector_quantize_pytorch stores embed as [1, K, D]."""
    rng = np.random.default_rng(12)
    sd = ref_soundstream_sd(VCFG, rng)
    sd["quantizer._codebook.embed"] = sd["quantizer._codebook.embed"][None]
    variables = ir.soundstream_params(sd)
    assert variables["vq"]["quantizer"]["codebook"].shape == (
        VCFG.codebook_size, VCFG.D)


def test_simple_mae_roundtrip():
    from frankenstein_tpu.config import SimpleEncoderConfig, SimpleMAEConfig
    from frankenstein_tpu.models.simple_mae import SimpleMAE

    ec = SimpleEncoderConfig(block_size=6, patch_size=16, dim=32, n_layers=2,
                             head_dim=8, hidden_dim=64, n_heads=4, n_kv_heads=4)
    dc = SimpleMAEConfig(dim=32, n_layers=1, head_dim=8, hidden_dim=64,
                         n_heads=4, n_kv_heads=4)
    model = SimpleMAE(ec, dc)
    x = jax.random.normal(jax.random.key(0), (2, ec.block_size, ec.patch_size))
    params = model.init({"params": jax.random.key(1),
                         "mask": jax.random.key(2)}, x)
    sd = ir.export_simple_mae(params)
    _assert_trees_equal(ir.simple_mae_params(sd), params)


def test_franky_strict_catches_nested_unconsumed_tensor():
    """The audit must flag tensors UNDER the known prefixes that no mapper
    consumed (e.g. a misnamed weight), not just foreign top-level keys."""
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
    sd["llm_model.transformer.h.0.attn.c_atn.weight"] = \
        np.zeros((4, 4), np.float32)   # misnamed tensor inside a known prefix
    with pytest.raises(ValueError, match="unmapped"):
        ir.franky_params(sd)
