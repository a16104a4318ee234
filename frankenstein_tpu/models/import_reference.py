"""Import reference (ALVI-Labs/frankenstein, torch) checkpoints into
frankenstein_tpu parameter pytrees — and export back.

A user of the reference trains with torch ``nn.Module``s and saves
``state_dict()`` tensors via safetensors (reference:utils/train_utils.py:171-172,
e.g. the repo's ``step_5000_loss_3.1739.safetensors``). This module maps those
tensors, by their reference parameter names, onto our flax trees so trained
reference checkpoints can be decoded / fine-tuned here — and ours exported
back for comparison in the reference stack.

Layout rules (the only numeric surgery — everything else is renaming):
- torch ``nn.Linear`` stores ``weight`` as [out, in] and computes
  ``x @ W.T + b``; flax ``nn.Dense`` stores ``kernel`` as [in, out] and
  computes ``x @ K + b`` — so every linear weight is TRANSPOSED.
- torch ``nn.LayerNorm``/``nn.Embedding``/plain ``nn.Parameter`` tensors copy
  over unchanged.
- our GPT stacks its per-layer trees along a leading [L, ...] axis (one
  ``nn.scan`` over layers, models/gpt2.py:117-123); per-layer reference
  tensors are stacked accordingly.

Name maps (reference:models/brainformer.py:271-352,354-486,488-558;
notebooks_trainer/franky_baseline_gpt2.ipynb cells 3-4;
reference:models/gpt2_model.py:118-139):

    Encoder   transformer.emb.{weight,bias}        -> emb.{kernel^T,bias}
              transformer.h.{i}.ln_1.*             -> h_{i}.ln_1.*
              transformer.h.{i}.attn.{qw,kw,vw,project}.weight
                                                   -> h_{i}.attn.*.kernel^T
              transformer.h.{i}.mlp.{w1,w2,w3}.weight
                                                   -> h_{i}.mlp.*.kernel^T
              transformer.ln_f.*                   -> ln_f.*
              space_embedding                      -> space_embedding
    MAE       encoder.*                            -> encoder.*
              decoder.h.{i}.*                      -> dec_h_{i}.*
              mask_token                           -> mask_token
              decoder_pos_emb.weight               -> decoder_pos_emb.embedding
              to_signals.{weight,bias}             -> to_signals.{kernel^T,bias}
    BrainEncoder (aka BrainFormer)
              encoder.*                            -> encoder.*
              learnable_queries                    -> learnable_queries
              perceiver.h.{i}.{ln_1,ln_2}.*        -> cross_{i}.*
              perceiver.h.{i}.cross_attn.*.weight  -> cross_{i}.cross_attn.*.kernel^T
              perceiver.h.{i}.mlp.*.weight         -> cross_{i}.mlp.*.kernel^T
              perceiver.h.{i}.sa_block.*           -> cross_{i}.sa_block.*
              perceiver.ln_f.*                     -> ln_f.*
              perceiver.{to_words|to_motion}.*     -> to_out.*
    GPT       transformer.{wte,wpe}.weight         -> {wte,wpe}
              transformer.h.{i}.attn.c_attn.*      -> h.c_attn.* (stacked, ^T)
              transformer.h.{i}.attn.c_proj.*      -> h.c_proj.*
              transformer.h.{i}.mlp.c_fc.*         -> h.c_fc.*
              transformer.h.{i}.mlp.c_proj.*       -> h.mlp_c_proj.*
              transformer.ln_f.*                   -> ln_f.*
              lm_head.weight                       -> dropped (tied to wte,
                                                   reference:gpt2_model.py:139)
    Franky    brain_model.* + llm_model.*          -> same split (ipynb cell 4)

NOTE vs models/gpt2_import.py: that module imports HF checkpoints, whose
"Conv1D" matrices are ALREADY [in, out]; the reference's own GPT state dicts
hold torch-Linear [out, in] matrices (its ``from_pretrained`` transposes on
the way in, reference:gpt2_model.py:268-277), so square matrices like
``attn.c_proj.weight`` MUST be transposed here — shape heuristics cannot
tell, hence this dedicated path.

Extensions absent from the reference (our date_embedding when
``n_sessions > 0``) are zero-initialized: adding a zero session vector is a
numeric no-op, so an imported checkpoint reproduces reference behavior
exactly and the new capability remains trainable.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np


Array = np.ndarray
StateDict = Mapping[str, Array]


def load_state_dict(path: str) -> dict:
    """Read a reference checkpoint file into {name: numpy array}.

    Supports ``.safetensors`` (the reference's format,
    reference:utils/train_utils.py:171-172) and torch ``.pt``/``.pth``/``.bin``
    pickles (plain state_dict or {'state_dict'/'model': ...} wrappers).
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch  # CPU torch ships in this environment

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):
        if isinstance(obj, dict) and wrapper in obj and isinstance(
                obj[wrapper], dict):
            obj = obj[wrapper]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _f32(a: Array) -> np.ndarray:
    """Imported trees stay NUMPY on host: flax ``apply`` accepts numpy leaves
    and devices them lazily, while eager ``jnp.asarray`` here would device-put
    every tensor one dispatch at a time (prohibitive through a remote-TPU
    tunnel — measured minutes for a small encoder)."""
    return np.asarray(a, np.float32)


class _View:
    """Prefix view over a state dict that records which keys were consumed."""

    def __init__(self, sd: StateDict, prefix: str = "",
                 used: Optional[set] = None):
        self.sd = sd
        self.prefix = prefix
        self.used = used if used is not None else set()

    def sub(self, prefix: str) -> "_View":
        return _View(self.sd, self.prefix + prefix, self.used)

    def __contains__(self, key: str) -> bool:
        return self.prefix + key in self.sd

    def take(self, key: str) -> np.ndarray:
        full = self.prefix + key
        self.used.add(full)
        return _f32(self.sd[full])

    def linear(self, key: str, use_bias: Optional[bool] = None) -> dict:
        """torch nn.Linear '<key>.weight' [out, in] (+ optional bias) ->
        flax Dense {'kernel' [in, out], 'bias'}."""
        d = {"kernel": np.ascontiguousarray(self.take(key + ".weight").T)}
        has_bias = (key + ".bias") in self
        if use_bias is not None and has_bias != use_bias:
            raise ValueError(
                f"{self.prefix + key}: bias {'missing' if use_bias else 'unexpected'}")
        if has_bias:
            d["bias"] = self.take(key + ".bias")
        return d

    def norm(self, key: str) -> dict:
        d = {"weight": self.take(key + ".weight")}
        if (key + ".bias") in self:
            d["bias"] = self.take(key + ".bias")
        return d

    def unused(self) -> list:
        return sorted(k for k in self.sd
                      if k.startswith(self.prefix) and k not in self.used)


def _block(v: _View) -> dict:
    """reference Block (brainformer.py:234-245) -> models/layers.py:Block."""
    return {
        "ln_1": v.norm("ln_1"),
        "attn": {name: v.linear(f"attn.{name}", use_bias=False)
                 for name in ("qw", "kw", "vw", "project")},
        "ln_2": v.norm("ln_2"),
        "mlp": {name: v.linear(f"mlp.{name}", use_bias=False)
                for name in ("w1", "w2", "w3")},
    }


def _cross_block(v: _View) -> dict:
    """reference CrossBlock (brainformer.py:247-268) -> layers.py:CrossBlock."""
    return {
        "ln_1": v.norm("ln_1"),
        "cross_attn": {name: v.linear(f"cross_attn.{name}", use_bias=False)
                       for name in ("qw", "kw", "vw", "project")},
        "ln_2": v.norm("ln_2"),
        "mlp": {name: v.linear(f"mlp.{name}", use_bias=False)
                for name in ("w1", "w2", "w3")},
        "sa_block": _block(v.sub("sa_block.")),
    }


def _n_layers(v: _View, pattern: str) -> int:
    i = 0
    while pattern.format(i) in v:
        i += 1
    return i


def _encoder(v: _View, n_sessions: int = 0, dim: Optional[int] = None) -> dict:
    p = {
        "emb": v.linear("transformer.emb"),
        "space_embedding": v.take("space_embedding"),
        "ln_f": v.norm("transformer.ln_f"),
    }
    n = _n_layers(v, "transformer.h.{}.ln_1.weight")
    if n == 0:
        raise ValueError(f"no encoder blocks under '{v.prefix}transformer.h.'")
    for i in range(n):
        p[f"h_{i}"] = _block(v.sub(f"transformer.h.{i}."))
    if n_sessions:
        # our extension (config.py MAEConfig.n_sessions): zero rows == no-op
        d = dim if dim is not None else p["space_embedding"].shape[-1]
        p["date_embedding"] = np.zeros((n_sessions, d), np.float32)
    return p


def encoder_params(sd: StateDict, *, n_sessions: int = 0,
                   prefix: str = "") -> dict:
    """Reference ``Encoder`` state dict -> flax params for
    models.brainformer.Encoder. Returns {'params': ...}."""
    v = _View(sd, prefix)
    return {"params": _encoder(v, n_sessions=n_sessions)}


def mae_params(sd: StateDict, *, n_sessions: int = 0) -> dict:
    """Reference ``MAE`` state dict -> flax params for models.brainformer.MAE."""
    v = _View(sd)
    p = {
        "encoder": _encoder(v.sub("encoder."), n_sessions=n_sessions),
        "mask_token": v.take("mask_token"),
        "decoder_pos_emb": {"embedding": v.take("decoder_pos_emb.weight")},
        "to_signals": v.linear("to_signals"),
    }
    n = _n_layers(v, "decoder.h.{}.ln_1.weight")
    for i in range(n):
        p[f"dec_h_{i}"] = _block(v.sub(f"decoder.h.{i}."))
    return {"params": p}


def _brain_encoder(v: _View, n_sessions: int = 0) -> dict:
    head = "perceiver.to_words" if "perceiver.to_words.weight" in v \
        else "perceiver.to_motion"
    p = {
        "encoder": _encoder(v.sub("encoder."), n_sessions=n_sessions),
        "learnable_queries": v.take("learnable_queries"),
        "ln_f": v.norm("perceiver.ln_f"),
        "to_out": v.linear(head),
    }
    n = _n_layers(v, "perceiver.h.{}.ln_1.weight")
    for i in range(n):
        p[f"cross_{i}"] = _cross_block(v.sub(f"perceiver.h.{i}."))
    return p


def brain_encoder_params(sd: StateDict, *, n_sessions: int = 0,
                         prefix: str = "") -> dict:
    """Reference ``BrainFormer``/``BrainEncoder`` state dict -> flax params
    for models.brainformer.BrainEncoder. The output head is ``to_words`` in
    the Franky notebook variant and ``to_motion`` in models/brainformer.py —
    both land on our ``to_out``."""
    return {"params": _brain_encoder(_View(sd, prefix),
                                     n_sessions=n_sessions)}


def simple_mae_params(sd: StateDict) -> dict:
    """Reference ``SimpleMAE`` (models/simple_mae:240-360: time-patch MAE,
    RMSNorm blocks, no space embedding, real decoder ``emb`` bridge) ->
    flax params for models.simple_mae.SimpleMAE."""
    v = _View(sd)
    enc = {
        "emb": v.linear("encoder.transformer.emb"),
        "ln_f": v.norm("encoder.transformer.ln_f"),
    }
    n = _n_layers(v, "encoder.transformer.h.{}.ln_1.weight")
    if n == 0:
        raise ValueError("no SimpleEncoder blocks under 'encoder.transformer.h.'")
    for i in range(n):
        enc[f"h_{i}"] = _block(v.sub(f"encoder.transformer.h.{i}."))
    p = {
        "encoder": enc,
        "dec_emb": v.linear("decoder.emb"),
        "mask_token": v.take("mask_token"),
        "decoder_pos_emb": {"embedding": v.take("decoder_pos_emb.weight")},
        "to_signals": v.linear("to_signals"),
    }
    for i in range(_n_layers(v, "decoder.h.{}.ln_1.weight")):
        p[f"dec_h_{i}"] = _block(v.sub(f"decoder.h.{i}."))
    return {"params": p}


def export_simple_mae(params: dict) -> dict:
    p = params["params"]
    out: dict = {}
    _export_linear(out, "encoder.transformer.emb", p["encoder"]["emb"])
    i = 0
    while f"h_{i}" in p["encoder"]:
        _export_block(out, f"encoder.transformer.h.{i}.", p["encoder"][f"h_{i}"])
        i += 1
    _export_norm(out, "encoder.transformer.ln_f", p["encoder"]["ln_f"])
    _export_linear(out, "decoder.emb", p["dec_emb"])
    i = 0
    while f"dec_h_{i}" in p:
        _export_block(out, f"decoder.h.{i}.", p[f"dec_h_{i}"])
        i += 1
    out["mask_token"] = _np(p["mask_token"])
    out["decoder_pos_emb.weight"] = _np(p["decoder_pos_emb"]["embedding"])
    _export_linear(out, "to_signals", p["to_signals"])
    return out


def gpt_params(sd: StateDict, *, prefix: str = "") -> dict:
    """Reference GPT (nanoGPT fork, torch-Linear layout) state dict -> flax
    params for models.gpt2.GPT (scan-stacked layer axis).

    Unlike models/gpt2_import.py (HF Conv1D [in, out]), EVERY linear weight
    here is [out, in] and is transposed — including the square c_proj ones a
    shape heuristic cannot catch (reference:gpt2_model.py:268-277 documents
    the layout difference from HF)."""
    return {"params": _gpt(_View(sd, prefix))}


def _gpt(v: _View) -> dict:
    p = {
        "wte": v.take("transformer.wte.weight"),
        "wpe": v.take("transformer.wpe.weight"),
        "ln_f": v.norm("transformer.ln_f"),
    }
    if "lm_head.weight" in v:
        v.used.add(v.prefix + "lm_head.weight")  # tied to wte — drop
    n = _n_layers(v, "transformer.h.{}.ln_1.weight")
    if n == 0:
        raise ValueError(f"no GPT blocks under '{v.prefix}transformer.h.'")
    layers = []
    for i in range(n):
        b = v.sub(f"transformer.h.{i}.")
        layers.append({
            "ln_1": b.norm("ln_1"),
            "c_attn": b.linear("attn.c_attn"),
            "c_proj": b.linear("attn.c_proj"),
            "ln_2": b.norm("ln_2"),
            "c_fc": b.linear("mlp.c_fc"),
            "mlp_c_proj": b.linear("mlp.c_proj"),
        })
    p["h"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *layers)
    return p


def franky_params(sd: StateDict, *, n_sessions: int = 0,
                  strict: bool = True) -> dict:
    """Reference ``Franky`` (brain_model + llm_model,
    notebooks_trainer/franky_baseline_gpt2.ipynb cell 4) -> flax params for
    models.franky.Franky. ``strict`` errors on any tensor the name maps did
    not consume (extra per-layer tensors, misnamed keys) — a partially
    mapped import must fail loudly, not yield a silently wrong model."""
    v = _View(sd)
    p = {
        "brain_model": _brain_encoder(v.sub("brain_model."),
                                      n_sessions=n_sessions),
        "llm_model": _gpt(v.sub("llm_model.")),
    }
    if strict:
        leftovers = v.unused()
        if leftovers:
            raise ValueError(f"unmapped Franky tensors: {leftovers[:8]}")
    return {"params": p}


# ---------------------------------------------------------------------------
# export: our pytrees -> reference-named torch-layout state dicts
# ---------------------------------------------------------------------------


def _np(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _export_linear(out: dict, key: str, d: dict) -> None:
    out[key + ".weight"] = _np(d["kernel"]).T
    if "bias" in d:
        out[key + ".bias"] = _np(d["bias"])


def _export_norm(out: dict, key: str, d: dict) -> None:
    out[key + ".weight"] = _np(d["weight"])
    if "bias" in d:
        out[key + ".bias"] = _np(d["bias"])


def _export_block(out: dict, prefix: str, p: dict) -> None:
    _export_norm(out, prefix + "ln_1", p["ln_1"])
    for name in ("qw", "kw", "vw", "project"):
        _export_linear(out, f"{prefix}attn.{name}", p["attn"][name])
    _export_norm(out, prefix + "ln_2", p["ln_2"])
    for name in ("w1", "w2", "w3"):
        _export_linear(out, f"{prefix}mlp.{name}", p["mlp"][name])


def _export_encoder(out: dict, prefix: str, p: dict) -> None:
    _export_linear(out, prefix + "transformer.emb", p["emb"])
    out[prefix + "space_embedding"] = _np(p["space_embedding"])
    i = 0
    while f"h_{i}" in p:
        _export_block(out, f"{prefix}transformer.h.{i}.", p[f"h_{i}"])
        i += 1
    _export_norm(out, prefix + "transformer.ln_f", p["ln_f"])
    # date_embedding is our extension — no reference slot; dropped on export


def export_encoder(params: dict) -> dict:
    out: dict = {}
    _export_encoder(out, "", params["params"])
    return out


def export_mae(params: dict) -> dict:
    p = params["params"]
    out: dict = {}
    _export_encoder(out, "encoder.", p["encoder"])
    i = 0
    while f"dec_h_{i}" in p:
        _export_block(out, f"decoder.h.{i}.", p[f"dec_h_{i}"])
        i += 1
    out["mask_token"] = _np(p["mask_token"])
    out["decoder_pos_emb.weight"] = _np(p["decoder_pos_emb"]["embedding"])
    _export_linear(out, "to_signals", p["to_signals"])
    return out


def export_brain_encoder(params: dict, head: str = "to_words",
                         prefix: str = "") -> dict:
    p = params["params"]
    out: dict = {}
    _export_encoder(out, prefix + "encoder.", p["encoder"])
    out[prefix + "learnable_queries"] = _np(p["learnable_queries"])
    i = 0
    while f"cross_{i}" in p:
        cp = p[f"cross_{i}"]
        bp = f"{prefix}perceiver.h.{i}."
        _export_norm(out, bp + "ln_1", cp["ln_1"])
        for name in ("qw", "kw", "vw", "project"):
            _export_linear(out, f"{bp}cross_attn.{name}", cp["cross_attn"][name])
        _export_norm(out, bp + "ln_2", cp["ln_2"])
        for name in ("w1", "w2", "w3"):
            _export_linear(out, f"{bp}mlp.{name}", cp["mlp"][name])
        _export_block(out, bp + "sa_block.", cp["sa_block"])
        i += 1
    _export_norm(out, prefix + "perceiver.ln_f", p["ln_f"])
    _export_linear(out, prefix + f"perceiver.{head}", p["to_out"])
    return out


def export_gpt(params: dict, prefix: str = "") -> dict:
    p = params["params"]
    out: dict = {}
    out[prefix + "transformer.wte.weight"] = _np(p["wte"])
    out[prefix + "transformer.wpe.weight"] = _np(p["wpe"])
    n_layer = int(jax.tree_util.tree_leaves(p["h"])[0].shape[0])
    for i in range(n_layer):
        layer = jax.tree_util.tree_map(lambda a: a[i], p["h"])
        bp = f"{prefix}transformer.h.{i}."
        _export_norm(out, bp + "ln_1", layer["ln_1"])
        _export_linear(out, bp + "attn.c_attn", layer["c_attn"])
        _export_linear(out, bp + "attn.c_proj", layer["c_proj"])
        _export_norm(out, bp + "ln_2", layer["ln_2"])
        _export_linear(out, bp + "mlp.c_fc", layer["c_fc"])
        _export_linear(out, bp + "mlp.c_proj", layer["mlp_c_proj"])
    _export_norm(out, prefix + "transformer.ln_f", p["ln_f"])
    out[prefix + "lm_head.weight"] = _np(p["wte"])  # tied
    return out


def export_franky(params: dict) -> dict:
    p = params["params"]
    out = export_brain_encoder({"params": p["brain_model"]},
                               prefix="brain_model.")
    out.update(export_gpt({"params": p["llm_model"]}, prefix="llm_model."))
    return out


def save_state_dict(sd: Mapping[str, np.ndarray], path: str) -> None:
    """Write a reference-format checkpoint (.safetensors)."""
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


# ---------------------------------------------------------------------------
# VQ-VAE "SoundStream" (reference:models/vq_brain.py:162-218)
# ---------------------------------------------------------------------------
#
# Conv layouts (verified numerically against torch in
# tests/test_import_reference.py):
#   torch nn.Conv1d          weight [out, in, k]  -> flax Conv kernel
#                            transpose(2, 1, 0) = [k, in, out]
#   torch nn.ConvTranspose1d weight [in, out, k]  -> flax ConvTranspose kernel
#                            transpose(2, 0, 1) FLIPPED along the spatial
#                            axis (lax.conv_transpose applies the kernel as a
#                            forward correlation; torch's transposed conv
#                            scatter-adds it unflipped)
#
# Reference module indices (nn.Sequential positions, vq_brain.py:48-159):
#   Encoder.layers: 0 conv k5 | 2, 4 EncoderBlock | 6 conv k3
#   EncoderBlock.layers: 0, 2, 4 ResidualUnit | 6 strided conv
#   Decoder.layers: 0 conv k3 | 2, 4 DecoderBlock | 6 conv k5
#   DecoderBlock.layers: 0 transpose conv | 2, 4, 6 ResidualUnit
#   ResidualUnit.layers: 0 causal conv k3 | 2 conv k1
#
# The quantizer state comes from vector_quantize_pytorch
# (``quantizer._codebook.{embed, cluster_size, ...}``) and lands in our "vq"
# variable collection (ops/vq.py); ``initted`` imports as True — a trained
# checkpoint's codebook must not be k-means re-initialized.


def _conv(v: _View, key: str) -> dict:
    w = v.take(key + ".weight")
    d = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if (key + ".bias") in v:
        d["bias"] = v.take(key + ".bias")
    return {"Conv_0": d}


def _conv_transpose(v: _View, key: str) -> dict:
    w = v.take(key + ".weight")
    d = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])}
    if (key + ".bias") in v:
        d["bias"] = v.take(key + ".bias")
    return {"ConvTranspose_0": d}


def _residual_unit(v: _View, key: str) -> dict:
    return {"CausalConv1d_0": _conv(v, key + ".layers.0"),
            "Conv_0": _conv(v, key + ".layers.2")["Conv_0"]}


def _conv_encoder(v: _View, prefix: str) -> dict:
    blocks = {}
    for bi, li in enumerate((2, 4)):
        bp = f"{prefix}.layers.{li}.layers"
        blocks[f"EncoderBlock_{bi}"] = {
            **{f"ResidualUnit_{ri}": _residual_unit(v, f"{bp}.{2 * ri}")
               for ri in range(3)},
            "CausalConv1d_0": _conv(v, f"{bp}.6"),
        }
    return {"CausalConv1d_0": _conv(v, f"{prefix}.layers.0"),
            **blocks,
            "CausalConv1d_1": _conv(v, f"{prefix}.layers.6")}


def _conv_decoder(v: _View, prefix: str) -> dict:
    blocks = {}
    for bi, li in enumerate((2, 4)):
        bp = f"{prefix}.layers.{li}.layers"
        blocks[f"DecoderBlock_{bi}"] = {
            "CausalConvTranspose1d_0": _conv_transpose(v, f"{bp}.0"),
            **{f"ResidualUnit_{ri}": _residual_unit(v, f"{bp}.{2 * (ri + 1)}")
               for ri in range(3)},
        }
    return {"CausalConv1d_0": _conv(v, f"{prefix}.layers.0"),
            **blocks,
            "CausalConv1d_1": _conv(v, f"{prefix}.layers.6")}


def soundstream_params(sd: StateDict) -> dict:
    """Reference ``SoundStream`` state dict -> flax variables for
    models.vq_brain.SoundStream: {'params': ..., 'vq': ...}."""
    v = _View(sd)
    params = {"encoder": _conv_encoder(v, "encoder"),
              "decoder": _conv_decoder(v, "decoder")}
    embed_keys = [k for k in sd
                  if k.startswith("quantizer.") and k.endswith("embed")]
    if not embed_keys:
        raise ValueError("no quantizer codebook ('quantizer.*embed') found")
    codebook = _f32(sd[embed_keys[0]])
    if codebook.ndim == 3:          # newer vector_quantize_pytorch: [1, K, D]
        codebook = codebook[0]
    k = codebook.shape[0]
    cs_keys = [key for key in sd if key.startswith("quantizer.")
               and key.endswith("cluster_size")]
    cluster = _f32(sd[cs_keys[0]]).reshape(-1) if cs_keys \
        else np.ones((k,), np.float32)
    vq = {"quantizer": {"codebook": codebook,
                        "cluster_size": cluster,
                        "initted": np.ones((), np.bool_)}}
    return {"params": params, "vq": vq}


def _export_conv(out: dict, key: str, d: dict) -> None:
    c = d["Conv_0"]
    out[key + ".weight"] = np.ascontiguousarray(_np(c["kernel"]).transpose(2, 1, 0))
    if "bias" in c:
        out[key + ".bias"] = _np(c["bias"])


def _export_conv_transpose(out: dict, key: str, d: dict) -> None:
    c = d["ConvTranspose_0"]
    out[key + ".weight"] = np.ascontiguousarray(
        _np(c["kernel"])[::-1].transpose(1, 2, 0))
    if "bias" in c:
        out[key + ".bias"] = _np(c["bias"])


def _export_residual_unit(out: dict, key: str, p: dict) -> None:
    _export_conv(out, key + ".layers.0", p["CausalConv1d_0"])
    _export_conv(out, key + ".layers.2", {"Conv_0": p["Conv_0"]})


def export_soundstream(variables: dict) -> dict:
    p = variables["params"]
    out: dict = {}
    for side, prefix in (("encoder", "encoder"), ("decoder", "decoder")):
        sp = p[side]
        _export_conv(out, f"{prefix}.layers.0", sp["CausalConv1d_0"])
        _export_conv(out, f"{prefix}.layers.6", sp["CausalConv1d_1"])
        for bi, li in enumerate((2, 4)):
            bp = f"{prefix}.layers.{li}.layers"
            if side == "encoder":
                b = sp[f"EncoderBlock_{bi}"]
                for ri in range(3):
                    _export_residual_unit(out, f"{bp}.{2 * ri}",
                                          b[f"ResidualUnit_{ri}"])
                _export_conv(out, f"{bp}.6", b["CausalConv1d_0"])
            else:
                b = sp[f"DecoderBlock_{bi}"]
                _export_conv_transpose(out, f"{bp}.0",
                                       b["CausalConvTranspose1d_0"])
                for ri in range(3):
                    _export_residual_unit(out, f"{bp}.{2 * (ri + 1)}",
                                          b[f"ResidualUnit_{ri}"])
    q = variables["vq"]["quantizer"]
    embed = _np(q["codebook"])
    out["quantizer._codebook.embed"] = embed
    out["quantizer._codebook.cluster_size"] = _np(q["cluster_size"])
    out["quantizer._codebook.embed_avg"] = \
        embed * _np(q["cluster_size"])[:, None]
    out["quantizer._codebook.initted"] = np.ones((1,), np.float32)
    return out
