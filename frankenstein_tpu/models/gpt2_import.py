"""HF GPT-2 checkpoint import into the frankenstein_tpu parameter pytree.

Mirrors the reference's weight surgery (reference:models/gpt2_model.py:229-284):
OpenAI checkpoints store attention/MLP matrices as "Conv1D" ([in, out]); our
Dense kernels are also [in, out] in flax, so unlike the torch port we do NOT
transpose those — torch Linear is [out, in], flax Dense is [in, out], and the
HF Conv1D layout already matches flax. LayerNorm/embedding tensors copy over
directly; ``lm_head`` is dropped (tied to wte).

Works offline: accepts any mapping of HF-style names -> numpy arrays (e.g.
``{k: v.numpy() for k, v in torch_model.state_dict().items()}``), a
``transformers.GPT2LMHeadModel``, or a local checkpoint directory.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import GPTConfig

# HF model-type geometry (reference:models/gpt2_model.py:239-244)
HF_CONFIGS = {
    "gpt2": dict(n_layer=12, n_head=12, n_embd=768),
    "gpt2-medium": dict(n_layer=24, n_head=16, n_embd=1024),
    "gpt2-large": dict(n_layer=36, n_head=20, n_embd=1280),
    "gpt2-xl": dict(n_layer=48, n_head=25, n_embd=1600),
}


def config_for(model_type: str) -> GPTConfig:
    geo = HF_CONFIGS[model_type]
    return GPTConfig(vocab_size=50257, block_size=1024, bias=True, **geo)


def _strip(sd: Mapping[str, np.ndarray]) -> dict:
    out = {}
    for k, v in sd.items():
        k = k[len("transformer."):] if k.startswith("transformer.") else k
        out[k] = np.asarray(v)
    return out


def params_from_hf_state_dict(sd: Mapping[str, np.ndarray], cfg: GPTConfig) -> dict:
    """Build the flax params tree {'params': ...} for models.gpt2.GPT."""
    sd = _strip(sd)
    p: dict = {}
    p["wte"] = jnp.asarray(sd["wte.weight"], jnp.float32)
    p["wpe"] = jnp.asarray(sd["wpe.weight"], jnp.float32)
    assert p["wte"].shape == (cfg.vocab_size, cfg.n_embd), p["wte"].shape
    assert p["wpe"].shape == (cfg.block_size, cfg.n_embd), p["wpe"].shape

    def ln(prefix):
        d = {"weight": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32)}
        if cfg.bias:
            d["bias"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return d

    def dense(prefix, expect_in, expect_out):
        w = np.asarray(sd[f"{prefix}.weight"])
        # HF Conv1D stores [in, out] == flax Dense kernel layout; torch Linear
        # (not used by the GPT-2 ckpt) would be [out, in] and need a transpose.
        if w.shape == (expect_out, expect_in) and expect_in != expect_out:
            w = w.T
        assert w.shape == (expect_in, expect_out), (prefix, w.shape)
        d = {"kernel": jnp.asarray(w, jnp.float32)}
        if f"{prefix}.bias" in sd:
            d["bias"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return d

    e = cfg.n_embd
    layers = []
    for i in range(cfg.n_layer):
        hp = f"h.{i}"
        layers.append({
            "ln_1": ln(f"{hp}.ln_1"),
            "c_attn": dense(f"{hp}.attn.c_attn", e, 3 * e),
            "c_proj": dense(f"{hp}.attn.c_proj", e, e),
            "ln_2": ln(f"{hp}.ln_2"),
            "c_fc": dense(f"{hp}.mlp.c_fc", e, 4 * e),
            "mlp_c_proj": dense(f"{hp}.mlp.c_proj", 4 * e, e),
        })
    # stack per-layer trees along axis 0 (the model scans over layers)
    p["h"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    p["ln_f"] = ln("ln_f")
    return {"params": p}


def params_from_hf_model(hf_model, cfg: GPTConfig | None = None) -> tuple:
    """From an in-memory transformers.GPT2LMHeadModel (no network needed)."""
    hf_cfg = hf_model.config
    if cfg is None:
        cfg = GPTConfig(vocab_size=hf_cfg.vocab_size, block_size=hf_cfg.n_positions,
                        n_layer=hf_cfg.n_layer, n_head=hf_cfg.n_head,
                        n_embd=hf_cfg.n_embd, bias=True)
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf_state_dict(sd, cfg), cfg
