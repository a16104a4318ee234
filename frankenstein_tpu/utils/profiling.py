"""MFU estimation and profiler capture.

TPU re-anchor of reference:models/gpt2_model.py:312-326 (the PaLM App. B
analytic-FLOPs formula vs A100 312 TF): peak FLOPs come from the actual TPU
generation; ``trace`` wraps jax.profiler for on-demand captures."""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

# bf16 peak FLOPs per chip
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}
A100_PEAK_FLOPS = 312e12

# HBM bandwidth per chip (bytes/s)
TPU_HBM_BW = {
    "v4": 1228e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v6e": 1640e9,
}


def detect_hbm_bw(default: float = TPU_HBM_BW["v5e"]) -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    key = kind.replace(" ", "").replace("tpu", "")
    for gen, bw in TPU_HBM_BW.items():
        if gen in key:
            return bw
    if "v5lite" in key:
        return TPU_HBM_BW["v5e"]
    return default


def detect_peak_flops(default: float = TPU_PEAK_FLOPS["v5e"]) -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for gen, flops in TPU_PEAK_FLOPS.items():
        if gen in kind.replace(" ", "").replace("tpu", ""):
            return flops
    if "v5lite" in kind.replace(" ", "") or "v5 lite" in kind:
        return TPU_PEAK_FLOPS["v5e"]
    return default


def transformer_flops_per_token(n_params: int, n_layer: int, n_head: int,
                                head_dim: int, seq_len: int) -> float:
    """PaLM Appendix B: 6N + 12*L*H*Q*T (reference:gpt2_model.py:315-319)."""
    return 6 * n_params + 12 * n_layer * n_head * head_dim * seq_len


def block_stack_fwd_flops(seq: int, dim: int, hidden: int, n_heads: int,
                          head_dim: int, n_layers: int, *,
                          kv_seq: Optional[int] = None,
                          n_mlp_mats: int = 3) -> float:
    """Analytic forward matmul FLOPs for a stack of attention blocks.

    Per token per layer: qkv projections + output projection + MLP matmuls
    (3 for SwiGLU, 2 for GELU) + the two attention dots over ``kv_seq`` keys.
    Same accounting as the PaLM App. B formula the reference uses
    (reference:gpt2_model.py:315-319), fwd-only (x3 for fwd+bwd).
    """
    kv = kv_seq if kv_seq is not None else seq
    inner = n_heads * head_dim
    qkv = 2 * dim * 3 * inner
    proj = 2 * inner * dim
    mlp = 2 * dim * hidden * n_mlp_mats
    attn = 4 * kv * inner
    return float(n_layers) * seq * (qkv + proj + mlp + attn)


def franky_encode_flops_per_sample(cfg) -> float:
    """Forward FLOPs of the Franky BrainEncoder path (MAE encoder +
    Perceiver cross/self blocks + output projection) — the encode phase of
    decode serving, i.e. everything before the GPT."""
    e, p = cfg.brain.encoder, cfg.brain
    n_tok = e.block_size
    enc = (2 * e.patch_size * e.dim * n_tok
           + block_stack_fwd_flops(n_tok, e.dim, e.hidden_dim, e.n_heads,
                                   e.head_dim, e.n_layers))
    nq = p.n_output_tokens
    inner = p.n_heads * p.head_dim
    cross = p.n_layers * (2 * p.dim * inner * nq            # q proj
                          + 2 * p.dim * 2 * inner * n_tok   # kv proj
                          + 4 * n_tok * inner * nq          # attention dots
                          + 2 * inner * p.dim * nq)
    perceiver = cross + block_stack_fwd_flops(nq, p.dim, p.hidden_dim,
                                              p.n_heads, p.head_dim,
                                              p.n_layers)
    proj_out = 2 * p.dim * p.output_dim * nq
    return enc + perceiver + proj_out


def franky_fwd_flops_per_sample(cfg) -> float:
    """Forward FLOPs of one Franky sample (encoder + Perceiver + GPT)."""
    g = cfg.gpt
    t_full = cfg.brain.n_output_tokens + cfg.max_tokens
    gpt = (block_stack_fwd_flops(t_full, g.n_embd, 4 * g.n_embd, g.n_head,
                                 g.head_dim, g.n_layer, n_mlp_mats=2)
           + 2 * g.n_embd * g.vocab_size * cfg.max_tokens)  # tied lm head
    return franky_encode_flops_per_sample(cfg) + gpt


def franky_llama_fwd_flops_per_sample(cfg) -> float:
    """Forward FLOPs of one FrankyLlama sample (encoder + Perceiver +
    LLaMA with GQA-sized kv projections)."""
    lm = cfg.lm
    t_full = cfg.brain.n_output_tokens + cfg.max_tokens
    hd = lm.head_dim
    # SwiGLU stack with full-width qkv, then subtract the GQA kv savings:
    # block_stack prices k/v at n_heads*head_dim; llama uses n_kv_heads
    stack = block_stack_fwd_flops(t_full, lm.dim, lm.hidden_dim, lm.n_heads,
                                  hd, lm.n_layers, n_mlp_mats=3)
    gqa_save = (lm.n_layers * t_full
                * 2 * lm.dim * 2 * (lm.n_heads - lm.n_kv_heads) * hd)
    head = 2 * lm.dim * lm.vocab_size * cfg.max_tokens
    return franky_encode_flops_per_sample(cfg) + stack - gqa_save + head


def gpt_decode_hbm_bytes(gcfg, batch: int, cache_len: int, n_tokens: int,
                         *, weight_bytes: int = 2, cache_bytes: int = 2,
                         lm_head_bytes: int = None,
                         lm_head_every_step: bool = True) -> float:
    """Minimum HBM traffic (bytes) for ``n_tokens`` KV-cached GPT decode
    steps at batch ``batch`` — the roofline denominator for
    ``decode_hbm_util``.

    Per step: every block weight matrix is read once (qkv E*3E + proj E*E +
    MLP 2*E*4E = 12E^2 per layer), the lm_head (E*vocab) is read once, the
    full allocated K/V cache (2 * L * B * cache_len * E) is read, and one
    row per layer is written. Activations are VMEM-resident in the fused
    kernel (ops/pallas/fused_decode.py) and don't count.

    ``weight_bytes`` sizes the BLOCK weights; ``lm_head_bytes`` the tied
    lm_head table (defaults to weight_bytes). They differ under w8a16:
    quantize_decode_weights quantizes only the block-stack matmuls — the
    lm_head still streams in the compute dtype every step.
    """
    e = gcfg.n_embd
    if lm_head_bytes is None:
        lm_head_bytes = weight_bytes
    block_w = gcfg.n_layer * 12 * e * e * weight_bytes
    lm_head = (e * gcfg.vocab_size * lm_head_bytes
               if lm_head_every_step else 0.0)
    cache_read = 2 * gcfg.n_layer * batch * cache_len * e * cache_bytes
    cache_write = 2 * gcfg.n_layer * batch * e * cache_bytes
    return float(n_tokens) * (block_w + lm_head + cache_read + cache_write)


def mae_fwd_flops_per_sample(cfg) -> float:
    """MAE pretraining forward: encoder on kept tokens + dense decoder."""
    n_tok = cfg.block_size
    kept = n_tok - int(cfg.masking_ratio * n_tok)
    enc = (2 * cfg.patch_size * cfg.dim * kept
           + block_stack_fwd_flops(kept, cfg.dim, cfg.hidden_dim, cfg.n_heads,
                                   cfg.head_dim, cfg.n_layers))
    dec = block_stack_fwd_flops(n_tok, cfg.decoder_dim, cfg.hidden_dim,
                                cfg.n_heads, cfg.head_dim, cfg.n_dec_layers)
    head = 2 * cfg.decoder_dim * cfg.patch_size * n_tok
    return enc + dec + head


def vqvae_fwd_flops_per_sample(cfg, t: int = 768) -> float:
    """Causal-conv codec: 2*Cin*Cout*k*T_out per conv (vq_brain geometry)."""

    def conv(cin, cout, k, tout):
        return 2.0 * cin * cout * k * tout

    def res_units(ch, tout):
        # 3 ResidualUnits: k3 dilated conv + 1x1 conv each
        return 3 * (conv(ch, ch, 3, tout) + conv(ch, ch, 1, tout))

    total, cur_t = 0.0, t
    total += conv(cfg.n_electrodes, cfg.C, 5, cur_t)
    for s in cfg.strides:
        total += res_units(cfg.C, cur_t)
        cur_t //= s
        total += conv(cfg.C, cfg.C, 2 * s, cur_t)
    total += conv(cfg.C, cfg.D, 3, cur_t)
    total += 2 * cfg.D * cfg.codebook_size * cur_t      # VQ lookup
    total += conv(cfg.D, cfg.C, 3, cur_t)
    for s in reversed(cfg.strides):
        total += conv(cfg.C, cfg.C, 2 * s, cur_t)
        cur_t *= s
        total += res_units(cfg.C, cur_t)
    total += conv(cfg.C, cfg.n_electrodes, 5, cur_t)
    return total


def estimate_mfu(flops_per_iter: float, iter_time_s: float,
                 peak_flops: Optional[float] = None,
                 n_chips: int = 1) -> float:
    peak = peak_flops if peak_flops is not None else detect_peak_flops()
    return flops_per_iter / max(iter_time_s, 1e-12) / (peak * n_chips)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace capture around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def count_parameters(params) -> int:
    """Total parameter count (reference:utils/train_utils.py:40-47)."""
    import numpy as np
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
