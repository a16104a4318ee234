"""Shared transformer blocks (flax.linen).

TPU-native re-design of the reference's block zoo
(reference:models/brainformer.py:113-268, duplicated in models/simple_mae):

- SwiGLU MLP (w1/w3 gate, w2 project, no bias)
- multi-head self attention with RoPE + structured masks, dispatching to the
  Pallas slab-causal kernel when the shape qualifies
- cross attention (Perceiver read-out)
- pre-norm residual Block (LayerNorm or RMSNorm variant — the reference uses
  LayerNorm in brainformer.py:237 and RMSNorm in simple_mae:197)
- CrossBlock: cross-attn -> MLP -> self-attn Block
  (reference:models/brainformer.py:247-268)

All modules take ``dtype`` (compute, bf16 on TPU) and keep params in fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from frankenstein_tpu.ops import attention as attn_ops
from frankenstein_tpu.ops import norms


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_params: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        if return_params:
            return weight, None
        return norms.rms_norm(x, weight, self.eps)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_params: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
                if self.use_bias else None)
        if return_params:
            return weight, bias
        return norms.layer_norm(x, weight, bias, self.eps)


def make_norm(kind: str, dim: int, name: str):
    if kind == "rmsnorm":
        return RMSNorm(dim, name=name)
    return LayerNorm(dim, name=name)


class _DenseKernel(nn.Module):
    """Declares a bias-free Dense kernel param (path ``<name>/kernel``, same
    init as ``nn.Dense``) without forcing a matmul — so callers can either run
    the standard XLA chain or hand the raw weights to a fused Pallas kernel
    while the param tree stays byte-identical to the ``nn.Dense`` layout that
    checkpoints and the TP sharding rules (parallel/sharding.py) match on."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.features), jnp.float32)


class SwiGLU(nn.Module):
    """reference:models/brainformer.py:115-124 (w2(silu(w1 x) * w3 x)).

    Numerics are the exact ``nn.Dense(dtype=...)`` composition (inputs and
    kernels cast to the compute dtype at each dense boundary) via
    ``ops.pallas.fused_mlp.swiglu_fn``; ``return_params=True`` exposes the
    kernels for the fused norm+MLP Pallas path in ``Block``."""

    dim: int
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, return_params: bool = False):
        in_dim = self.dim if x is None else x.shape[-1]
        w1 = _DenseKernel(in_dim, self.hidden_dim, name="w1")()
        w3 = _DenseKernel(in_dim, self.hidden_dim, name="w3")()
        w2 = _DenseKernel(self.hidden_dim, self.dim, name="w2")()
        if return_params:
            return w1, w3, w2
        from frankenstein_tpu.ops.pallas import fused_mlp
        return fused_mlp.swiglu_fn(x, w1, w3, w2, self.dtype)


class SelfAttention(nn.Module):
    """MHA with RoPE and structured masks (reference:models/brainformer.py:126-173)."""

    dim: int
    n_heads: int
    head_dim: int
    dtype: Any = jnp.float32
    rope_align: str = "suffix"

    @nn.compact
    def __call__(self, x, *, mask=None, mask_mode=None, tok_per_time=0,
                 positions=None, rope=None, impl="auto", qk_int8=False):
        """qk_int8 runs the slab QK score dot at the MXU's int8 rate
        (serving-grade accuracy; gradients are approximately
        straight-through — the bwd recomputes exact bf16 dots against the
        quantized forward's out/lse residuals, so softmax probabilities
        don't renormalize and grads deviate from true bf16 grads by a
        bound set by the quantization error, ~1.5% measured in interpret
        mode). Only the rope-fused Pallas path honors it; fallbacks call
        ``attn_ops.qk_int8_fallback`` (warn, or raise under
        FK_QK_INT8_STRICT=1) and compute exact bf16."""
        b, t, _ = x.shape
        inner = self.n_heads * self.head_dim
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        # NOTE on layout strategy (measured on v5e at the flagship shape):
        # - a folded XLA fast path (rope + attention on [B, T, E] via
        #   ops/rope.py:apply_rope_folded + slab_attention_folded) measured
        #   SLOWER (127 vs 112 ms/layer): the roll-based folded rope loses
        #   to the reshape form under XLA.
        # - the rope-FUSED Pallas path below (q/k/v stay [B, T, E]; RoPE
        #   rotates inside the kernel) measured FASTER (101 vs 112 ms/layer,
        #   bit-identical output) and is taken when the geometry qualifies.
        shape = (b, t, self.n_heads, self.head_dim)
        qf = dense(inner, "qw")(x)
        kf = dense(inner, "kw")(x)
        vf = dense(inner, "vw")(x)
        if (rope is not None and getattr(rope, "ndim", 0) == 3
                and rope.shape[0] >= t and mask is None and positions is None
                and mask_mode == "slab"
                and (self.rope_align == "suffix" or rope.shape[0] == t)
                and impl == "auto"):
            from frankenstein_tpu.ops.pallas import block_attention
            if block_attention.rope_fused_supported(
                    b, t, inner, self.n_heads, tok_per_time,
                    jnp.dtype(qf.dtype).itemsize):
                out = attn_ops.slab_attention_rope_fused(
                    qf, kf, vf, n_heads=self.n_heads,
                    tok_per_time=tok_per_time, rope_cache=rope,
                    qk_int8=qk_int8)
                return dense(self.dim, "project")(out)
        if qk_int8:
            attn_ops.qk_int8_fallback(
                f"SelfAttention path is not rope-fused (mask_mode="
                f"{mask_mode!r}, impl={impl!r}, b={b}, t={t})")
        q, k, v = qf.reshape(shape), kf.reshape(shape), vf.reshape(shape)
        if rope is not None:
            from frankenstein_tpu.ops import rope as rope_ops
            q = rope_ops.apply_rope(q, rope, align=self.rope_align)
            k = rope_ops.apply_rope(k, rope, align=self.rope_align)

        if impl == "ring":
            # sequence parallelism: K/V blocks rotate the ICI ring
            # (parallel/ring_attention.py); masks from GLOBAL positions,
            # so the math matches the single-device paths exactly
            from frankenstein_tpu.parallel import ring_attention as ra
            mesh = ra.ambient_seq_mesh()
            if mesh is None:
                raise ValueError(
                    "impl='ring' needs an active `with mesh:` whose axes "
                    f"include '{ra.SEQ_AXIS}'")
            if mask is not None or positions is not None:
                raise NotImplementedError(
                    "ring attention supports mask_mode-style masks only")
            out = ra.ring_attention_sharded(
                mesh, q, k, v,
                causal=(mask_mode == "causal"),
                slab=tok_per_time if mask_mode == "slab" else None)
            return dense(self.dim, "project")(out.reshape(b, t, inner))

        out = attn_ops.dot_product_attention(
            q, k, v, mask=mask, mask_mode=mask_mode,
            tok_per_time=tok_per_time, positions=positions, impl=impl)
        out = out.reshape(b, t, inner)
        return dense(self.dim, "project")(out)


class CrossAttention(nn.Module):
    """Queries read from a (longer) context (reference:models/brainformer.py:175-219)."""

    dim: int
    n_heads: int
    head_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, *, mask=None):
        b, t, _ = x.shape
        tk = context.shape[1]
        inner = self.n_heads * self.head_dim
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        q = dense(inner, "qw")(x).reshape(b, t, self.n_heads, self.head_dim)
        k = dense(inner, "kw")(context).reshape(b, tk, self.n_heads, self.head_dim)
        v = dense(inner, "vw")(context).reshape(b, tk, self.n_heads, self.head_dim)
        out = attn_ops.dot_product_attention(q, k, v, mask=mask)
        return dense(self.dim, "project")(out.reshape(b, t, inner))


class Block(nn.Module):
    """Pre-norm residual block (reference:models/brainformer.py:234-245)."""

    dim: int
    n_heads: int
    head_dim: int
    hidden_dim: int
    norm: str = "layernorm"
    dtype: Any = jnp.float32
    rope_align: str = "suffix"

    @nn.compact
    def __call__(self, x, *, mask=None, mask_mode=None, tok_per_time=0,
                 positions=None, rope=None, impl="auto", qk_int8=False):
        attn = SelfAttention(self.dim, self.n_heads, self.head_dim,
                             dtype=self.dtype, rope_align=self.rope_align,
                             name="attn")
        mlp = SwiGLU(self.dim, self.hidden_dim, dtype=self.dtype, name="mlp")
        x = x + attn(make_norm(self.norm, self.dim, "ln_1")(x),
                     mask=mask, mask_mode=mask_mode,
                     tok_per_time=tok_per_time, positions=positions,
                     rope=rope, impl=impl, qk_int8=qk_int8)
        norm2 = make_norm(self.norm, self.dim, "ln_2")
        from frankenstein_tpu.ops.pallas import fused_mlp
        b, t, e = x.shape
        if (impl == "auto" and fused_mlp.ENABLED
                and x.dtype == jnp.dtype(self.dtype)
                and fused_mlp.supported(b, t, e, self.hidden_dim,
                                        jnp.dtype(x.dtype).itemsize)):
            nw, nb = norm2(None, return_params=True)
            w1, w3, w2 = mlp(return_params=True)
            return fused_mlp.fused_norm_swiglu(x, nw, nb, w1, w3, w2,
                                               kind=self.norm)
        return x + mlp(norm2(x))


class CrossBlock(nn.Module):
    """cross-attn + MLP, then a self-attn Block
    (reference:models/brainformer.py:247-268)."""

    dim: int
    n_heads: int
    head_dim: int
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, *, self_mask=None, cross_mask=None, sa_rope=None):
        cross = CrossAttention(self.dim, self.n_heads, self.head_dim,
                               dtype=self.dtype, name="cross_attn")
        mlp = SwiGLU(self.dim, self.hidden_dim, dtype=self.dtype, name="mlp")
        x = x + cross(LayerNorm(self.dim, name="ln_1")(x), context, mask=cross_mask)
        x = x + mlp(LayerNorm(self.dim, name="ln_2")(x))
        x = Block(self.dim, self.n_heads, self.head_dim, self.hidden_dim,
                  dtype=self.dtype, name="sa_block")(x, mask=self_mask, rope=sa_rope)
        return x
