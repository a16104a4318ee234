"""Fused pre-norm SwiGLU MLP sublayer: x + w2(silu(w1 h) * w3 h), h = norm(x),
in ONE Pallas program.

Why: at the flagship encoder shape ([128, 6144, 256], hidden 1024) the XLA
chain costs ~8.8 ms/layer — nearly all HBM round-trips of the [B, T, 4E]
hidden activations (w1/w3 each write 1.6 GB, the gate reads them back, w2
reads again). The weights are tiny (1.5 MB bf16). One kernel with the
weights VMEM-resident streams x exactly once: read [tb, E], do the three
dots + gate on-chip, write [tb, E] — ~0.8 GB total traffic instead of ~12.

Numerics mirror the module chain exactly (models/layers.py:Block ->
LayerNorm/RMSNorm + SwiGLU, the reference's Block
reference:models/brainformer.py:115-124,221-245): norm statistics in f32,
activations cast to the compute dtype at each dense boundary, residual add
in the input dtype.

Backward: jax.vjp over the identical functional XLA chain (recompute) — the
trainer remats blocks anyway, so training cost is unchanged while the
forward (and the remat-recompute) ride the kernel... the recompute runs
this same custom_vjp's forward, i.e. the kernel, and only the true backward
sweep uses XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from frankenstein_tpu.ops import norms

FUSED_MLP_VMEM = 40 * 1024 * 1024

# Measured on TPU v5e at the flagship encode shape ([128, 6144, 256], hidden
# 1024, bf16): 436.2 ms fused vs 434.5 ms XLA — a wash. XLA already fuses the
# norm/silu/gate elementwise work into the three matmuls well enough that the
# predicted HBM savings don't materialize, and the fused path costs ~1.5%
# numerics drift (f32-silu ordering). Kept as a tested alternate, default OFF
# (same policy as the fused ln_f+lm_head+top-k decode kernel).
# NOTE: read at TRACE time inside Block.__call__ — an outer jit caches the
# traced value, so toggle this BEFORE the first jitted call for a given
# (module, shape); later toggles do not invalidate existing jit caches.
ENABLED = False

# Test hook: force the fused path in Pallas interpret mode on any backend
# (tests monkeypatch this; production leaves it False and gates on TPU).
FORCE_INTERPRET = False


def norm_fn(x, w, b, kind: str):
    """Functional twin of models/layers.py LayerNorm/RMSNorm modules."""
    if kind == "rmsnorm":
        return norms.rms_norm(x, w, eps=1e-6)
    return norms.layer_norm(x, w, b, eps=1e-5)


def swiglu_fn(h, w1, w3, w2, dtype):
    """Functional twin of models/layers.py:SwiGLU (nn.Dense casts inputs and
    kernels to the compute dtype; silu and the gate run in that dtype)."""
    hc = h.astype(dtype)
    a = jax.nn.silu(hc @ w1.astype(dtype))
    g = a * (hc @ w3.astype(dtype))
    return g.astype(dtype) @ w2.astype(dtype)


def reference_chain(x, nw, nb, w1, w3, w2, *, kind: str, dtype):
    """x + SwiGLU(norm(x)) — the exact XLA composition the kernel replaces."""
    h = norm_fn(x, nw, nb, kind)
    return x + swiglu_fn(h, w1, w3, w2, dtype).astype(x.dtype)


def _pick_tb(t: int) -> int:
    for tb in (512, 256, 128):
        if t % tb == 0:
            return tb
    return 0


def supported(b: int, t: int, e: int, hidden: int, itemsize: int = 2,
              interpret: bool = False) -> bool:
    if not interpret and not FORCE_INTERPRET and jax.default_backend() != "tpu":
        return False
    if e % 128 != 0 or hidden % 128 != 0:
        return False
    tb = _pick_tb(t)
    if tb == 0:
        return False
    resident = (2 * 3 * e * hidden * itemsize        # w1/w3/w2 (db)
                + 2 * 2 * tb * e * itemsize          # x in/out (db)
                + 4 * tb * hidden * 4                # a/b/gate f32 temps
                + 4 * tb * e * 4)                    # norm temps
    return resident < FUSED_MLP_VMEM


def _kernel(x_ref, nw_ref, nb_ref, w1_ref, w3_ref, w2_ref, o_ref,
            *, kind: str, eps_ln: float = 1e-5, eps_rms: float = 1e-6):
    x = x_ref[0]                                     # [tb, E] compute dtype
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    if kind == "rmsnorm":
        normed = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps_rms)
        h = (normed.astype(cdt) * nw_ref[0]).astype(cdt)
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + eps_ln)
        h = (normed.astype(cdt) * nw_ref[0] + nb_ref[0]).astype(cdt)
    a = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
    bb = jax.lax.dot_general(h, w3_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(cdt)
    # silu in f32 of the cdt-rounded activation: Mosaic rejects bf16 silu
    # (f32 constant broadcast into a bf16 vector); differs from the module
    # chain's bf16 silu only below bf16 ULP.
    af = a.astype(jnp.float32)
    g = ((af * jax.lax.logistic(af)).astype(cdt) * bb).astype(cdt)
    y = jax.lax.dot_general(g, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = x + y.astype(cdt)


def _fused_call(x, nw, nb, w1, w3, w2, *, kind: str, interpret: bool):
    b, t, e = x.shape
    hidden = w1.shape[-1]
    tb = _pick_tb(t)
    cdt = x.dtype
    from jax.experimental.pallas import tpu as pltpu

    const = lambda shape: pl.BlockSpec(shape, lambda bi, ti: tuple(
        0 for _ in shape))
    xspec = pl.BlockSpec((1, tb, e), lambda bi, ti: (bi, ti, 0))
    return pl.pallas_call(
        functools.partial(_kernel, kind=kind),
        grid=(b, t // tb),
        in_specs=[
            xspec,
            const((1, e)), const((1, e)),
            const((e, hidden)), const((e, hidden)), const((hidden, e)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, e), cdt),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=FUSED_MLP_VMEM),
        interpret=interpret,
    )(x, nw.reshape(1, e).astype(jnp.float32),
      (nb if nb is not None else jnp.zeros((e,), jnp.float32)
       ).reshape(1, e).astype(jnp.float32),
      w1.astype(cdt), w3.astype(cdt), w2.astype(cdt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_norm_swiglu(x, nw, nb, w1, w3, w2, kind: str, interpret: bool):
    return _fused_call(x, nw, nb, w1, w3, w2, kind=kind, interpret=interpret)


def _fused_fwd(x, nw, nb, w1, w3, w2, kind, interpret):
    out = _fused_call(x, nw, nb, w1, w3, w2, kind=kind, interpret=interpret)
    return out, (x, nw, nb, w1, w3, w2)


def _fused_bwd(kind, interpret, res, dy):
    x, nw, nb, w1, w3, w2 = res
    if nb is None:
        ref = lambda x, nw, w1, w3, w2: reference_chain(
            x, nw, None, w1, w3, w2, kind=kind, dtype=x.dtype)
        _, vjp = jax.vjp(ref, x, nw, w1, w3, w2)
        dx, dnw, dw1, dw3, dw2 = vjp(dy)
        return dx, dnw, None, dw1, dw3, dw2
    ref = lambda x, nw, nb, w1, w3, w2: reference_chain(
        x, nw, nb, w1, w3, w2, kind=kind, dtype=x.dtype)
    _, vjp = jax.vjp(ref, x, nw, nb, w1, w3, w2)
    return vjp(dy)


_fused_norm_swiglu.defvjp(_fused_fwd, _fused_bwd)


def fused_norm_swiglu(x, nw, nb, w1, w3, w2, *, kind: str = "layernorm",
                      interpret=None) -> jnp.ndarray:
    """x: [B, T, E] -> x + w2(silu(w1 norm(x)) * w3 norm(x)).

    Callers gate on ``supported()``; weights are the f32 flax params
    (cast to the compute dtype at the call boundary, hoisted by XLA)."""
    if interpret is None:
        interpret = FORCE_INTERPRET
    return _fused_norm_swiglu(x, nw, nb, w1, w3, w2, kind, interpret)
