"""Fused LN + tied-embedding LM head + per-chunk top-k for the decode loop.

Motivation (measured on v5e, batch 128): the decode loop's cost is NOT the
ops' FLOPs/bytes — the fused transformer kernel runs at its HBM roofline
(~0.46 ms) but the full loop body sits at ~1.0-1.1 ms/step, and swapping
embed/head formulations (gathers vs one-hot matmuls vs pre-transposed
tables) moves nothing: the overhead is the long serial chain of XLA ops and
kernel transitions (ln_f -> [B,V] einsum -> 25.7 MB f32 logits round-trip ->
approx_max_k -> categorical -> embed) between Pallas calls. This kernel
collapses ln_f + lm_head + top-k into ONE program that:

- streams the pre-transposed tied table ``w_t [E, V]`` once (77 MB bf16,
  its roofline), one vocab chunk per grid step;
- computes the layer-norm of x in-kernel (f32) and the chunk logits on the
  MXU with f32 accumulation;
- reduces each chunk to its top-k (iterative max-and-mask — Mosaic has no
  sort) plus (max, sum-exp) softmax statistics, so the caller can
  reconstruct exact global top-k candidates AND the exact global logsumexp
  from [B, nc, k] + [B, nc] outputs — the [B, 50304] f32 logits tensor
  never exists;
- the caller finishes with a top-k over nc*k <= 128 candidates (trivial).

The reference has no analog (its generate re-runs a full forward and full
softmax per token, reference:models/gpt2_model.py:328-353).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)
# chunk must divide the (padded) vocab AND be lane-aligned (%128):
# 50304 = 128 * 393 = 3 * 16768; a [768, 16768] bf16 block is 24.6 MiB
_CHUNK = 16768


def _kernel(x_ref, lnw_ref, lnb_ref, w_ref, vals_ref, idx_ref, m_ref, se_ref,
            *, k: int, chunk: int, eps: float):
    j = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)                    # [B, E]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    h = h * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(h.astype(w_ref.dtype), w_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    b = logits.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)

    m = jnp.max(logits, axis=-1)                          # [B]
    se = jnp.sum(jnp.exp(logits - m[:, None]), axis=-1)   # [B]
    m_ref[:, j, :] = m[:, None]
    se_ref[:, j, :] = se[:, None]

    # iterative top-k: k passes of (row max, first argmax, mask out);
    # results collected in registers and written once per chunk
    work = logits
    vs, ids = [], []
    for i in range(k):
        v = jnp.max(work, axis=-1)                        # [B]
        is_max = work == v[:, None]
        a = jnp.min(jnp.where(is_max, col, jnp.int32(2 ** 30)), axis=-1)
        vs.append(v)
        ids.append(a + j * chunk)
        work = jnp.where(col == a[:, None], NEG_INF, work)
    vals_ref[:, j, :] = jnp.stack(vs, axis=1)
    idx_ref[:, j, :] = jnp.stack(ids, axis=1)


def supported(b: int, e: int, v: int, chunk: int = _CHUNK,
              interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    return (v % chunk == 0 and chunk % 128 == 0 and e % 128 == 0
            and b % 8 == 0)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def lm_head_topk(x, ln_w, ln_b, w_t, *, k: int = 10, eps: float = 1e-5,
                 chunk: int = _CHUNK, interpret: bool = False):
    """x: [B, E] pre-ln_f activations; w_t: [E, V] pre-transposed tied table.

    Returns (vals [B, nc*k] f32, idx [B, nc*k] int32, logz [B] f32): the
    global top-k are among the nc*k candidates (each chunk contributes its
    own top-k), and ``logz`` is the EXACT full-vocab logsumexp — so
    ``vals - logz`` are exact log-probs for every candidate.
    """
    b, e = x.shape
    v = w_t.shape[1]
    nc = v // chunk
    vals, idx, m, se = pl.pallas_call(
        functools.partial(_kernel, k=k, chunk=chunk, eps=eps),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((b, e), lambda j: (0, 0)),
            pl.BlockSpec((1, e), lambda j: (0, 0)),
            pl.BlockSpec((1, e), lambda j: (0, 0)),
            pl.BlockSpec((e, chunk), lambda j: (0, j)),
        ],
        # outputs stay VMEM-resident across the whole grid (constant index
        # maps — they are tiny); each step stores its chunk's column j.
        out_specs=[
            pl.BlockSpec((b, nc, k), lambda j: (0, 0, 0)),
            pl.BlockSpec((b, nc, k), lambda j: (0, 0, 0)),
            pl.BlockSpec((b, nc, 1), lambda j: (0, 0, 0)),
            pl.BlockSpec((b, nc, 1), lambda j: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nc, k), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, k), jnp.int32),
            jax.ShapeDtypeStruct((b, nc, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, 1), jnp.float32),
        ],
        interpret=interpret,
        # the [E, chunk] weight block double-buffers at 2 x 24.6 MiB —
        # past the 16.5M default scoped-vmem limit, well under the raised one
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, ln_w[None], ln_b[None], w_t)
    m, se = m[..., 0], se[..., 0]                         # [B, nc]
    mg = jnp.max(m, axis=-1)                              # [B]
    logz = mg + jnp.log(jnp.sum(se * jnp.exp(m - mg[:, None]), axis=-1))
    return vals.reshape(b, nc * k), idx.reshape(b, nc * k), logz
