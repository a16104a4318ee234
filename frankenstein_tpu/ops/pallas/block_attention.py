"""Slab-causal flash attention (Pallas, TPU).

The BrainFormer encoder attends over T = (window/patch) * n_electrodes tokens
(6144 for the flagship config) under the structure

    allowed(i, j) <=> slab(j) <= slab(i),  slab(t) = t // P,  P = tok_per_time

(reference:models/brainformer.py:93-111 builds this as a dense 6144^2 bool
buffer and hands it to SDPA — 36M mask elements + full score materialization
in HBM per head).

Kernel design (v2 — big-dot formulation): one program per (batch*head,
q-slab). K/V for the (b,h) pair stay resident in VMEM (~0.4 MB each in bf16)
and each program runs exactly TWO MXU dots:

    s   = q_slab @ K^T        [P, T]   (K-dim = head_dim)
    out = softmax(s) @ V      [P, D]   (K-dim = T: full MXU utilization)

The slab mask is applied as an iota comparison on s (VPU, no stored mask).
A tiled fori-loop variant was 4x slower in practice: many small [P,D]@[D,P]
dots stall the MXU pipeline; one long-N dot + one long-K dot keep it fed.
Scores never touch HBM. Rows attend to >= 1 slab so the softmax is safe.

Forward also emits the per-row logsumexp ([BH, 1, T] layout — lane dim = full
row, TPU block rules); backward is two more Pallas kernels built from the
standard flash recomputation identities, with the same big-dot structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

VMEM_BUDGET = 15 * 1024 * 1024  # leave headroom under ~16MB/core


def supported(q: jnp.ndarray, k: jnp.ndarray, tok_per_time: int,
              interpret: bool = False) -> bool:
    """Whether the kernel handles this problem (else caller falls back to XLA)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if tok_per_time <= 0:
        return False
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if tq != tk:                    # self-attention over the full window only
        return False
    if tq % tok_per_time != 0:
        return False
    # lane-dim dynamic stores (the LSE row) need 128-multiple offsets
    if tok_per_time % 128 != 0 or tok_per_time > 1024:
        return False
    if d > 256:
        return False
    itemsize = jnp.dtype(q.dtype).itemsize
    lanes_d = max(d, 128)
    # residency: K+V (+Q+dO in bwd) at [T, d] plus one [P, T] f32 score tile
    resident = (4 * tq * lanes_d * itemsize + tok_per_time * tq * 4
                + 2 * tq * 4)
    return resident < VMEM_BUDGET


NEG_INF = float(jnp.finfo(jnp.float32).min)


def _row_mask(i, block: int, t: int):
    """[P, T] bool: key slab <= query slab (query slab == program id i)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (block, t), 1)
    return (col // block) <= i


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _pick_chunk(t: int, block: int) -> int:
    """kv-chunk length: a slab multiple near 2048 that divides T.

    Measured on v5e (b=128, h=8, t=6144, d=32, bf16): chunk 2048 ~= one full-T
    dot (~51% MFU — the MXU pipeline wants long dots), chunk 512 is 30%
    slower; causal chunk-skipping saves no wall-clock because skipped chunks
    still pay their prefetch DMA. 2048 keeps the VMEM watermark low enough
    for windows beyond the flagship's 6144 tokens.
    """
    for cand in (2048, 1024, 3072, 512, 256, 128):
        if cand % block == 0 or block % cand == 0:
            c = max(cand, block)
            if t % c == 0:
                return c
    return t


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, block: int, chunk: int, scale: float):
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    # chunks containing key slabs <= i: ceil((i+1)*block / chunk)
    last = (i * block) // chunk     # index of the chunk holding the diagonal

    @pl.when(c == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(c <= last)
    def _process():
        q = q_ref[0]                               # [P, D]
        kc = k_ref[0]                              # [C, D]
        vc = v_ref[0]
        s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        # mask only matters on the diagonal chunk (key slab > query slab)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c * chunk
        s = jnp.where((col // block) <= i, s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[...] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(i * block, block)] = (m_scr[...] + jnp.log(l))[:, 0]


def _fwd(q3, k3, v3, *, block: int, scale: float, interpret: bool):
    bh, t, d = q3.shape
    chunk = _pick_chunk(t, block)
    grid = (bh, t // block, t // chunk)
    from jax.experimental.pallas import tpu as pltpu
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block=block, chunk=chunk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, d), lambda b, i, c: (b, i, 0)),
            pl.BlockSpec((1, chunk, d), lambda b, i, c: (b, c, 0)),
            pl.BlockSpec((1, chunk, d), lambda b, i, c: (b, c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda b, i, c: (b, i, 0)),
            pl.BlockSpec((1, 1, t), lambda b, i, c: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * bh * t * (t + chunk) // 2 * d),
            bytes_accessed=int(4 * bh * t * d * 4),
            transcendentals=int(bh * t * (t + chunk) // 2),
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, block: int, scale: float):
    i = pl.program_id(1)
    q = q_ref[0]
    do = do_ref[0]
    kf = k_ref[0]
    vf = v_ref[0]
    t = kf.shape[0]
    lse = lse_ref[0, 0, pl.ds(i * block, block)][:, None]
    delta = delta_ref[0, 0, pl.ds(i * block, block)][:, None]

    s = jax.lax.dot_general(q, kf, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(_row_mask(i, block, t), s, NEG_INF)
    p = jnp.exp(s - lse)                                           # [P, T]
    dp = jax.lax.dot_general(do, vf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [P, T]
    ds = (p * (dp - delta) * scale).astype(kf.dtype)
    dq = jax.lax.dot_general(ds, kf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block: int, scale: float):
    j = pl.program_id(1)
    qf = q_ref[0]                                  # [T, D]
    dof = do_ref[0]
    kj = k_ref[0]                                  # [P, D]
    vj = v_ref[0]
    t = qf.shape[0]
    lse = lse_ref[0, 0, :][:, None]                # [T, 1]
    delta = delta_ref[0, 0, :][:, None]

    # s_all[q, kv] for this kv slab: [T, P]; query slab >= j is allowed
    s = jax.lax.dot_general(qf, kj, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (t, kj.shape[0]), 0)
    s = jnp.where((row // block) >= j, s, NEG_INF)
    p = jnp.exp(s - lse)                                           # [T, P]
    dv = jax.lax.dot_general(p.astype(dof.dtype), dof,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [P, D]
    dp = jax.lax.dot_general(dof, vj, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [T, P]
    ds = (p * (dp - delta) * scale).astype(qf.dtype)
    dk = jax.lax.dot_general(ds, qf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [P, D]
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(q3, k3, v3, o3, do3, lse, *, block: int, scale: float, interpret: bool):
    bh, t, d = q3.shape
    delta = jnp.sum(o3.astype(jnp.float32) * do3.astype(jnp.float32),
                    axis=-1)[:, None, :]                       # [BH, 1, T]

    grid = (bh, t // block)
    qblk = pl.BlockSpec((1, block, d), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0))
    vec = pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block=block, scale=scale),
        grid=grid,
        in_specs=[qblk, full, full, qblk, vec, vec],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q3.dtype),
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block=block, scale=scale),
        grid=grid,
        in_specs=[full, qblk, qblk, full, vec, vec],
        out_specs=[qblk, qblk],
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), k3.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), v3.dtype)],
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _slab_attention(q3, k3, v3, block: int, interpret: bool):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, _ = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret)
    return out


def _slab_attention_fwd(q3, k3, v3, block: int, interpret: bool):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, lse = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret)
    return out, (q3, k3, v3, out, lse)


def _slab_attention_bwd(block: int, interpret: bool, res, do3):
    q3, k3, v3, out, lse = res
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    dq, dk, dv = _bwd(q3, k3, v3, out, do3, lse,
                      block=block, scale=scale, interpret=interpret)
    return dq, dk, dv


_slab_attention.defvjp(_slab_attention_fwd, _slab_attention_bwd)


def slab_causal_attention(q, k, v, tok_per_time: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Flash attention under slab-causality. q/k/v: [B, T, H, D] -> [B, T, H, D]."""
    b, t, h, d = q.shape
    to3 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    out3 = _slab_attention(to3(q), to3(k), to3(v), tok_per_time, interpret)
    return jnp.transpose(out3.reshape(b, h, t, d), (0, 2, 1, 3))
