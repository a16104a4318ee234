"""Mask-free slab-causal flash attention (Pallas, TPU).

The BrainFormer encoder attends over T = (window/patch) * n_electrodes tokens
(6144 for the flagship config) under the structure

    allowed(i, j) <=> slab(j) <= slab(i),  slab(t) = t // P,  P = tok_per_time

(reference:models/brainformer.py:93-111 builds this as a dense 6144^2 bool
buffer and hands it to SDPA; that is 36M mask elements + full score
materialization per head).

Here the query block size equals P, so every (q-block, kv-block) tile is
either fully allowed (j <= i) or entirely skipped (j > i) — no per-element
mask ever exists, and the kv loop for query block i runs only i+1 iterations:
half the FLOPs of dense attention plus zero mask traffic.

Forward saves the per-row logsumexp (layout [BH, 1, T] so the lane dim is the
full row — TPU block rules); the backward pass is two more Pallas kernels (dq
and dkv) using the standard flash-attention recomputation identities. K/V/dO
for one (batch, head) fit comfortably in VMEM at these shapes (T*D*4B ~ 0.8 MB
each), so the kernels keep them resident and loop over tiles with the MXU
doing all the work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under ~16MB/core


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
    # K, V (+ q/do/lse/delta in bwd) resident per (b, h)
    resident = 6 * tq * max(d, 128) * 4
    return resident < VMEM_BUDGET


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block: int, scale: float):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)          # [P, D]
    d = q.shape[-1]

    m0 = jnp.full((block, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block, 1), jnp.float32)
    acc0 = jnp.zeros((block, d), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)   # [P, D]
        vj = v_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vj, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, i + 1, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0, pl.ds(i * block, block)] = (m + jnp.log(l))[:, 0]


def _fwd(q3, k3, v3, *, block: int, scale: float, interpret: bool):
    bh, t, d = q3.shape
    grid = (bh, t // block)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block=block, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, t), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * bh * (t * (t + block) // 2) * d),
            bytes_accessed=int(4 * bh * t * d * 4),
            transcendentals=int(bh * t * (t + block) // 2),
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
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(i * block, block)][:, None]
    delta = delta_ref[0, 0, pl.ds(i * block, block)][:, None]
    d = q.shape[-1]

    def body(j, dq):
        kj = k_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        vj = v_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vj, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(ds, kj, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, i + 1, body, jnp.zeros((block, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block: int, scale: float):
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    kj = k_ref[0].astype(jnp.float32)         # [P, D]
    vj = v_ref[0].astype(jnp.float32)
    d = kj.shape[-1]

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * block, block), :].astype(jnp.float32)
        doi = do_ref[0, pl.ds(i * block, block), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block, block)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block, block)][:, None]
        s = jax.lax.dot_general(qi, kj, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                                   # [Pq, Pk]
        dv_new = dv + jax.lax.dot_general(p, doi, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doi, vj, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk_new = dk + jax.lax.dot_general(ds, qi, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        return dk_new, dv_new

    init = (jnp.zeros((block, d), jnp.float32), jnp.zeros((block, d), jnp.float32))
    dk, dv = jax.lax.fori_loop(j, n_blocks, body, init)
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
