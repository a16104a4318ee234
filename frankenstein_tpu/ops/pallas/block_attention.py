"""Slab-causal flash attention (Pallas, TPU).

The BrainFormer encoder attends over T = (window/patch) * n_electrodes tokens
(6144 for the flagship config) under the structure

    allowed(i, j) <=> slab(j) <= slab(i),  slab(t) = t // P,  P = tok_per_time

(reference:models/brainformer.py:93-111 builds this as a dense 6144^2 bool
buffer and hands it to SDPA — 36M mask elements + full score materialization
in HBM per head).

Kernel design (v3 — triangle grid): the causal (q-superblock, kv-chunk)
pairs are enumerated on the host and streamed to the device as
scalar-prefetch arrays that drive the BlockSpec index maps — only real work
is scheduled (no masked-out programs, no skipped-chunk DMA). Each program
runs two big MXU dots with online-softmax scratch accumulators persisting
across the chunk dimension:

    s   = q_block @ K_chunk^T   [QB, C]   (contraction = head_dim)
    acc += softmax-partial @ V  [QB, D]   (contraction = chunk length)

The slab mask is an iota comparison on s (VPU; it only bites on diagonal
chunks). Scores never touch HBM. v5e sweep at the flagship shape (b=128,
h=8, t=6144, d=32, bf16): qb=1024, chunk=1024 -> 132 ms/call vs 198 ms for
a dense single-dot variant and ~790 ms for a small-tile fori-loop variant.
~76% of the d=32 MXU roofline (head_dim 32 caps the QK dot at 1/4 of peak).

Forward also emits the per-row logsumexp ([BH, 1, T] layout — lane dim = full
row, TPU block rules); backward is two more triangle-grid kernels (dq uses
the forward's pair list, dk/dv a transposed list) built from the standard
flash recomputation identities.
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
    qb = _pick_qblock(tq, tok_per_time)
    chunk = _pick_chunk(tq, tok_per_time)
    # residency per program: q/do blocks + k/v chunks + f32 score tile +
    # exp tile + accumulators + the full-row lse/delta vectors
    resident = (2 * (qb + chunk) * lanes_d * itemsize
                + qb * chunk * (4 + itemsize)
                + 3 * qb * lanes_d * 4
                + 2 * tq * 4)
    return resident < VMEM_BUDGET


NEG_INF = float(jnp.finfo(jnp.float32).min)


def _row_mask(i, block: int, t: int):
    """[P, T] bool: key slab <= query slab (query slab == program id i)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (block, t), 1)
    return (col // block) <= i


def _slab_mask(i, c, shape, *, block: int, qb: int, chunk: int):
    """[QB, C] bool slab mask from 1D iotas (2 VPU sweeps over the score tile
    instead of 6): allowed(r, j) <=> slab(col_j) <= slab(row_r) <=>
    col_j < (slab(row_r)+1)*block. Rows are [i*qb, i*qb+qb), cols
    [c*chunk, c*chunk+chunk); everything except the broadcasted compare is
    O(qb + chunk) arithmetic on thin iotas. (A scalar-cond skip of the mask on
    off-diagonal chunks was measured SLOWER — Mosaic executes both branches —
    so the mask runs unconditionally but cheap.)"""
    qb_, c_ = shape
    row = jax.lax.broadcasted_iota(jnp.int32, (qb_, 1), 0) + i * qb
    col = jax.lax.broadcasted_iota(jnp.int32, (1, c_), 1) + c * chunk
    row_end = (row // block + 1) * block     # first forbidden column, per row
    return col < row_end


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _pick_chunk(t: int, block: int) -> int:
    """kv-chunk length. Swept on v5e (b=128, h=8, t=6144, d=32, bf16) with
    the triangle grid: (qb=1024, chunk=1024) = 132 ms/call vs 198 ms for the
    dense single-dot variant; chunk 512 is slower (short-N dots), chunk 2048
    saves fewer FLOPs."""
    for cand in (1024, 2048, 3072, 512, 256, 128):
        if cand % block == 0 or block % cand == 0:
            c = max(cand, block)
            if t % c == 0:
                return c
    return t


def _pick_qblock(t: int, block: int) -> int:
    """q rows per program: several slabs per program amortize the softmax
    bookkeeping and improve MXU row pipelining (sweep: 1024 best)."""
    for cand in (1024, 512, 256, 128):
        if cand % block == 0 and t % cand == 0:
            return cand
    return block


def _triangle_pairs(t: int, block: int, qb: int, chunk: int,
                    causal: bool = True):
    """Enumerate (q-superblock, kv-chunk) pairs: for q rows [I*qb, (I+1)*qb)
    only chunks holding key slabs <= the block's max slab (all chunks when
    not causal). Returns (i_arr, c_arr, last_arr) int32."""
    import numpy as np
    is_, cs_, last_ = [], [], []
    for i in range(t // qb):
        if causal:
            max_slab = ((i + 1) * qb - 1) // block
            n_c = (max_slab * block) // chunk + 1
        else:
            n_c = t // chunk
        for c in range(n_c):
            is_.append(i)
            cs_.append(c)
            last_.append(1 if c == n_c - 1 else 0)
    return (np.asarray(is_, np.int32), np.asarray(cs_, np.int32),
            np.asarray(last_, np.int32))


def _pos_mask(pr_ref, pc_ref, *, block: int):
    """[QB, C] bool mask from gathered token positions: allowed(r, j) <=>
    slab(pos_col_j) <= slab(pos_row_r). Row positions arrive as a [QB, 1]
    tile, column positions as a [1, C] tile — one broadcasted compare."""
    pr = pr_ref[0]                             # [QB, 1] int32
    pc = pc_ref[0]                             # [1, C]  int32
    return (pc // block) <= (pr // block)


def _fwd_tri_kernel(i_ref, c_ref, last_ref, *refs,
                    block: int, qb: int, chunk: int, scale: float,
                    causal: bool = True, pos: bool = False):
    if pos:
        (q_ref, k_ref, v_ref, pr_ref, pc_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]

    @pl.when(c == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                               # [QB, D]
    kc = k_ref[0]                              # [C, D]
    vc = v_ref[0]
    s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if causal:
        s = jnp.where(_slab_mask(i, c, s.shape, block=block, qb=qb,
                                 chunk=chunk), s, NEG_INF)
    elif pos:
        s = jnp.where(_pos_mask(pr_ref, pc_ref, block=block), s, NEG_INF)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    pexp = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        pexp.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = m_new

    @pl.when(last_ref[p] == 1)
    def _finalize():
        l = l_scr[...]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(i * qb, qb)] = (m_scr[...] + jnp.log(l))[:, 0]


def _fwd(q3, k3, v3, *, block: int, scale: float, interpret: bool,
         causal: bool = True):
    """Triangle-grid flash forward: one program per causal (q-superblock,
    kv-chunk) pair — no wasted programs, no skipped-chunk DMA. Pair indices
    arrive via scalar prefetch and drive the block index maps."""
    from jax.experimental.pallas import tpu as pltpu

    bh, t, d = q3.shape
    chunk = _pick_chunk(t, block)
    qb = _pick_qblock(t, block)
    i_arr, c_arr, last_arr = _triangle_pairs(t, block, qb, chunk, causal)
    n_pairs = len(i_arr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bh, n_pairs),
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
            pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, 1, t), lambda b, p, i_r, c_r, l_r: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((qb, 1), jnp.float32),
            pltpu.VMEM((qb, 1), jnp.float32),
            pltpu.VMEM((qb, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_tri_kernel, block=block, qb=qb, chunk=chunk,
                          scale=scale, causal=causal),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * bh * n_pairs * qb * chunk * d),
            bytes_accessed=int(4 * bh * t * d * 4),
            transcendentals=int(bh * n_pairs * qb * chunk),
        ),
        interpret=interpret,
    )(jnp.asarray(i_arr), jnp.asarray(c_arr), jnp.asarray(last_arr),
      q3, k3, v3)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_tri_kernel(i_ref, c_ref, last_ref, q_ref, k_ref, v_ref, do_ref,
                       lse_ref, delta_ref, dq_ref, dq_scr,
                       *, block: int, qb: int, chunk: int, scale: float,
                       causal: bool = True):
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]

    @pl.when(c == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]                               # [QB, D]
    do = do_ref[0]
    kc = k_ref[0]                              # [C, D]
    vc = v_ref[0]
    lse = lse_ref[0, 0, pl.ds(i * qb, qb)][:, None]
    delta = delta_ref[0, 0, pl.ds(i * qb, qb)][:, None]

    s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if causal:
        s = jnp.where(_slab_mask(i, c, s.shape, block=block, qb=qb,
                                 chunk=chunk), s, NEG_INF)
    pexp = jnp.exp(s - lse)                                        # [QB, C]
    dp = jax.lax.dot_general(do, vc, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [QB, C]
    ds = (pexp * (dp - delta) * scale).astype(kc.dtype)
    dq_scr[...] = dq_scr[...] + jax.lax.dot_general(
        ds, kc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(last_ref[p] == 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _triangle_pairs_kv(t: int, block: int, kb: int, qchunk: int,
                       causal: bool = True):
    """Pairs for the dk/dv pass: for kv rows [J*kb, (J+1)*kb) only q chunks
    containing query slabs >= the kv block's min slab (all when not causal)."""
    import numpy as np
    js_, cs_, first_, last_ = [], [], [], []
    n_qc = t // qchunk
    for j in range(t // kb):
        min_slab = (j * kb) // block
        first_qc = (min_slab * block) // qchunk if causal else 0
        for c in range(first_qc, n_qc):
            js_.append(j)
            cs_.append(c)
            first_.append(1 if c == first_qc else 0)
            last_.append(1 if c == n_qc - 1 else 0)
    return (np.asarray(js_, np.int32), np.asarray(cs_, np.int32),
            np.asarray(first_, np.int32), np.asarray(last_, np.int32))


def _bwd_dkv_tri_kernel(j_ref, c_ref, first_ref, last_ref,
                        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dk_ref, dv_ref, dk_scr, dv_scr,
                        *, block: int, kb: int, qchunk: int, scale: float,
                        causal: bool = True):
    p = pl.program_id(1)
    j = j_ref[p]
    c = c_ref[p]

    @pl.when(first_ref[p] == 1)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    qc = q_ref[0]                                  # [QC, D]
    doc = do_ref[0]
    kj = k_ref[0]                                  # [KB, D]
    vj = v_ref[0]
    lse = lse_ref[0, 0, pl.ds(c * qchunk, qchunk)][:, None]
    delta = delta_ref[0, 0, pl.ds(c * qchunk, qchunk)][:, None]

    s = jax.lax.dot_general(qc, kj, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if causal:
        # rows are the q-chunk, cols the kv-block (transposed triangle)
        s = jnp.where(_slab_mask(c, j, s.shape, block=block, qb=qchunk,
                                 chunk=kb), s, NEG_INF)
    pexp = jnp.exp(s - lse)                                        # [QC, KB]
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        pexp.astype(doc.dtype), doc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                        # [KB, D]
    dp = jax.lax.dot_general(doc, vj, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [QC, KB]
    ds = (pexp * (dp - delta) * scale).astype(qc.dtype)
    dk_scr[...] = dk_scr[...] + jax.lax.dot_general(
        ds, qc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                        # [KB, D]

    @pl.when(last_ref[p] == 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(q3, k3, v3, o3, do3, lse, *, block: int, scale: float,
         interpret: bool, causal: bool = True):
    from jax.experimental.pallas import tpu as pltpu

    bh, t, d = q3.shape
    delta = jnp.sum(o3.astype(jnp.float32) * do3.astype(jnp.float32),
                    axis=-1)[:, None, :]                       # [BH, 1, T]

    chunk = _pick_chunk(t, block)
    qb = _pick_qblock(t, block)
    vec = pl.BlockSpec((1, 1, t), lambda b, p, *refs: (b, 0, 0))

    # ---- dq: same triangle as forward -----------------------------------
    i_arr, c_arr, last_arr = _triangle_pairs(t, block, qb, chunk, causal)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bh, len(i_arr)),
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
            pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
            pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
            vec, vec,
        ],
        out_specs=pl.BlockSpec((1, qb, d),
                               lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
        scratch_shapes=[pltpu.VMEM((qb, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_tri_kernel, block=block, qb=qb, chunk=chunk,
                          scale=scale, causal=causal),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q3.dtype),
        interpret=interpret,
    )(jnp.asarray(i_arr), jnp.asarray(c_arr), jnp.asarray(last_arr),
      q3, k3, v3, do3, lse, delta)

    # ---- dk/dv: transposed triangle --------------------------------------
    kb, qchunk = qb, chunk
    j_arr, qc_arr, first_arr, last2_arr = _triangle_pairs_kv(t, block, kb,
                                                             qchunk, causal)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bh, len(j_arr)),
        in_specs=[
            pl.BlockSpec((1, qchunk, d),
                         lambda b, p, j_r, c_r, f_r, l_r: (b, c_r[p], 0)),
            pl.BlockSpec((1, kb, d),
                         lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0)),
            pl.BlockSpec((1, kb, d),
                         lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0)),
            pl.BlockSpec((1, qchunk, d),
                         lambda b, p, j_r, c_r, f_r, l_r: (b, c_r[p], 0)),
            vec, vec,
        ],
        out_specs=[
            pl.BlockSpec((1, kb, d),
                         lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0)),
            pl.BlockSpec((1, kb, d),
                         lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0)),
        ],
        scratch_shapes=[pltpu.VMEM((kb, d), jnp.float32),
                        pltpu.VMEM((kb, d), jnp.float32)],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_tri_kernel, block=block, kb=kb,
                          qchunk=qchunk, scale=scale, causal=causal),
        grid_spec=dkv_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), k3.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), v3.dtype)],
        interpret=interpret,
    )(jnp.asarray(j_arr), jnp.asarray(qc_arr), jnp.asarray(first_arr),
      jnp.asarray(last2_arr), q3, k3, v3, do3, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _slab_attention(q3, k3, v3, block: int, interpret: bool, causal: bool):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, _ = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret,
                  causal=causal)
    return out


def _slab_attention_fwd(q3, k3, v3, block: int, interpret: bool, causal: bool):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, lse = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret,
                    causal=causal)
    return out, (q3, k3, v3, out, lse)


def _slab_attention_bwd(block: int, interpret: bool, causal: bool, res, do3):
    q3, k3, v3, out, lse = res
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    dq, dk, dv = _bwd(q3, k3, v3, out, do3, lse,
                      block=block, scale=scale, interpret=interpret,
                      causal=causal)
    return dq, dk, dv


_slab_attention.defvjp(_slab_attention_fwd, _slab_attention_bwd)


def slab_causal_attention(q, k, v, tok_per_time: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Flash attention under slab-causality. q/k/v: [B, T, H, D] -> [B, T, H, D]."""
    b, t, h, d = q.shape
    to3 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    out3 = _slab_attention(to3(q), to3(k), to3(v), tok_per_time, interpret,
                           True)
    return jnp.transpose(out3.reshape(b, h, t, d), (0, 2, 1, 3))


def dense_flash_attention(q, k, v, tile: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Dense (all-to-all) flash attention with the same kernels — used for
    the MAE decoder, whose 6144-token UNMASKED attention otherwise makes XLA
    materialize [B, H, T, T] scores in HBM (77 GB at batch 64)."""
    b, t, h, d = q.shape
    to3 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    out3 = _slab_attention(to3(q), to3(k), to3(v), tile, interpret, False)
    return jnp.transpose(out3.reshape(b, h, t, d), (0, 2, 1, 3))
