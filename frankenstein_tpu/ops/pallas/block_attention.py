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
         causal: bool = True, pos=None, nh: int = 1, try_pack: bool = False):
    """Triangle-grid flash forward: one program per causal (q-superblock,
    kv-chunk) pair — no wasted programs, no skipped-chunk DMA. Pair indices
    arrive via scalar prefetch and drive the block index maps.

    ``pos`` (MAE kept-token path): (pos_r [B, N, 1], pos_c [B, 1, N]) int32
    gathered SORTED token positions; the slab mask is then computed from the
    loaded position tiles instead of iotas, and every (q-block, kv-chunk)
    pair is scheduled (the data-dependent staircase can't be pruned on the
    host). ``nh`` maps the flattened batch*heads grid axis back to the
    positions' batch axis."""
    from jax.experimental.pallas import tpu as pltpu

    bh, t, d = q3.shape
    use_pos = pos is not None
    if try_pack and not use_pos:
        plan = _pack_plan(t, d, nh, block if causal else 0)
        if plan is not None and (_packed_resident_bytes(
                t, d, jnp.dtype(q3.dtype).itemsize, plan) < VMEM_BUDGET):
            return _fwd_packed(q3, k3, v3, block=block, scale=scale,
                               interpret=interpret, causal=causal, nh=nh,
                               plan=plan)
    chunk = _pick_chunk(t, block)
    qb = _pick_qblock(t, block)
    i_arr, c_arr, last_arr = _triangle_pairs(t, block, qb, chunk,
                                             causal and not use_pos)
    n_pairs = len(i_arr)

    in_specs = [
        pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
        pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
        pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
    ]
    inputs = [q3, k3, v3]
    if use_pos:
        in_specs += [
            pl.BlockSpec((1, qb, 1),
                         lambda b, p, i_r, c_r, l_r: (b // nh, i_r[p], 0)),
            pl.BlockSpec((1, 1, chunk),
                         lambda b, p, i_r, c_r, l_r: (b // nh, 0, c_r[p])),
        ]
        inputs += list(pos)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bh, n_pairs),
        in_specs=in_specs,
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
                          scale=scale, causal=causal and not use_pos,
                          pos=use_pos),
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
      *inputs)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_tri_kernel(i_ref, c_ref, last_ref, *refs,
                       block: int, qb: int, chunk: int, scale: float,
                       causal: bool = True, pos: bool = False):
    if pos:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, pr_ref, pc_ref,
         dq_ref, dq_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_scr) = refs
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
    elif pos:
        s = jnp.where(_pos_mask(pr_ref, pc_ref, block=block), s, NEG_INF)
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


def _bwd_dkv_tri_kernel(j_ref, c_ref, first_ref, last_ref, *refs,
                        block: int, kb: int, qchunk: int, scale: float,
                        causal: bool = True, pos: bool = False):
    if pos:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, pr_ref, pc_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
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
    elif pos:
        s = jnp.where(_pos_mask(pr_ref, pc_ref, block=block), s, NEG_INF)
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
         interpret: bool, causal: bool = True, pos=None, nh: int = 1):
    from jax.experimental.pallas import tpu as pltpu

    bh, t, d = q3.shape
    delta = jnp.sum(o3.astype(jnp.float32) * do3.astype(jnp.float32),
                    axis=-1)[:, None, :]                       # [BH, 1, T]

    chunk = _pick_chunk(t, block)
    qb = _pick_qblock(t, block)
    vec = pl.BlockSpec((1, 1, t), lambda b, p, *refs: (b, 0, 0))
    use_pos = pos is not None
    tri_causal = causal and not use_pos

    # ---- dq: same triangle as forward -----------------------------------
    i_arr, c_arr, last_arr = _triangle_pairs(t, block, qb, chunk, tri_causal)
    dq_in_specs = [
        pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
        pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
        pl.BlockSpec((1, chunk, d), lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0)),
        pl.BlockSpec((1, qb, d), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
        vec, vec,
    ]
    dq_inputs = [q3, k3, v3, do3, lse, delta]
    if use_pos:
        dq_in_specs += [
            pl.BlockSpec((1, qb, 1),
                         lambda b, p, i_r, c_r, l_r: (b // nh, i_r[p], 0)),
            pl.BlockSpec((1, 1, chunk),
                         lambda b, p, i_r, c_r, l_r: (b // nh, 0, c_r[p])),
        ]
        dq_inputs += list(pos)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bh, len(i_arr)),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, qb, d),
                               lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0)),
        scratch_shapes=[pltpu.VMEM((qb, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_tri_kernel, block=block, qb=qb, chunk=chunk,
                          scale=scale, causal=tri_causal, pos=use_pos),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q3.dtype),
        interpret=interpret,
    )(jnp.asarray(i_arr), jnp.asarray(c_arr), jnp.asarray(last_arr),
      *dq_inputs)

    # ---- dk/dv: transposed triangle --------------------------------------
    kb, qchunk = qb, chunk
    j_arr, qc_arr, first_arr, last2_arr = _triangle_pairs_kv(t, block, kb,
                                                             qchunk,
                                                             tri_causal)
    dkv_in_specs = [
        pl.BlockSpec((1, qchunk, d),
                     lambda b, p, j_r, c_r, f_r, l_r: (b, c_r[p], 0)),
        pl.BlockSpec((1, kb, d),
                     lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0)),
        pl.BlockSpec((1, kb, d),
                     lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0)),
        pl.BlockSpec((1, qchunk, d),
                     lambda b, p, j_r, c_r, f_r, l_r: (b, c_r[p], 0)),
        vec, vec,
    ]
    dkv_inputs = [q3, k3, v3, do3, lse, delta]
    if use_pos:
        # rows are the q-chunk (positions indexed by c), cols the kv-block (j)
        dkv_in_specs += [
            pl.BlockSpec((1, qchunk, 1),
                         lambda b, p, j_r, c_r, f_r, l_r: (b // nh, c_r[p], 0)),
            pl.BlockSpec((1, 1, kb),
                         lambda b, p, j_r, c_r, f_r, l_r: (b // nh, 0, j_r[p])),
        ]
        dkv_inputs += list(pos)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bh, len(j_arr)),
        in_specs=dkv_in_specs,
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
                          qchunk=qchunk, scale=scale, causal=tri_causal,
                          pos=use_pos),
        grid_spec=dkv_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), k3.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), v3.dtype)],
        interpret=interpret,
    )(jnp.asarray(j_arr), jnp.asarray(qc_arr), jnp.asarray(first_arr),
      jnp.asarray(last2_arr), *dkv_inputs)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# head-packed backward: P heads per program via block-diagonal staging
# ---------------------------------------------------------------------------
#
# The per-head triangle backward runs on [BH, T, D] with a D=32 minor dim —
# every q/k/v/do block tile pads its 32 lanes to 128 in VMEM (4x the DMA
# bytes), and each (head, pair) recomputes the slab mask and pair
# bookkeeping. Packing P = 128/d heads per program (the forward's layout,
# [NB, T, P*D]) reads dense tiles and shares mask/bookkeeping across the P
# heads; all four backward dots keep full MXU depth via the forward's
# block-diagonal staging (Xbd: chunk rows of head h in row segment h, lanes
# in band h, zeros elsewhere — cross-head terms vanish exactly):
#
#   dP_h = dO_h V_h^T   -> do  [QB, PD]    x Vbd  [P*C, PD]  (contract lanes)
#   dQ_h = dS_h K_h     -> ds  [QB, P*C]   x Kbd  [P*C, PD]
#   dV_h = P_h^T dO_h   -> pexpT [KB, P*QC] x dObd [P*QC, PD]
#   dK_h = dS_h^T Q_h   -> dsT [KB, P*QC]  x Qbd  [P*QC, PD]
#
# Per-head ds/pexp values are IDENTICAL to the triangle kernels' (same f32
# math, same cast points); only the dots' accumulation trees differ (zeros
# interleave the same addends), so parity is tested to tight tolerances
# rather than claimed bit-exact.


def _blockdiag(xc, npack: int, d: int):
    """[C, P*D] chunk -> [P*C, P*D] block-diagonal staging."""
    c, pd = xc.shape
    sub = jax.lax.broadcasted_iota(jnp.int32, (npack * c, pd), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (npack * c, pd), 1)
    return jnp.where((sub // c) == (lane // d), jnp.tile(xc, (npack, 1)),
                     0).astype(xc.dtype)


def _slab_mask_t(j, c, shape, *, block: int, kb: int, qchunk: int):
    """[KB, QC] TRANSPOSED slab mask: rows are kv positions [j*kb, ...),
    cols q positions [c*qchunk, ...); allowed(k, q) <=> slab(k) <= slab(q)."""
    kb_, qc_ = shape
    row = jax.lax.broadcasted_iota(jnp.int32, (kb_, 1), 0) + j * kb
    col = jax.lax.broadcasted_iota(jnp.int32, (1, qc_), 1) + c * qchunk
    return (row // block) <= (col // block)


def _bwd_dq_packed_kernel(i_ref, c_ref, last_ref, q_ref, k_ref, v_ref,
                          do_ref, lse_ref, delta_ref, dq_ref, dq_scr, ds_scr,
                          *, block: int, qb: int, chunk: int, scale: float,
                          d: int, npack: int, causal: bool):
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]

    @pl.when(c == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]                                   # [QB, PD]
    do = do_ref[0]
    kbd = _blockdiag(k_ref[0], npack, d)           # [P*C, PD]
    vbd = _blockdiag(v_ref[0], npack, d)
    s = jax.lax.dot_general(q, kbd, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    dp = jax.lax.dot_general(do, vbd, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [QB, P*C]
    if causal:
        allowed = _slab_mask(i, c, (qb, chunk), block=block, qb=qb,
                             chunk=chunk)
    for h in range(npack):
        sh = s[:, h * chunk:(h + 1) * chunk]
        if causal:
            sh = jnp.where(allowed, sh, NEG_INF)
        lse_h = lse_ref[0, h, pl.ds(i * qb, qb)][:, None]
        delta_h = delta_ref[0, h, pl.ds(i * qb, qb)][:, None]
        pexp_h = jnp.exp(sh - lse_h)
        ds_scr[:, h * chunk:(h + 1) * chunk] = (
            pexp_h * (dp[:, h * chunk:(h + 1) * chunk] - delta_h)
            * scale).astype(ds_scr.dtype)
    dq_scr[...] = dq_scr[...] + jax.lax.dot_general(
        ds_scr[...], kbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(last_ref[p] == 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_packed_kernel(j_ref, c_ref, first_ref, last_ref, q_ref, k_ref,
                           v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                           dk_scr, dv_scr, pt_scr, dst_scr,
                           *, block: int, kb: int, qchunk: int, scale: float,
                           d: int, npack: int, causal: bool):
    p = pl.program_id(1)
    j = j_ref[p]
    c = c_ref[p]

    @pl.when(first_ref[p] == 1)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    kj = k_ref[0]                                  # [KB, PD]
    vj = v_ref[0]
    qbd = _blockdiag(q_ref[0], npack, d)           # [P*QC, PD]
    dobd = _blockdiag(do_ref[0], npack, d)
    st = jax.lax.dot_general(kj, qbd, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dpt = jax.lax.dot_general(vj, dobd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if causal:
        allowed = _slab_mask_t(j, c, (kb, qchunk), block=block, kb=kb,
                               qchunk=qchunk)
    for h in range(npack):
        sth = st[:, h * qchunk:(h + 1) * qchunk]   # [KB, QC] = s_h^T
        if causal:
            sth = jnp.where(allowed, sth, NEG_INF)
        lse_h = lse_ref[0, h, pl.ds(c * qchunk, qchunk)][None, :]
        delta_h = delta_ref[0, h, pl.ds(c * qchunk, qchunk)][None, :]
        pexp_h = jnp.exp(sth - lse_h)
        pt_scr[:, h * qchunk:(h + 1) * qchunk] = pexp_h.astype(pt_scr.dtype)
        dst_scr[:, h * qchunk:(h + 1) * qchunk] = (
            pexp_h * (dpt[:, h * qchunk:(h + 1) * qchunk] - delta_h)
            * scale).astype(dst_scr.dtype)
    dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
        pt_scr[...], dobd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_scr[...] = dk_scr[...] + jax.lax.dot_general(
        dst_scr[...], qbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(last_ref[p] == 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_packed_plan(t: int, block: int):
    """(qb, chunk) for the packed backward, or None (fall back per-head)."""
    qb, chunk = 512, 1024
    if t % chunk != 0 or t % qb != 0:
        return None
    if block > 0 and (qb % block != 0 or chunk % block != 0):
        return None
    return qb, chunk


def _bwd_packed_supported(t: int, d: int, npack: int, itemsize: int,
                          block: int, interpret: bool = False) -> bool:
    plan = _bwd_packed_plan(t, block)
    if plan is None or npack <= 1:
        return False
    if interpret:          # no VMEM constraint off-hardware
        return True
    qb, chunk = plan
    pd = npack * d
    resident = (2 * qb * npack * chunk * 4        # s/dp (or st/dpt) f32
                + 2 * qb * npack * chunk * itemsize   # ds + pexp scratches
                + 2 * npack * chunk * pd * itemsize   # staged bd operands
                + 2 * (qb + chunk) * pd * itemsize    # q/do + k/v blocks
                + 3 * qb * pd * 4                     # dq | dk+dv acc
                + 4 * npack * t * 4)                  # lse + delta rows
    return resident < ROPE_FUSED_VMEM


def _bwd_packed(q4, k4, v4, o4, do4, lse4, *, block: int, scale: float,
                interpret: bool, causal: bool, npack: int, d: int):
    """Packed backward on [NB, T, P*D] tensors; lse4: [NB, P, T].
    Returns (dq4, dk4, dv4) in the packed layout."""
    from jax.experimental.pallas import tpu as pltpu

    nb, t, pd = q4.shape
    qb, chunk = _bwd_packed_plan(t, block)
    prod = o4.astype(jnp.float32) * do4.astype(jnp.float32)
    delta4 = jnp.transpose(prod.reshape(nb, t, npack, d).sum(-1),
                           (0, 2, 1))                         # [NB, P, T]

    qspec = pl.BlockSpec((1, qb, pd), lambda b, p, i_r, c_r, l_r: (b, i_r[p], 0))
    cspec = pl.BlockSpec((1, chunk, pd),
                         lambda b, p, i_r, c_r, l_r: (b, c_r[p], 0))
    vec = pl.BlockSpec((1, npack, t), lambda b, p, *r: (b, 0, 0))

    # ---- dq: forward triangle ------------------------------------------
    i_arr, c_arr, last_arr = _triangle_pairs(t, block, qb, chunk, causal)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, len(i_arr)),
        in_specs=[qspec, cspec, cspec, qspec, vec, vec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((qb, pd), jnp.float32),
                        pltpu.VMEM((qb, npack * chunk), q4.dtype)],
    )
    dq4 = pl.pallas_call(
        functools.partial(_bwd_dq_packed_kernel, block=block, qb=qb,
                          chunk=chunk, scale=scale, d=d, npack=npack,
                          causal=causal),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((nb, t, pd), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(3 * 2 * nb * len(i_arr) * qb * npack * chunk * d),
            bytes_accessed=int(5 * nb * t * pd * 4),
            transcendentals=int(nb * len(i_arr) * qb * npack * chunk),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=ROPE_FUSED_VMEM),
        interpret=interpret,
    )(jnp.asarray(i_arr), jnp.asarray(c_arr), jnp.asarray(last_arr),
      q4, k4, v4, do4, lse4, delta4)

    # ---- dk/dv: transposed triangle --------------------------------------
    kb, qchunk = qb, chunk
    j_arr, qc_arr, first_arr, last2_arr = _triangle_pairs_kv(
        t, block, kb, qchunk, causal)
    jqspec = pl.BlockSpec((1, qchunk, pd),
                          lambda b, p, j_r, c_r, f_r, l_r: (b, c_r[p], 0))
    jkspec = pl.BlockSpec((1, kb, pd),
                          lambda b, p, j_r, c_r, f_r, l_r: (b, j_r[p], 0))
    vec2 = pl.BlockSpec((1, npack, t), lambda b, p, *r: (b, 0, 0))
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb, len(j_arr)),
        in_specs=[jqspec, jkspec, jkspec, jqspec, vec2, vec2],
        out_specs=[jkspec, jkspec],
        scratch_shapes=[pltpu.VMEM((kb, pd), jnp.float32),
                        pltpu.VMEM((kb, pd), jnp.float32),
                        pltpu.VMEM((kb, npack * qchunk), q4.dtype),
                        pltpu.VMEM((kb, npack * qchunk), q4.dtype)],
    )
    dk4, dv4 = pl.pallas_call(
        functools.partial(_bwd_dkv_packed_kernel, block=block, kb=kb,
                          qchunk=qchunk, scale=scale, d=d, npack=npack,
                          causal=causal),
        grid_spec=dkv_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, t, pd), k4.dtype),
                   jax.ShapeDtypeStruct((nb, t, pd), v4.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * 2 * nb * len(j_arr) * kb * npack * qchunk * d),
            bytes_accessed=int(6 * nb * t * pd * 4),
            transcendentals=int(nb * len(j_arr) * kb * npack * qchunk),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=ROPE_FUSED_VMEM),
        interpret=interpret,
    )(jnp.asarray(j_arr), jnp.asarray(qc_arr), jnp.asarray(first_arr),
      jnp.asarray(last2_arr), q4, k4, v4, do4, lse4, delta4)
    return dq4, dk4, dv4


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _slab_attention(q3, k3, v3, block: int, interpret: bool, causal: bool,
                    nh: int = 1):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, _ = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret,
                  causal=causal, nh=nh, try_pack=True)
    return out


def _slab_attention_fwd(q3, k3, v3, block: int, interpret: bool, causal: bool,
                        nh: int = 1):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, lse = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret,
                    causal=causal, nh=nh, try_pack=True)
    return out, (q3, k3, v3, out, lse)


def _slab_attention_bwd(block: int, interpret: bool, causal: bool, nh: int,
                        res, do3):
    q3, k3, v3, out, lse = res
    bh, t, d = q3.shape
    scale = 1.0 / (d ** 0.5)
    npack = (PACK_LANES // d
             if d and PACK_LANES % d == 0 and d != PACK_LANES else 0)
    if (npack > 1 and nh % npack == 0
            and _bwd_packed_supported(t, d, npack,
                                      jnp.dtype(q3.dtype).itemsize, block,
                                      interpret)):
        # pack [BH, T, D] heads into dense 128-lane groups for the packed
        # backward (the 32-lane minor dim otherwise pays 4x padded DMA per
        # pair; one layout transpose per tensor amortizes over all pairs)
        b = bh // nh
        ng = nh // npack
        pd = npack * d
        pk3 = lambda x3: jnp.transpose(
            x3.reshape(b, ng, npack, t, d),
            (0, 1, 3, 2, 4)).reshape(b * ng, t, pd)
        lse4 = lse.reshape(b * ng, npack, t)
        dq4, dk4, dv4 = _bwd_packed(
            pk3(q3), pk3(k3), pk3(v3), pk3(out), pk3(do3), lse4,
            block=block, scale=scale, interpret=interpret, causal=causal,
            npack=npack, d=d)
        unpk3 = lambda x4: jnp.transpose(
            x4.reshape(b, ng, t, npack, d),
            (0, 1, 3, 2, 4)).reshape(bh, t, d)
        return unpk3(dq4), unpk3(dk4), unpk3(dv4)
    dq, dk, dv = _bwd(q3, k3, v3, out, do3, lse,
                      block=block, scale=scale, interpret=interpret,
                      causal=causal)
    return dq, dk, dv


_slab_attention.defvjp(_slab_attention_fwd, _slab_attention_bwd)


# ---------------------------------------------------------------------------
# head-packed forward (v4): 4 heads per program via block-diagonal K staging
# ---------------------------------------------------------------------------
#
# head_dim=32 caps both dots at 1/4 of the MXU (contraction resp. output
# lanes pad 32 -> 128). Packing P=128/d heads into one program restores full
# depth: Q rows carry P heads side by side in lanes (the natural [.., P*D]
# layout), K is staged block-diagonally in VMEM ([P*C, 128], head h's keys in
# lane band h) so ONE dot yields all P heads' scores segment-by-segment
# ([QB, P*C]); the AV dot runs per head against a band-masked V (full K
# depth). Measured on v5e at the flagship shape: 89 ms vs 120 ms for the
# per-head d=32 kernel, output bit-identical. Sweep: (qb=512, chunk=1024)
# best; qb=1024 variants exceed VMEM (the f32 score scratch doubles), P=8
# packs are slower (256-lane tiles).

PACK_LANES = 128


def _pack_plan(t: int, d: int, nh: int, block: int):
    """Return (P, qb, chunk) for the packed forward, or None if the shape
    can't ride it (falls back to the per-head triangle kernel)."""
    if d <= 0 or PACK_LANES % d != 0 or d == PACK_LANES:
        return None
    p = PACK_LANES // d
    if nh % p != 0:
        return None
    qb, chunk = 512, 1024
    if t % chunk != 0:
        return None
    if block > 0 and (qb % block != 0 or chunk % block != 0):
        return None
    return p, qb, chunk


def _fwd_packed_kernel(i_ref, c_ref, first_ref, last_ref, q_ref, k_ref, v_ref,
                       o_ref, lse_ref, *scr,
                       block: int, qb: int, chunk: int, scale: float,
                       d: int, npack: int, causal: bool):
    s_scr, acc_scr = scr[0], scr[1]
    m_scrs, l_scrs = scr[2:2 + npack], scr[2 + npack:2 + 2 * npack]
    pd = npack * d
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]

    @pl.when(first_ref[p] == 1)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        for h in range(npack):
            m_scrs[h][...] = jnp.full_like(m_scrs[h], -jnp.inf)
            l_scrs[h][...] = jnp.zeros_like(l_scrs[h])

    q = q_ref[0]                                   # [QB, P*D]
    kc = k_ref[0]                                  # [C,  P*D]
    vc = v_ref[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (npack * chunk, pd), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (npack * chunk, pd), 1)
    kbd = jnp.where((sub // chunk) == (lane2 // d),
                    jnp.tile(kc, (npack, 1)), 0).astype(kc.dtype)
    s_scr[...] = jax.lax.dot_general(
        q, kbd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [QB, P*C]

    if causal:
        allowed = _slab_mask(i, c, (qb, chunk), block=block, qb=qb,
                             chunk=chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pd), 1) // d
    for h in range(npack):
        sh = s_scr[:, h * chunk:(h + 1) * chunk]
        if causal:
            sh = jnp.where(allowed, sh, NEG_INF)
        m_prev = m_scrs[h][...]
        m_new = jnp.maximum(m_prev, jnp.max(sh, axis=-1, keepdims=True))
        pexp_h = jnp.exp(sh - m_new)
        alpha_h = jnp.exp(m_prev - m_new)
        l_scrs[h][...] = (l_scrs[h][...] * alpha_h
                          + jnp.sum(pexp_h, axis=-1, keepdims=True))
        m_scrs[h][...] = m_new
        vbd_h = jnp.where(lane == h, vc, 0).astype(vc.dtype)   # [C, P*D]
        blend = jnp.where(lane == h, alpha_h, 1.0)             # [QB, P*D]
        acc_scr[...] = acc_scr[...] * blend + jax.lax.dot_general(
            pexp_h.astype(vc.dtype), vbd_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(last_ref[p] == 1)
    def _finalize():
        l_band = jnp.zeros((qb, pd), jnp.float32)
        for h in range(npack):
            l_band = l_band + jnp.where(lane == h, l_scrs[h][...], 0.0)
        o_ref[0] = (acc_scr[...] / l_band).astype(o_ref.dtype)
        for h in range(npack):
            lse_ref[0, h, pl.ds(i * qb, qb)] = (
                m_scrs[h][...] + jnp.log(l_scrs[h][...]))[:, 0]


# Two-call split schedule for the causal packed forward: slab-causality is
# block-aligned, so a (full_qb, full_chunk) call over the fully-allowed
# chunks plus a fine-tiled (diag_qb, diag_chunk) call over each slab's
# boundary region computes ZERO masked cells; the two partial softmaxes
# merge by lse (flash-decoding style). None -> single-call schedule.
# Measured at the flagship shape on v5e: best split (512,1024,256,512) ties
# the single call (93.5 vs 93.3 ms/layer) — the ~11% dot-work saving is
# exactly eaten by the second call's launch/DMA and the merge pass — and
# fine 256-chunk diag tiles are far worse (141 ms, program overhead). The
# machinery stays (exercised by interpret tests) for shapes where the
# diagonal fraction is larger; flagship runs the single call.
PACKED_SPLIT = None


def _n_full(i: int, fqb: int, fchunk: int, block: int) -> int:
    """Fully-allowed fchunk count for q-rows [i*fqb, (i+1)*fqb): the most
    restrictive row bounds them."""
    return (((i * fqb) // block + 1) * block) // fchunk


def _packed_pairs_full(t, block, fqb, fchunk):
    is_, cs_, first_, last_ = [], [], [], []
    for i in range(t // fqb):
        n_c = _n_full(i, fqb, fchunk, block)
        for c in range(n_c):
            is_.append(i)
            cs_.append(c)
            first_.append(1 if c == 0 else 0)
            last_.append(1 if c == n_c - 1 else 0)
    import numpy as np
    return tuple(np.asarray(a, np.int32) for a in (is_, cs_, first_, last_))


def _packed_pairs_diag(t, block, fqb, fchunk, dqb, dchunk):
    """Pairs covering [n_full*fchunk, row_boundary) per dqb-block (dqb must
    divide block so the boundary is uniform within a q-block)."""
    import numpy as np
    js_, cs_, first_, last_ = [], [], [], []
    for j in range(t // dqb):
        covered = _n_full((j * dqb) // fqb, fqb, fchunk, block) * fchunk
        boundary = ((j * dqb) // block + 1) * block
        c_lo, c_hi = covered // dchunk, -(-boundary // dchunk)
        for c in range(c_lo, c_hi):
            js_.append(j)
            cs_.append(c)
            first_.append(1 if c == c_lo else 0)
            last_.append(1 if c == c_hi - 1 else 0)
    return tuple(np.asarray(a, np.int32) for a in (js_, cs_, first_, last_))


def _fwd_packed_call(q4, k4, v4, pairs, *, block: int, qb: int, chunk: int,
                     scale: float, d: int, npack: int, mask: bool,
                     interpret: bool):
    """One packed pallas_call over an explicit pair list. q4/k4/v4:
    [NB, T, P*D] packed; returns (out4 [NB, T, P*D], lse4 [NB, P, T])."""
    from jax.experimental.pallas import tpu as pltpu

    nb, t, pd = q4.shape
    i_arr, c_arr, first_arr, last_arr = pairs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb, len(i_arr)),
        in_specs=[
            pl.BlockSpec((1, qb, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, chunk, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, c_r[p], 0)),
            pl.BlockSpec((1, chunk, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, c_r[p], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, npack, t),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, 0, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((qb, npack * chunk), jnp.float32),
             pltpu.VMEM((qb, pd), jnp.float32)]
            + [pltpu.VMEM((qb, 1), jnp.float32) for _ in range(2 * npack)]),
    )
    return pl.pallas_call(
        functools.partial(_fwd_packed_kernel, block=block, qb=qb, chunk=chunk,
                          scale=scale, d=d, npack=npack, causal=mask),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, t, pd), q4.dtype),
            jax.ShapeDtypeStruct((nb, npack, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * nb * len(i_arr) * qb * npack * chunk * d),
            bytes_accessed=int(4 * nb * t * pd * 4),
            transcendentals=int(nb * len(i_arr) * qb * npack * chunk),
        ),
        interpret=interpret,
    )(jnp.asarray(i_arr), jnp.asarray(c_arr), jnp.asarray(first_arr),
      jnp.asarray(last_arr), q4, k4, v4)


def _packed_call_single(q4, k4, v4, *, block: int, scale: float,
                        interpret: bool, causal: bool, npack: int, qb: int,
                        chunk: int):
    """Single-call packed forward on already-packed [NB, T, P*D] inputs."""
    t = q4.shape[1]
    if causal:
        pr = _triangle_pairs(t, block, qb, chunk, True)
        pairs = (pr[0], pr[1], (pr[1] == 0).astype(pr[1].dtype), pr[2])
        return _fwd_packed_call(q4, k4, v4, pairs, block=block, qb=qb,
                                chunk=chunk, scale=scale, d=q4.shape[-1] // npack,
                                npack=npack, mask=True, interpret=interpret)
    import numpy as np
    n_c = t // chunk
    i_arr = np.repeat(np.arange(t // qb, dtype=np.int32), n_c)
    c_arr = np.tile(np.arange(n_c, dtype=np.int32), t // qb)
    pairs = (i_arr, c_arr, (c_arr == 0).astype(np.int32),
             (c_arr == n_c - 1).astype(np.int32))
    return _fwd_packed_call(q4, k4, v4, pairs, block=chunk, qb=qb,
                            chunk=chunk, scale=scale,
                            d=q4.shape[-1] // npack, npack=npack,
                            mask=False, interpret=interpret)


def _fwd_packed(q3, k3, v3, *, block: int, scale: float, interpret: bool,
                causal: bool, nh: int, plan):
    """Packed forward on [BH, T, D] inputs; returns the same (out, lse)
    layout as ``_fwd``. Repacks to [BH/P, T, P*D] (consecutive bh rows are
    the same batch element's heads, so grouping by P respects nh % P == 0).

    Causal runs the two-call split schedule (PACKED_SPLIT) when the geometry
    divides cleanly — no masked cells are ever computed — falling back to a
    single masked call otherwise. Non-causal (dense) is one unmasked call."""
    npack, qb, chunk = plan
    bh, t, d = q3.shape
    nb = bh // npack
    pd = npack * d

    def pack(x):
        x = x.reshape(nb, npack, t, d)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(nb, t, pd)

    def unpack(out4, lse4):
        out = jnp.transpose(out4.reshape(nb, t, npack, d),
                            (0, 2, 1, 3)).reshape(bh, t, d)
        return out, lse4.reshape(bh, t)[:, None, :]

    q4, k4, v4 = pack(q3), pack(k3), pack(v3)
    call = functools.partial(_fwd_packed_call, q4, k4, v4, scale=scale, d=d,
                             npack=npack, interpret=interpret)

    split = PACKED_SPLIT
    if causal and split is not None:
        fqb, fchunk, dqb, dchunk = split
        ok = (t % fqb == 0 and t % fchunk == 0 and t % dqb == 0
              and block % dqb == 0 and block % dchunk == 0
              and fchunk % block == 0)
        if ok:
            full = _packed_pairs_full(t, block, fqb, fchunk)
            diag = _packed_pairs_diag(t, block, fqb, fchunk, dqb, dchunk)
            of, lf = call(full, block=block, qb=fqb, chunk=fchunk, mask=False)
            od, ld = call(diag, block=block, qb=dqb, chunk=dchunk, mask=False)
            of, lf = unpack(of, lf)
            od, ld = unpack(od, ld)
            # first q-row with >= 1 full chunk; earlier rows are diag-only
            i0 = next(i for i in range(t // fqb + 1)
                      if i == t // fqb or _n_full(i, fqb, fchunk, block) > 0)
            r0 = i0 * fqb
            valid = (jnp.arange(t) >= r0)[None, None, :]
            lf = jnp.where(valid, lf, -jnp.inf)
            m = jnp.maximum(lf, ld)
            wf = jnp.where(valid, jnp.exp(lf - m), 0.0)
            wd = jnp.exp(ld - m)
            of = jnp.where(jnp.transpose(valid, (0, 2, 1)), of, 0.0)
            out = (of * jnp.transpose(wf, (0, 2, 1))
                   + od * jnp.transpose(wd, (0, 2, 1))) / (
                jnp.transpose(wf + wd, (0, 2, 1)))
            return out.astype(q3.dtype), m + jnp.log(wf + wd)

    return unpack(*_packed_call_single(q4, k4, v4, block=block, scale=scale,
                                       interpret=interpret, causal=causal,
                                       npack=npack, qb=qb, chunk=chunk))


def _packed_resident_bytes(t, d, itemsize, plan):
    npack, qb, chunk = plan
    pd = npack * d
    return (2 * (qb + 2 * chunk) * pd * itemsize      # q + k/v chunks (db)
            + qb * npack * chunk * 4                  # f32 score scratch
            + npack * chunk * pd * itemsize * 2       # kbd/vbd staging
            + qb * pd * 4                             # acc
            + npack * t * 4)                          # lse row


# ---------------------------------------------------------------------------
# folded entry: [B, T, E] in/out, heads never unfolded outside the kernel
# ---------------------------------------------------------------------------
#
# The [B, T, H, D] convention costs real memory on TPU: XLA tiles the
# (H, D) = (8, 32) minor dims to (8, 128) — 4x padded — so every reshape,
# rope pass, and the to3/pack transposes around the kernel move 4x the
# bytes. The folded entry packs [B, T, E] -> [B*(H/P), T, P*D] with ONE
# clean-layout transpose per tensor and unpacks the output the same way.

def _pack_groups(x, ng: int, pd: int):
    b, t, _ = x.shape
    return jnp.transpose(x.reshape(b, t, ng, pd), (0, 2, 1, 3)
                         ).reshape(b * ng, t, pd)


def _unpack_groups(x4, b: int, ng: int):
    nb, t, pd = x4.shape
    return jnp.transpose(x4.reshape(b, ng, t, pd), (0, 2, 1, 3)
                         ).reshape(b, t, ng * pd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _slab_attention_packed(q4, k4, v4, block: int, d: int, npack: int,
                           interpret: bool):
    scale = 1.0 / (d ** 0.5)
    plan = (npack, 512, 1024)
    out4, _ = _packed_call_single(q4, k4, v4, block=block, scale=scale,
                                  interpret=interpret, causal=True,
                                  npack=npack, qb=plan[1], chunk=plan[2])
    return out4


def _slab_attention_packed_fwd(q4, k4, v4, block, d, npack, interpret):
    scale = 1.0 / (d ** 0.5)
    out4, lse4 = _packed_call_single(q4, k4, v4, block=block, scale=scale,
                                     interpret=interpret, causal=True,
                                     npack=npack, qb=512, chunk=1024)
    return out4, (q4, k4, v4, out4, lse4)


def _slab_attention_packed_bwd(block, d, npack, interpret, res, do4):
    """Backward: head-packed kernels on the packed [NB, T, P*D] residuals
    when the shape qualifies (dense tiles, shared masks — see _bwd_packed);
    else unpack to [BH, T, D] for the per-head triangle kernels (head order
    (group, pack) matches the fwd pack)."""
    q4, k4, v4, out4, lse4 = res
    nb, t, pd = q4.shape
    if _bwd_packed_supported(t, d, npack, jnp.dtype(q4.dtype).itemsize,
                             block, interpret):
        return _bwd_packed(q4, k4, v4, out4, do4, lse4, block=block,
                           scale=1.0 / (d ** 0.5), interpret=interpret,
                           causal=True, npack=npack, d=d)
    to3 = lambda x: jnp.transpose(x.reshape(nb, t, npack, d), (0, 2, 1, 3)
                                  ).reshape(nb * npack, t, d)
    lse = lse4.reshape(nb * npack, t)[:, None, :]
    scale = 1.0 / (d ** 0.5)
    dq, dk, dv = _bwd(to3(q4), to3(k4), to3(v4), to3(out4), to3(do4), lse,
                      block=block, scale=scale, interpret=interpret,
                      causal=True)
    to4 = lambda x: jnp.transpose(x.reshape(nb, npack, t, d), (0, 2, 1, 3)
                                  ).reshape(nb, t, pd)
    return to4(dq), to4(dk), to4(dv)


_slab_attention_packed.defvjp(_slab_attention_packed_fwd,
                              _slab_attention_packed_bwd)


def folded_supported(b: int, t: int, e: int, n_heads: int, tok_per_time: int,
                     itemsize: int = 2, interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    if tok_per_time <= 0 or e % n_heads != 0:
        return False
    d = e // n_heads
    plan = _pack_plan(t, d, n_heads, tok_per_time)
    if plan is None:
        return False
    return _packed_resident_bytes(t, d, itemsize, plan) < VMEM_BUDGET


def slab_causal_attention_folded(q, k, v, n_heads: int, tok_per_time: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """Flash slab-causal attention on FOLDED [B, T, E] tensors -> [B, T, E].

    Same math as ``slab_causal_attention`` on the unfolded views (callers
    gate on ``folded_supported``)."""
    b, t, e = q.shape
    d = e // n_heads
    npack = PACK_LANES // d
    ng = n_heads // npack
    pd = npack * d
    pk = lambda x: _pack_groups(x, ng, pd)
    out4 = _slab_attention_packed(pk(q), pk(k), pk(v), tok_per_time, d,
                                  npack, interpret)
    return _unpack_groups(out4, b, ng)


# ---------------------------------------------------------------------------
# gathered-subset (MAE kept-token) variant: mask from SORTED token positions
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gathered_attention(q3, k3, v3, pos_r, pos_c, block: int, nh: int,
                        interpret: bool):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, _ = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret,
                  causal=False, pos=(pos_r, pos_c), nh=nh)
    return out


def _gathered_attention_fwd(q3, k3, v3, pos_r, pos_c, block, nh, interpret):
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    out, lse = _fwd(q3, k3, v3, block=block, scale=scale, interpret=interpret,
                    causal=False, pos=(pos_r, pos_c), nh=nh)
    return out, (q3, k3, v3, pos_r, pos_c, out, lse)


def _gathered_attention_bwd(block, nh, interpret, res, do3):
    q3, k3, v3, pos_r, pos_c, out, lse = res
    scale = 1.0 / (q3.shape[-1] ** 0.5)
    dq, dk, dv = _bwd(q3, k3, v3, out, do3, lse, block=block, scale=scale,
                      interpret=interpret, causal=False, pos=(pos_r, pos_c),
                      nh=nh)
    return dq, dk, dv, None, None


_gathered_attention.defvjp(_gathered_attention_fwd, _gathered_attention_bwd)


def gathered_supported(q: jnp.ndarray, tok_per_time: int,
                       interpret: bool = False) -> bool:
    """Gate for the gathered-positions kernel (caller falls back to the XLA
    path with a dense [B, N, N] mask when False)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if tok_per_time <= 0:
        return False
    b, n, h, d = q.shape
    if d > 256 or n % 128 != 0:
        return False
    qb = _pick_qblock(n, 128)
    chunk = _pick_chunk(n, 128)
    if n % qb != 0 or n % chunk != 0:
        return False
    itemsize = jnp.dtype(q.dtype).itemsize
    lanes_d = max(d, 128)
    resident = (2 * (qb + chunk) * lanes_d * itemsize
                + qb * chunk * (4 + itemsize)
                + 3 * qb * lanes_d * 4
                + 2 * n * 4)
    return resident < VMEM_BUDGET


def gathered_slab_attention(q, k, v, positions, tok_per_time: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Flash attention over a GATHERED token subset under slab-causality
    computed from original positions: allowed(i, j) <=> slab(positions[j]) <=
    slab(positions[i]). This is the MAE kept-token path — the reference
    gathers a materialized T^2 mask submatrix
    (reference:models/brainformer.py:392-413); the XLA fallback materializes
    a [B, N, N] boolean mask; here the mask is two position tiles compared
    inside the kernel and scores never reach HBM.

    q/k/v: [B, N, H, D]; positions: [B, N] int32, SORTED ascending per row
    (MAE keeps ``jnp.sort``-ed indices) — sortedness guarantees every query
    row finds an allowed key in the first kv-chunk, keeping the online
    softmax NaN-free.
    """
    b, n, h, d = q.shape
    to3 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d)
    pos = positions.astype(jnp.int32)
    # slab ids, not raw positions, so the in-kernel compare is a single op
    slab = pos // tok_per_time
    out3 = _gathered_attention(to3(q), to3(k), to3(v),
                               slab[:, :, None], slab[:, None, :],
                               1, h, interpret)
    return jnp.transpose(out3.reshape(b, h, n, d), (0, 2, 1, 3))


def slab_causal_attention(q, k, v, tok_per_time: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Flash attention under slab-causality. q/k/v: [B, T, H, D] -> [B, T, H, D]."""
    b, t, h, d = q.shape
    to3 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    out3 = _slab_attention(to3(q), to3(k), to3(v), tok_per_time, interpret,
                           True, h)
    return jnp.transpose(out3.reshape(b, h, t, d), (0, 2, 1, 3))


def dense_flash_attention(q, k, v, tile: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Dense (all-to-all) flash attention with the same kernels — used for
    the MAE decoder, whose 6144-token UNMASKED attention otherwise makes XLA
    materialize [B, H, T, T] scores in HBM (77 GB at batch 64)."""
    b, t, h, d = q.shape
    to3 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    out3 = _slab_attention(to3(q), to3(k), to3(v), tile, interpret, False, h)
    return jnp.transpose(out3.reshape(b, h, t, d), (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# rope-fused packed forward: [B, T, E] in/out, RoPE applied IN KERNEL
# ---------------------------------------------------------------------------
#
# At the flagship encoder shape the XLA rope pass costs ~11-16 ms/layer: the
# [B, T, H, D] convention tiles its (8, 32) minor dims to (8, 128) — 4x
# padded HBM traffic — and the pack transposes around the packed kernel move
# 400 MB each way. This entry instead consumes the UNROTATED q/k/v
# projections in their native [B, T, E] layout (head h = columns
# [h*D, (h+1)*D), matching the reference's view,
# reference:models/brainformer.py:146-152): grid axis 0 enumerates
# (batch, head-group) pairs and the BlockSpec index maps slice 128-lane head
# groups straight out of the activation — zero layout movement. The sin/cos
# tables ([T, P*D] f32, ~3 MB each) ride whole in VMEM (constant index map
# -> fetched once) and rotation happens on resident blocks: the q block is
# rotated ONCE per row at its first pair (c == 0, cached in scratch), k
# chunks per pair (VPU work, overlapped with the MXU dots).
#
# Rotation math matches ops/rope.py:apply_rope_folded (adjacent-lane pairs,
# the reference's view_as_complex convention,
# reference:models/brainformer.py:70-91); the pair swap is two lane rotates
# + a parity select. f32 tables + f32 rotation keep the result BIT-IDENTICAL
# to apply_rope + slab_causal_attention (measured on v5e; bf16 rotates are
# rejected by Mosaic's tpu.dynamic_rotate anyway).
#
# Measured at the flagship shape on v5e: 101.2 ms/layer vs 112.3 for the
# rope + transpose + packed-kernel chain (~44 ms off the 4-layer encode).

ROPE_FUSED_VMEM = 40 * 1024 * 1024


def _rot_rows(x, cos_ref, sin_ref, row0, rows):
    """Rotate [R, P*D] lanes with table rows [row0, row0+rows) — f32 math,
    result cast back to x.dtype (same rounding point as the XLA chain)."""
    from jax.experimental.pallas import tpu as pltpu
    xf = x.astype(jnp.float32)
    cos = cos_ref[pl.ds(row0, rows), :]
    sin = sin_ref[pl.ds(row0, rows), :]
    even = (jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1) % 2) == 0
    lanes = xf.shape[-1]
    xs = jnp.where(even, pltpu.roll(xf, lanes - 1, 1), pltpu.roll(xf, 1, 1))
    sign = jnp.where(even, -1.0, 1.0)
    return (xf * cos + xs * (sign * sin)).astype(x.dtype)


def _fwd_packed_rope_kernel(i_ref, c_ref, first_ref, last_ref, kfirst_ref,
                            q_ref, k_ref, v_ref, cos_ref, sin_ref,
                            o_ref, lse_ref, *scr,
                            block: int, qb: int, chunk: int, scale: float,
                            d: int, npack: int, qk_int8: bool = False):
    """_fwd_packed_kernel with in-kernel rotation (causal only).

    K chunks are rotated (+ quantized + block-diagonal staged) ONCE, at
    their FIRST (q-block, chunk) pair (host-computed ``kfirst`` flag), into
    a whole-sequence VMEM scratch ([T*P, P*D], ~6 MB bf16 at the flagship
    shape); the ~T/QB later pairs that revisit the chunk read the staged
    tile back. The per-pair VPU chain this removes (rotate f32 +
    tile/select, and for int8 the f32 convert + per-head max-abs reduces +
    round) ran in series with the MXU dots every pair. Values are
    IDENTICAL: rotation depends only on (chunk, table) and the int8 K
    scale only on (chunk, head).

    qk_int8: quantize rotated Q per (row, head) and rotated K per
    (chunk, head) to int8 symmetric max-abs scales, run the packed QK
    dot on the MXU's 2x int8 rate, and dequantize exactly during the
    int32 -> f32 convert (the K scalar folds into ``scale``; the Q scale is
    a [QB, 1] column broadcast — ~1 extra VPU op/score vs the bf16 path).
    V and the AV dot stay bf16."""
    s_scr, acc_scr, qrot_scr, kbd_scr = scr[0], scr[1], scr[2], scr[3]
    m_scrs, l_scrs = scr[4:4 + npack], scr[4 + npack:4 + 2 * npack]
    qs_scrs = scr[4 + 2 * npack:4 + 3 * npack] if qk_int8 else ()
    ks_scr = scr[4 + 3 * npack] if qk_int8 else None
    pd = npack * d
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pd), 1) // d

    @pl.when(first_ref[p] == 1)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        qrot = _rot_rows(q_ref[0], cos_ref, sin_ref, i * qb, qb)
        if qk_int8:
            qf = qrot.astype(jnp.float32)
            sb = jnp.zeros((qb, pd), jnp.float32)
            for h in range(npack):
                sh = (jnp.max(jnp.abs(qf[:, h * d:(h + 1) * d]), axis=-1,
                              keepdims=True) / 127.0 + 1e-12)
                qs_scrs[h][...] = sh
                sb = sb + jnp.where(lane == h, sh, 0.0)
            qrot_scr[...] = jnp.round(qf / sb).astype(jnp.int8)
        else:
            qrot_scr[...] = qrot.astype(qrot_scr.dtype)
        for h in range(npack):
            m_scrs[h][...] = jnp.full_like(m_scrs[h], -jnp.inf)
            l_scrs[h][...] = jnp.zeros_like(l_scrs[h])

    @pl.when(kfirst_ref[p] == 1)
    def _stage_k():
        kc = _rot_rows(k_ref[0], cos_ref, sin_ref, c * chunk, chunk)
        sub = jax.lax.broadcasted_iota(jnp.int32, (npack * chunk, pd), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (npack * chunk, pd), 1)
        keep = (sub // chunk) == (lane2 // d)
        if qk_int8:
            kf = kc.astype(jnp.float32)
            sb_k = jnp.zeros((1, pd), jnp.float32)
            for h in range(npack):
                skh = (jnp.max(jnp.abs(kf[:, h * d:(h + 1) * d])) / 127.0
                       + 1e-12)
                ks_scr[h, c] = skh
                sb_k = sb_k + jnp.where(lane == h, skh, 0.0)
            ki = jnp.round(kf / sb_k).astype(jnp.int8)
            kbd_scr[pl.ds(c * npack * chunk, npack * chunk), :] = jnp.where(
                keep, jnp.tile(ki, (npack, 1)), jnp.zeros((), jnp.int8)
            ).astype(jnp.int8)
        else:
            kbd_scr[pl.ds(c * npack * chunk, npack * chunk), :] = jnp.where(
                keep, jnp.tile(kc, (npack, 1)), 0).astype(kbd_scr.dtype)

    q = qrot_scr[...]
    vc = v_ref[0]
    kbd = kbd_scr[pl.ds(c * npack * chunk, npack * chunk), :]
    if qk_int8:
        sk = [ks_scr[h, c] for h in range(npack)]
        s_scr[...] = jax.lax.dot_general(
            q, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        s_scr[...] = jax.lax.dot_general(
            q, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    allowed = _slab_mask(i, c, (qb, chunk), block=block, qb=qb, chunk=chunk)
    for h in range(npack):
        if qk_int8:
            sh_f = (s_scr[:, h * chunk:(h + 1) * chunk].astype(jnp.float32)
                    * (scale * sk[h])) * qs_scrs[h][...]
            sh = jnp.where(allowed, sh_f, NEG_INF)
        else:
            sh = jnp.where(allowed, s_scr[:, h * chunk:(h + 1) * chunk],
                           NEG_INF)
        m_prev = m_scrs[h][...]
        m_new = jnp.maximum(m_prev, jnp.max(sh, axis=-1, keepdims=True))
        pexp_h = jnp.exp(sh - m_new)
        alpha_h = jnp.exp(m_prev - m_new)
        l_scrs[h][...] = (l_scrs[h][...] * alpha_h
                          + jnp.sum(pexp_h, axis=-1, keepdims=True))
        m_scrs[h][...] = m_new
        vbd_h = jnp.where(lane == h, vc, 0).astype(vc.dtype)
        blend = jnp.where(lane == h, alpha_h, 1.0)
        acc_scr[...] = acc_scr[...] * blend + jax.lax.dot_general(
            pexp_h.astype(vc.dtype), vbd_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(last_ref[p] == 1)
    def _finalize():
        l_band = jnp.zeros((qb, pd), jnp.float32)
        for h in range(npack):
            l_band = l_band + jnp.where(lane == h, l_scrs[h][...], 0.0)
        o_ref[0] = (acc_scr[...] / l_band).astype(o_ref.dtype)
        for h in range(npack):
            lse_ref[0, h, pl.ds(i * qb, qb)] = (
                m_scrs[h][...] + jnp.log(l_scrs[h][...]))[:, 0]


def _fwd_packed_rope_bte(q, k, v, cos_pd, sin_pd, *, block: int,
                         n_heads: int, interpret: bool,
                         qk_int8: bool = False):
    """Packed causal forward over [B, T, E] with in-kernel rope.

    Returns (out [B, T, E], lse4 [B*NG, NPACK, T]) where head
    h = g*NPACK + p of batch b lives at lse4[b*NG + g, p].

    qk_int8 swaps the score scratch to int32 (raw int8-dot output,
    dequantized per head slice during the convert — a full-width f32 copy
    of the int32 scores would transiently double the 8 MB score scratch
    and blow VMEM), the rotated-q scratch to int8, and adds npack [QB, 1]
    per-row Q-scale scratches plus an SMEM [P, T/CHUNK] K-scale table.

    The staged-K cache ([T*P, P*D] VMEM scratch + per-pair ``kfirst``
    flags) holds every chunk's rotated/quantized block-diagonal tile for
    the whole batch-group pass — chunks are staged once, not once per
    visiting q-block."""
    from jax.experimental.pallas import tpu as pltpu

    b, t, e = q.shape
    d = e // n_heads
    npack, qb, chunk = _pack_plan(t, d, n_heads, block)
    pd = npack * d
    ng = e // pd
    nb = b * ng
    nchunks = t // chunk
    scale = 1.0 / (d ** 0.5)
    pr = _triangle_pairs(t, block, qb, chunk, True)
    i_arr, c_arr, last_arr = pr
    first_arr = (c_arr == 0).astype(c_arr.dtype)
    seen, kfirst = set(), []
    for c in c_arr.tolist():
        kfirst.append(0 if c in seen else 1)
        seen.add(c)

    qspec = pl.BlockSpec((1, qb, pd),
                         lambda g, p, i_r, c_r, f_r, l_r, kf_r: (
                             g // ng, i_r[p], g % ng))
    kvspec = pl.BlockSpec((1, chunk, pd),
                          lambda g, p, i_r, c_r, f_r, l_r, kf_r: (
                              g // ng, c_r[p], g % ng))
    tabspec = pl.BlockSpec((t, pd),
                           lambda g, p, i_r, c_r, f_r, l_r, kf_r: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb, len(i_arr)),
        in_specs=[qspec, kvspec, kvspec, tabspec, tabspec],
        out_specs=[
            qspec,
            pl.BlockSpec((1, npack, t),
                         lambda g, p, i_r, c_r, f_r, l_r, kf_r: (g, 0, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((qb, npack * chunk),
                        jnp.int32 if qk_int8 else jnp.float32),
             pltpu.VMEM((qb, pd), jnp.float32),
             pltpu.VMEM((qb, pd), jnp.int8 if qk_int8 else q.dtype),
             pltpu.VMEM((nchunks * npack * chunk, pd),
                        jnp.int8 if qk_int8 else q.dtype)]
            + [pltpu.VMEM((qb, 1), jnp.float32)
               for _ in range((3 if qk_int8 else 2) * npack)]
            + ([pltpu.SMEM((npack, nchunks), jnp.float32)]
               if qk_int8 else [])),
    )
    return pl.pallas_call(
        functools.partial(_fwd_packed_rope_kernel, block=block, qb=qb,
                          chunk=chunk, scale=scale, d=d, npack=npack,
                          qk_int8=qk_int8),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, t, e), q.dtype),
            jax.ShapeDtypeStruct((nb, npack, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # the QK dot (half the MACs) runs at the MXU's 2x int8 rate, so
            # count it at half weight so the scheduler hint stays comparable
            # to the bf16 variant (intentionally approximate — the int8
            # epilogue's extra VPU converts are not modeled)
            flops=int((1.5 if qk_int8 else 2)
                      * 2 * nb * len(i_arr) * qb * npack * chunk * d),
            bytes_accessed=int(4 * b * t * e * 4),
            transcendentals=int(nb * len(i_arr) * qb * npack * chunk),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=ROPE_FUSED_VMEM),
        interpret=interpret,
    )(jnp.asarray(i_arr), jnp.asarray(c_arr), jnp.asarray(first_arr),
      jnp.asarray(last_arr), jnp.asarray(kfirst, jnp.int32),
      q, k, v, cos_pd, sin_pd)


def rope_tables_packed(cache: jnp.ndarray, npack: int, dtype=jnp.float32):
    """[S, d//2, 2] rope cache -> (cos, sin) [S, npack*d] lane tables
    (each cache column repeated for lanes 2i, 2i+1, tiled per packed head)."""
    cos = jnp.repeat(cache[..., 0], 2, axis=-1)
    sin = jnp.repeat(cache[..., 1], 2, axis=-1)
    return (jnp.tile(cos, (1, npack)).astype(dtype),
            jnp.tile(sin, (1, npack)).astype(dtype))


def rope_fused_supported(b: int, t: int, e: int, n_heads: int,
                         tok_per_time: int, itemsize: int = 2,
                         interpret: bool = False) -> bool:
    """Static gate for ``slab_causal_attention_rope`` (callers fall back to
    the apply_rope + slab_causal_attention chain)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if e % n_heads != 0:
        return False
    d = e // n_heads
    plan = _pack_plan(t, d, n_heads, tok_per_time)
    if plan is None:
        return False
    npack, qb, chunk = plan
    if e % (npack * d) != 0:
        return False
    resident = (_packed_resident_bytes(t, d, itemsize, plan)
                + 2 * t * npack * d * 4          # sin/cos tables
                + qb * npack * d * itemsize      # rotated-q scratch
                + t * npack * npack * d * itemsize)  # staged-K chunk cache
    return resident < ROPE_FUSED_VMEM


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _slab_rope_attention(q, k, v, cos_pd, sin_pd, block: int, n_heads: int,
                         interpret: bool, qk_int8: bool = False):
    out, _ = _fwd_packed_rope_bte(q, k, v, cos_pd, sin_pd, block=block,
                                  n_heads=n_heads, interpret=interpret,
                                  qk_int8=qk_int8)
    return out


def _slab_rope_attention_fwd(q, k, v, cos_pd, sin_pd, block, n_heads,
                             interpret, qk_int8=False):
    out, lse4 = _fwd_packed_rope_bte(q, k, v, cos_pd, sin_pd, block=block,
                                     n_heads=n_heads, interpret=interpret,
                                     qk_int8=qk_int8)
    return out, (q, k, v, cos_pd, sin_pd, out, lse4)


def _slab_rope_attention_bwd(block, n_heads, interpret, qk_int8, res, do):
    """Backward: rotate with the cheap folded-layout XLA rope, run the
    head-packed bwd kernels (per-head triangle fallback for shapes the
    packed plan rejects), rotate dq/dk back by the inverse rotation
    (R(-theta): same cos, negated sin). With qk_int8 the backward recomputes
    EXACT bf16 scores but reuses the QUANTIZED forward's out/lse residuals,
    so the softmax probabilities don't renormalize — approximately
    straight-through gradients, deviation bounded by the quantization error
    (~1.5% vs true bf16 grads, measured in interpret mode; the int8 path is
    inference-oriented)."""
    from frankenstein_tpu.ops import rope as rope_ops

    q, k, v, cos_pd, sin_pd, out, lse4 = res
    b, t, e = q.shape
    d = e // n_heads
    scale = 1.0 / (d ** 0.5)
    cos_e = jnp.tile(cos_pd[:, :d], (1, n_heads))
    sin_e = jnp.tile(sin_pd[:, :d], (1, n_heads))
    qr = rope_ops.apply_rope_folded(q, cos_e, sin_e)
    kr = rope_ops.apply_rope_folded(k, cos_e, sin_e)
    npack = PACK_LANES // d
    if (n_heads % max(npack, 1) == 0 and e % (npack * d) == 0
            and _bwd_packed_supported(t, d, npack,
                                      jnp.dtype(q.dtype).itemsize, block,
                                      interpret)):
        ng = e // (npack * d)
        pk = lambda x: _pack_groups(x, ng, npack * d)
        dq4, dk4, dv4 = _bwd_packed(pk(qr), pk(kr), pk(v), pk(out), pk(do),
                                    lse4, block=block, scale=scale,
                                    interpret=interpret, causal=True,
                                    npack=npack, d=d)
        unpk = lambda x4: _unpack_groups(x4, b, ng)
        dq = rope_ops.apply_rope_folded(unpk(dq4), cos_e, -sin_e)
        dk = rope_ops.apply_rope_folded(unpk(dk4), cos_e, -sin_e)
        return (dq, dk, unpk(dv4), jnp.zeros_like(cos_pd),
                jnp.zeros_like(sin_pd))
    to3 = lambda x: jnp.transpose(x.reshape(b, t, n_heads, d),
                                  (0, 2, 1, 3)).reshape(b * n_heads, t, d)
    lse = lse4.reshape(b * n_heads, t)[:, None, :]
    dqr, dkr, dv = _bwd(to3(qr), to3(kr), to3(v), to3(out), to3(do), lse,
                        block=block, scale=scale, interpret=interpret,
                        causal=True)
    fold = lambda x3: jnp.transpose(x3.reshape(b, n_heads, t, d),
                                    (0, 2, 1, 3)).reshape(b, t, e)
    dq = rope_ops.apply_rope_folded(fold(dqr), cos_e, -sin_e)
    dk = rope_ops.apply_rope_folded(fold(dkr), cos_e, -sin_e)
    return dq, dk, fold(dv), jnp.zeros_like(cos_pd), jnp.zeros_like(sin_pd)


_slab_rope_attention.defvjp(_slab_rope_attention_fwd,
                            _slab_rope_attention_bwd)


def slab_causal_attention_rope(q, k, v, tok_per_time: int, rope_cache,
                               n_heads: int, interpret: bool = False,
                               qk_int8: bool = False) -> jnp.ndarray:
    """Slab-causal flash attention over UNROTATED [B, T, E] q/k/v with RoPE
    applied in-kernel (suffix-aligned, the reference's decode semantics,
    reference:models/brainformer.py:80). Callers gate on
    ``rope_fused_supported``; rope_cache: [S >= T, d//2, 2].

    qk_int8: run the QK score dot at the MXU's int8 rate (Q quantized per
    (row, head), K per (chunk, head), exact dequant in the convert).
    Serving-grade accuracy, not bit-exact — drift bounds in
    tests/test_attention.py::test_rope_fused_qk_int8_forward_tolerance;
    gradients are approximately straight-through (exact-bf16 recompute
    against the quantized forward's residuals,
    ::test_rope_fused_qk_int8_grad_tolerance)."""
    b, t, e = q.shape
    d = e // n_heads
    npack = PACK_LANES // d
    cos_pd, sin_pd = rope_tables_packed(rope_cache[-t:], npack)
    return _slab_rope_attention(q, k, v, cos_pd, sin_pd, tok_per_time,
                                n_heads, interpret, qk_int8)
