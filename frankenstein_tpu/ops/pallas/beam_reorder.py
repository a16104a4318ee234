"""Beam-search KV-cache reorder as one clean streaming pass.

Beam search must gather the whole [L, B*W, S, E] cache to the surviving
beams every step. The XLA lowering of that gather (``jnp.take(axis=1)``)
materializes a batch-major gather THEN a relayout copy back to the carry
layout, and the per-index DMA is strided across the L-leading dim — wall
clock attribution measured it at 456 of a 633 ms width-5 beam batch at
b=128 on v5e (~10% of HBM bandwidth; /tmp-style variant timing, recorded
in BASELINE.md).

Beam parents never cross sentence groups: row ``g*w + n`` gathers from
``g*w + parent[g, n]`` with ``parent in [0, w)``. So the permutation is
BLOCK-LOCAL: a grid over (layer, row-groups) streams each [gw, S, E] tile
through VMEM once, permutes rows with dynamic-index vector copies, and
writes the same tile location back out — minimal traffic (one read + one
write of the cache), identical input/output layout, no relayout pass.
(A one-hot permutation MATMUL was rejected: gw^2 * S * E hardware MACs per
tile is FLOP-stupid — dynamic row copies are pure VMEM bandwidth.)

Used by decode/sampling beam paths via ``models/gpt2.GPT.reorder_cache``
(which falls back to ``jnp.take`` off-TPU or for ungrouped index patterns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_VMEM_LIMIT = 114 * 1024 * 1024   # raised via CompilerParams (default 16M)
_VMEM_BUDGET = 90 * 1024 * 1024   # in+out double-buffered tiles budget


def _kernel(src_ref, in_ref, out_ref, *, gw: int):
    # src_ref: [BW] int32 in SMEM (scalar prefetch) — block-local source row
    # per output row, indexed at this block's absolute row offset
    bi = pl.program_id(1)
    for r in range(gw):  # static unroll: gw dynamic-start row copies
        s = src_ref[bi * gw + r]
        out_ref[0, r] = in_ref[0, pl.ds(s, 1)][0]


def _pick_group_rows(bw: int, w: int, s: int, e: int, itemsize: int) -> int:
    """Largest multiple of w dividing bw whose double-buffered in+out tiles
    fit VMEM."""
    best = 0
    for g in range(1, bw // w + 1):
        gw = g * w
        if bw % gw != 0:
            continue
        if 4 * gw * s * e * max(itemsize, 1) > _VMEM_BUDGET:
            break
        best = gw
    return best


def supported(cache_side, w: int, interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    l, bw, s, e = cache_side.shape
    if bw % w != 0 or e % 128 != 0 or s % 8 != 0:
        return False
    return _pick_group_rows(bw, w, s, e,
                            jnp.dtype(cache_side.dtype).itemsize) > 0


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def beam_reorder(cache_side, parent_local, *, w: int,
                 interpret: bool = False):
    """Gather beam rows: out[g*w + n] = in[g*w + parent_local[g*w + n]].

    cache_side: [L, B*W, S, E] (any dtype — bf16/f32/int8 codes reorder as
    raw rows); parent_local: [B*W] int32 with values in [0, w).
    """
    from jax.experimental.pallas import tpu as pltpu

    l, bw, s, e = cache_side.shape
    gw = _pick_group_rows(bw, w, s, e, jnp.dtype(cache_side.dtype).itemsize)
    assert gw > 0, "caller must gate on supported()"
    # block-local source row for every output row (SMEM scalar prefetch)
    base = (jnp.arange(bw, dtype=jnp.int32) // w) * w
    src = (base + parent_local.astype(jnp.int32)) % gw

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, bw // gw),
        in_specs=[
            pl.BlockSpec((1, gw, s, e), lambda li, bi, src: (li, bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, gw, s, e),
                               lambda li, bi, src: (li, bi, 0, 0)),
    )
    # The output ALIASES the input (operand 1 after the scalar prefetch):
    # a permutation cannot be done in place at the array level, but it CAN
    # at the BLOCK level — each grid step loads its whole [gw, S, E] tile
    # into VMEM before the output DMA writes the same HBM region back, and
    # the permutation never crosses tiles. Without the alias, every scan
    # step allocates a fresh cache-sized buffer and XLA copies it back into
    # the loop carry.
    return pl.pallas_call(
        functools.partial(_kernel, gw=gw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache_side.shape, cache_side.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(src, cache_side)
