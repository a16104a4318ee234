"""Ring attention: sequence parallelism over a mesh axis, TPU-native.

Shards the SEQUENCE over a ``'seq'`` mesh axis — each device holds a
``[B, T/n, H, D]`` slice of Q/K/V — and rotates the K/V blocks around the
ICI ring with ``lax.ppermute`` while accumulating the local queries' online
softmax (flash-attention m/l/o update). After ``n`` hops every query has
seen every key; no device ever materializes more than a ``[B, Tq, H, Tk]``
block of scores, and peak activation memory per device drops by the ring
size. This is the sequence-parallel ("sp") long-context strategy for
windows that exceed one chip's HBM — complementary to the single-chip
Pallas slab kernel (ops/pallas/block_attention.py), which stays the fast
path when the sequence fits.

Differentiable: ``jax.grad`` through the scan-of-ppermute produces the
reverse ring automatically (the backward pass rotates gradients the other
way), so sequence-parallel TRAINING works with no hand-written backward.

Masking supports the three patterns the models use (ops/masks.py):
full bidirectional, token-causal, and slab-causal (attend iff
``q_pos // slab >= k_pos // slab``, the BrainFormer encoder rule,
reference:models/brainformer.py:333-352). Masks are evaluated from GLOBAL
positions reconstructed via ``axis_index``, so sharding is invisible to the
math. No analog exists in the reference (single-GPU SDPA).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from frankenstein_tpu.parallel.pipeline import _pvary, shard_map

SEQ_AXIS = "seq"
NEG_INF = float(np.finfo(np.float32).min)


def ambient_seq_mesh() -> Optional[Mesh]:
    """The mesh from the enclosing ``with mesh:`` context iff it has a
    ``'seq'`` axis (trace-time decision; None otherwise). Lets model code
    opt into sequence parallelism (``MAEConfig.seq_parallel``) without
    threading a Mesh through module attributes."""
    try:  # moved in JAX 0.8.2; the pxla re-export warns and will be removed
        from jax._src.mesh import thread_resources
    except ImportError:  # pragma: no cover — older JAX
        from jax.interpreters.pxla import thread_resources

    mesh = thread_resources.env.physical_mesh
    if mesh is not None and not getattr(mesh, "empty", True) \
            and SEQ_AXIS in mesh.axis_names:
        return mesh
    return None


def _block_mask(q_pos, k_pos, causal: bool, slab: Optional[int]):
    """[Tq, Tk] bool allow-mask from global positions."""
    if slab is not None:
        return (q_pos[:, None] // slab) >= (k_pos[None, :] // slab)
    if causal:
        return q_pos[:, None] >= k_pos[None, :]
    return None


def ring_attention(q, k, v, *, axis: str = SEQ_AXIS, n_shards: int,
                   causal: bool = False, slab: Optional[int] = None,
                   scale: Optional[float] = None):
    """Per-device body — call under ``shard_map`` with q/k/v sharded on the
    sequence dim. q, k, v: ``[B, T_local, H, D]``. Returns ``[B, T_local,
    H, D]`` equal to full attention over the GLOBAL sequence.
    """
    b, t_loc, h, d = q.shape
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    my = jax.lax.axis_index(axis)
    q_pos = my * t_loc + jnp.arange(t_loc)
    qf = q.astype(jnp.float32) * scale
    # send blocks forward around the ring; after step s the resident block
    # ORIGINATES from shard (my - s) mod n
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    # accumulators must carry the seq-varying type (JAX's varying-manual-axes
    # check under shard_map): zeros/fulls are axis-invariant by default
    o0 = _pvary(jnp.zeros((b, t_loc, h, d), jnp.float32), axis)
    l0 = _pvary(jnp.zeros((b, h, t_loc), jnp.float32), axis)
    m0 = _pvary(jnp.full((b, h, t_loc), NEG_INF), axis)

    def step(carry, s):
        o, l, m, kb, vb = carry
        src = (my - s) % n_shards
        k_pos = src * t_loc + jnp.arange(t_loc)
        sc = jnp.einsum("bqhd,bkhd->bhqk", qf, kb.astype(jnp.float32))
        mask = _block_mask(q_pos, k_pos, causal, slab)
        if mask is not None:
            sc = jnp.where(mask[None, None], sc, NEG_INF)
        m_blk = jnp.max(sc, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        # rows with nothing visible yet keep m = -inf; exp(-inf - -inf) guard
        alpha = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - m_new))
        p = jnp.where(m_new[..., None] == NEG_INF, 0.0,
                      jnp.exp(sc - m_new[..., None]))
        o = (o * jnp.transpose(alpha, (0, 2, 1))[..., None]
             + jnp.einsum("bhqk,bkhd->bqhd", p, vb.astype(jnp.float32)))
        l = l * alpha + jnp.sum(p, axis=-1)
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        return (o, l, m_new, kb, vb), None

    (o, l, _, _, _), _ = jax.lax.scan(
        step, (o0, l0, m0, k, v), jnp.arange(n_shards))
    denom = jnp.transpose(jnp.maximum(l, 1e-30), (0, 2, 1))[..., None]
    return (o / denom).astype(q.dtype)


def ring_attention_sharded(mesh: Mesh, q, k, v, *, causal: bool = False,
                           slab: Optional[int] = None,
                           axis: str = SEQ_AXIS,
                           scale: Optional[float] = None):
    """Global-view convenience wrapper: q/k/v ``[B, T, H, D]`` host arrays,
    sequence split over ``mesh['seq']`` (T must divide evenly)."""
    n = mesh.shape[axis]
    t = q.shape[1]
    if t % n != 0:
        raise ValueError(f"sequence {t} not divisible by seq axis size {n}")
    spec = P(None, axis)

    def body(q, k, v):
        return ring_attention(q, k, v, axis=axis, n_shards=n, causal=causal,
                              slab=slab, scale=scale)

    return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
