"""Attention-mask builders, computed on the fly (never materialized at 6144^2
unless a dense mask is explicitly requested).

Key structural fact about the reference's "advanced causal mask"
(reference:models/brainformer.py:93-111): ``tril`` + full blocks on the
diagonal slabs collapses to the closed form

    allowed(i, j)  <=>  slab(j) <= slab(i),   slab(k) = k // tok_per_time

i.e. causality at time-slab granularity with dense attention inside a slab.
``tests/test_masks.py`` property-tests this equivalence against a literal
translation of the reference's loop construction. The closed form is what the
Pallas kernel and the XLA path both use — O(1) memory, O(T^2) only if you ask
for the dense boolean matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def slab_ids(n: int, tok_per_time: int) -> jnp.ndarray:
    """Slab index of each of n tokens (iota // tok_per_time)."""
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) // tok_per_time


def block_causal_mask(block_size: int, tok_per_time: int) -> jnp.ndarray:
    """Dense [T, T] bool mask, True = attend. Matches
    reference:models/brainformer.py:93-111 exactly (see tests)."""
    s = slab_ids(block_size, tok_per_time)
    return s[None, :] <= s[:, None]


def block_causal_mask_from_positions(q_pos: jnp.ndarray, k_pos: jnp.ndarray,
                                     tok_per_time: int) -> jnp.ndarray:
    """Mask for gathered token subsets (MAE): [..., Tq] x [..., Tk] -> [..., Tq, Tk].

    Replaces the reference's gather of a materialized 6144^2 matrix
    (reference:models/brainformer.py:392-413) with arithmetic on positions.
    """
    sq = q_pos // tok_per_time
    sk = k_pos // tok_per_time
    return sk[..., None, :] <= sq[..., :, None]


def causal_mask(t_q: int, t_k: int) -> jnp.ndarray:
    """Standard causal mask aligned to the sequence END (suffix semantics):
    query i (of t_q) sits at absolute position t_k - t_q + i."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (t_q, t_k), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (t_q, t_k), 1)
    return kj <= qi + (t_k - t_q)


def padding_mask(x: jnp.ndarray, pad_value: float = 0.0) -> jnp.ndarray:
    """[B, T, C] -> [B, T] True where the timestep is real (not all-pad).

    Mirrors ``create_attention_mask_from_padding``
    (reference:models/simple_mae:231-238) and the VQ-VAE loss row mask
    (reference:models/vq_brain.py:220-227).
    """
    return ~jnp.all(x == pad_value, axis=-1)


def self_attention_padding_mask(valid: jnp.ndarray) -> jnp.ndarray:
    """[B, T] valid flags -> [B, T, T] pairwise mask (valid_i & valid_j)."""
    return valid[:, :, None] & valid[:, None, :]
