"""Fused LN + LM head + chunked top-k kernel (ops/pallas/lm_head_topk.py),
interpret mode: exact parity with the XLA formulation the decode loop uses
(layer_norm -> einsum vs transposed table -> top_k / logsumexp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frankenstein_tpu.ops import norms
from frankenstein_tpu.ops.pallas import lm_head_topk

B, E, V, CH = 8, 128, 512, 128


def setup(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
    ln_w = jnp.asarray(rng.standard_normal((E,)) * 0.1 + 1, jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((E,)) * 0.1, jnp.float32)
    w_t = jnp.asarray(rng.standard_normal((E, V)) * 0.05, jnp.float32)
    return x, ln_w, ln_b, w_t


def oracle_logits(x, ln_w, ln_b, w_t):
    h = norms.layer_norm(x[:, None], ln_w, ln_b, 1e-5)[:, 0]
    return jnp.einsum("bd,dv->bv", h, w_t,
                      preferred_element_type=jnp.float32)


def test_global_topk_and_logz_match_oracle():
    x, ln_w, ln_b, w_t = setup()
    k = 5
    vals, idx, logz = lm_head_topk.lm_head_topk(
        x, ln_w, ln_b, w_t, k=k, chunk=CH, interpret=True)
    assert vals.shape == (B, (V // CH) * k)

    logits = oracle_logits(x, ln_w, ln_b, w_t)
    want_v, want_i = jax.lax.top_k(logits, k)
    # global top-k must be recoverable from the per-chunk candidates
    got_v, pos = jax.lax.top_k(vals, k)
    got_i = jnp.take_along_axis(idx, pos, axis=1)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # exact full-vocab logsumexp
    want_z = jax.nn.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(logz), np.asarray(want_z),
                               rtol=1e-5, atol=1e-5)


def test_candidate_values_match_their_indices():
    """Every (val, idx) pair must be a real logit entry."""
    x, ln_w, ln_b, w_t = setup(1)
    vals, idx, _ = lm_head_topk.lm_head_topk(
        x, ln_w, ln_b, w_t, k=3, chunk=CH, interpret=True)
    logits = np.asarray(oracle_logits(x, ln_w, ln_b, w_t))
    v, i = np.asarray(vals), np.asarray(idx)
    for b in range(B):
        np.testing.assert_allclose(v[b], logits[b, i[b]], rtol=1e-5,
                                   atol=1e-5)


def test_duplicate_logit_values_get_distinct_indices():
    """Ties are broken by first index, never repeating a candidate."""
    x, ln_w, ln_b, w_t = setup(2)
    w_t = w_t.at[:, 7].set(w_t[:, 3])  # force exact duplicate columns
    vals, idx, _ = lm_head_topk.lm_head_topk(
        x, ln_w, ln_b, w_t, k=4, chunk=CH, interpret=True)
    i = np.asarray(idx)
    for b in range(B):
        per_chunk = i[b].reshape(V // CH, 4)
        for c in per_chunk:
            assert len(set(c.tolist())) == 4


def test_supported_gate():
    assert lm_head_topk.supported(128, 768, 50304, interpret=True)
    assert not lm_head_topk.supported(128, 768, 50000, interpret=True)
    assert not lm_head_topk.supported(3, 768, 50304, interpret=True)


def test_flagship_chunking():
    """50304 = 3 x 16768: the production vocab divides the chunk size, and
    the chunk is lane-aligned (Mosaic block constraint)."""
    assert 50304 % lm_head_topk._CHUNK == 0
    assert lm_head_topk._CHUNK % 128 == 0
