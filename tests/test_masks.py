"""Property tests for mask builders against literal reference semantics
(reference:models/brainformer.py:93-111)."""

import numpy as np
import jax.numpy as jnp
import pytest

from frankenstein_tpu.ops import masks


def reference_advanced_causal_mask(block_size, tok_per_time):
    """Literal numpy re-statement of the reference's loop construction:
    tril, then full blocks on the slab diagonal."""
    m = np.tril(np.ones((block_size, block_size)))
    for i in range(0, block_size, tok_per_time):
        m[i:i + tok_per_time, i:i + tok_per_time] = 1.0
    return m.astype(bool)


@pytest.mark.parametrize("block_size,tok_per_time", [
    (64, 8), (96, 16), (6144 // 8, 256 // 8), (24, 24), (30, 5),
])
def test_block_causal_matches_reference(block_size, tok_per_time):
    ours = np.asarray(masks.block_causal_mask(block_size, tok_per_time))
    ref = reference_advanced_causal_mask(block_size, tok_per_time)
    np.testing.assert_array_equal(ours, ref)


def test_positions_submask_equals_gathered_dense():
    """The MAE path gathers a submatrix of the dense mask
    (reference:models/brainformer.py:392-413); our position arithmetic must
    agree with gathering."""
    rng = np.random.default_rng(0)
    block_size, p = 96, 16
    dense = np.asarray(masks.block_causal_mask(block_size, p))
    for _ in range(5):
        idx = np.sort(rng.choice(block_size, size=24, replace=False))
        sub_gather = dense[np.ix_(idx, idx)]
        sub_ours = np.asarray(
            masks.block_causal_mask_from_positions(jnp.asarray(idx), jnp.asarray(idx), p))
        np.testing.assert_array_equal(sub_ours, sub_gather)


def test_causal_mask_suffix_alignment():
    # decode: 1 query against 10 keys — everything visible
    m = np.asarray(masks.causal_mask(1, 10))
    assert m.all()
    # square: standard tril
    m = np.asarray(masks.causal_mask(6, 6))
    np.testing.assert_array_equal(m, np.tril(np.ones((6, 6), bool)))


def test_padding_mask():
    x = np.ones((2, 5, 3), np.float32)
    x[0, 3:] = 0.0
    valid = np.asarray(masks.padding_mask(jnp.asarray(x)))
    assert valid[0].tolist() == [True, True, True, False, False]
    assert valid[1].all()
    pair = np.asarray(masks.self_attention_padding_mask(jnp.asarray(valid)))
    assert pair.shape == (2, 5, 5)
    assert pair[0, 0, 3] == False  # noqa: E712
    assert pair[0, 2, 2] == True  # noqa: E712
