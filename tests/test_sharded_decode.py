"""Data-parallel SERVING: KV-cached decode over a device mesh.

The training side of the mesh story is covered by tests/test_trainer.py and
dryrun_multichip; this covers inference — a batch sharded over the 'data'
axis must decode to exactly the tokens of the single-device run (params
replicated, cache sharded along its batch axis by propagation). Reference
has no multi-device inference at all (decode loops are single-GPU Python,
reference:models/gpt2_model.py:328-454).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from frankenstein_tpu.config import GPTConfig
from frankenstein_tpu.decode import sampling
from frankenstein_tpu.models import gpt2
from frankenstein_tpu.parallel.mesh import make_mesh


def _small_gpt():
    cfg = GPTConfig(block_size=64, vocab_size=160, n_layer=2, n_head=2,
                    n_embd=32, dropout=0.0, bias=True)
    model = gpt2.GPT(cfg)
    idx0 = jnp.zeros((8, 4), jnp.int32)
    params = model.init(jax.random.key(0), idx0)
    return model, params


def test_dp_sharded_greedy_decode_matches_single_device():
    model, params = _small_gpt()
    rng = np.random.default_rng(0)
    b = 16
    idx0 = jnp.asarray(rng.integers(0, 160, (b, 4)), jnp.int32)
    prefix = jnp.asarray(rng.normal(size=(b, 3, 32)), jnp.float32)

    want = sampling.generate(model, params, idx0, prefix, jax.random.key(1),
                             max_new_tokens=5, greedy=True)

    mesh = make_mesh((8, 1))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    idx_s = jax.device_put(idx0, data)
    prefix_s = jax.device_put(prefix, data)
    params_s = jax.device_put(params, repl)
    got = sampling.generate(model, params_s, idx_s, prefix_s,
                            jax.random.key(1), max_new_tokens=5, greedy=True)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dp_sharded_beam_search_matches_single_device():
    model, params = _small_gpt()
    rng = np.random.default_rng(1)
    b = 8
    idx0 = jnp.asarray(rng.integers(0, 160, (b, 4)), jnp.int32)
    prefix = jnp.asarray(rng.normal(size=(b, 3, 32)), jnp.float32)

    want_toks, want_scores = sampling.beam_search(model, params, idx0, prefix,
                                                  max_new_tokens=4, beam_width=3)

    mesh = make_mesh((8, 1))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    got_toks, got_scores = sampling.beam_search(
        model, jax.device_put(params, repl),
        jax.device_put(idx0, data), jax.device_put(prefix, data),
        max_new_tokens=4, beam_width=3)
    np.testing.assert_array_equal(np.asarray(got_toks), np.asarray(want_toks))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(want_scores),
                               atol=1e-5)


def test_dp_sharded_int8_kv_decode():
    """The QuantCache path also rides a sharded batch (scales replicate —
    they have no batch axis)."""
    model, params = _small_gpt()
    rng = np.random.default_rng(2)
    b = 16
    idx0 = jnp.asarray(rng.integers(0, 160, (b, 4)), jnp.int32)
    prefix = jnp.asarray(rng.normal(size=(b, 3, 32)), jnp.float32)

    want = sampling.generate(model, params, idx0, prefix, jax.random.key(1),
                             max_new_tokens=5, greedy=True, int8_kv=True)

    mesh = make_mesh((8, 1))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    got = sampling.generate(
        model, jax.device_put(params, repl),
        jax.device_put(idx0, data), jax.device_put(prefix, data),
        jax.random.key(1), max_new_tokens=5, greedy=True, int8_kv=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
