"""The driver's entry points must never break: __graft_entry__ (compile-check
+ multichip dryrun) and bench.py (round-end benchmark)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_graft_entry_tiny_traces():
    import __graft_entry__ as g
    model, cfg = g._flagship(tiny=True)
    x = jnp.zeros((2, 32, 8))
    y = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), x, y)
    loss, _ = model.apply(params, x, y)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dryrun_multichip_two_devices():
    import __graft_entry__ as g
    g.dryrun_multichip(2)   # exercises DP and the TPxDP llama phase


def test_bench_module_shape():
    import bench
    assert callable(bench.main)
    assert callable(bench._bench)
