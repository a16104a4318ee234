"""FSDP-style parameter sharding: placement correctness + training parity
with replicated DP on the 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frankenstein_tpu.config import TrainConfig
from frankenstein_tpu.parallel import mesh as mesh_lib
from frankenstein_tpu.parallel import sharding as shard_lib
from frankenstein_tpu.train import trainer
from tests.test_trainer import tiny_batch, tiny_franky_spec


def test_fsdp_spec_picks_divisible_dim():
    mesh = mesh_lib.make_mesh((8, 1))
    # large and divisible on dim 0
    assert shard_lib.fsdp_spec((800, 512), mesh) == jax.sharding.PartitionSpec("data", None)
    # dim0 not divisible -> dim1
    assert shard_lib.fsdp_spec((801, 512), mesh) == jax.sharding.PartitionSpec(None, "data")
    # small params replicate
    assert shard_lib.fsdp_spec((16,), mesh) == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_fsdp_training_matches_replicated():
    mesh = mesh_lib.make_mesh((8, 1))
    spec = tiny_franky_spec()
    batch = tiny_batch(16)
    cfg = TrainConfig(batch_size=16, learning_rate=1e-3, warmup_iters=0,
                      use_scheduler=False)

    state_r, tx = trainer.init_state(spec, cfg, batch)
    step_fn = trainer.make_train_step(spec, tx, cfg)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)

    with mesh:
        srep = mesh_lib.replicate(mesh, state_r)
        s1, l1, _ = step_fn(srep, mesh_lib.shard_batch(mesh, jb),
                            jax.random.key(0))

        state_f, _ = trainer.init_state(spec, cfg, batch)
        sfsdp = trainer.TrainState(
            params=shard_lib.shard_params_fsdp(mesh, state_f.params,
                                               min_size=256),
            opt_state=shard_lib.shard_params_fsdp(mesh, state_f.opt_state,
                                                  min_size=256),
            extra=mesh_lib.replicate(mesh, state_f.extra),
            step=jax.device_put(state_f.step, mesh_lib.replicated(mesh)))
        s2, l2, _ = step_fn(sfsdp, mesh_lib.shard_batch(mesh, jb),
                            jax.random.key(0))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # something actually got sharded
    flat = jax.tree_util.tree_leaves(s2.params)
    assert any("data" in str(x.sharding.spec) for x in flat
               if hasattr(x, "sharding"))
