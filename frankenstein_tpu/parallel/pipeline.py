"""GPipe-style pipeline parallelism over a mesh axis, TPU-native.

The reference's distribution story is single-node Accelerate DDP
(reference:utils/train_utils.py:97-122) — it has no pipeline parallelism.
This module provides the TPU-idiomatic version for models that are a stack
of same-shape layers (every transformer here stores its blocks as stacked
``[L, ...]`` params via ``nn.scan``, models/gpt2.py:117-123):

- the mesh gets a ``'stage'`` axis; the stacked ``[L, ...]`` params shard as
  ``P('stage', ...)`` — stage ``s`` physically holds layers
  ``[s*L/S, (s+1)*L/S)``, no parameter reshuffling needed;
- inside ``shard_map``, each stage scans its local layers, then hands the
  activation to the next stage with a single ``lax.ppermute`` hop over ICI;
- the schedule is a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks
  (GPipe fill/steady/drain). Bubbles compute garbage that is masked out —
  the SPMD cost model (every device runs the same program) makes this the
  natural XLA formulation, and the bubble fraction (S-1)/(T) is the usual
  GPipe overhead, amortized by more microbatches;
- everything is differentiable: ``jax.grad`` through the scan produces the
  reverse ppermutes automatically, so pipelined training needs no manual
  backward schedule.

Used by tests/test_pipeline.py (parity vs the unsharded layer stack on the
8-device CPU mesh) and __graft_entry__.dryrun_multichip (PP phase).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved out of experimental in jax 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

STAGE_AXIS = "stage"


def _pvary(x, axis):
    """Mark ``x`` as varying over ``axis`` (no-op on JAX versions without
    the varying-manual-axes type system). jax.lax.pcast is the current
    spelling; pvary is its deprecated alias."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    if hasattr(jax.lax, "pvary"):  # pragma: no cover — pre-pcast JAX
        return jax.lax.pvary(x, (axis,))
    return x


def gpipe(stage_fn: Callable, n_stages: int, n_micro: int,
          axis: str = STAGE_AXIS) -> Callable:
    """Build the per-device pipelined apply (call it under ``shard_map``).

    stage_fn: ``(local_params, x[mb, ...]) -> y[mb, ...]`` — this stage's
      slice of the network (same activation shape in and out; e.g. a scan
      over the stage's local transformer layers). ``local_params`` is
      whatever slice of the params shard_map handed this device.
    Returns ``fn(local_params, x[n_micro, mb, ...]) -> y[n_micro, mb, ...]``
      where microbatch ``m`` has passed through all ``n_stages`` stages in
      order. The result is identical on every stage (one masked ``psum``
      broadcast at the end).
    """
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")

    def fn(local_params, x):
        s_idx = jax.lax.axis_index(axis)
        n_ticks = n_micro + n_stages - 1
        perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]
        # zeros built from x inherit its varying axes (e.g. a 'data' axis in
        # DP x PP); additionally mark them varying over the stage axis so the
        # scan carry type matches the ppermuted/masked outputs (JAX's
        # varying-manual-axes check under shard_map)
        state0 = _pvary(x[0] * 0, axis)
        out0 = _pvary(x * 0, axis)

        def tick(carry, t):
            state, out = carry
            # stage 0 injects microbatch t (clamped during drain ticks);
            # later stages consume the ppermuted activation from upstream
            inject = jax.lax.dynamic_index_in_dim(
                x, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            h = stage_fn(local_params, jnp.where(s_idx == 0, inject, state))
            # the last stage finishes microbatch t-(S-1) on tick t
            m = t - (n_stages - 1)
            mc = jnp.clip(m, 0, n_micro - 1)
            prev = jax.lax.dynamic_index_in_dim(out, mc, 0, keepdims=False)
            keep = jnp.logical_and(s_idx == n_stages - 1, m >= 0)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(keep, h, prev), mc, 0)
            state = jax.lax.ppermute(h, axis, perm)
            return (state, out), None

        (_, out), _ = jax.lax.scan(tick, (state0, out0), jnp.arange(n_ticks))
        # only the last stage holds real outputs; broadcast to all stages
        return jax.lax.psum(
            jnp.where(s_idx == n_stages - 1, out, jnp.zeros_like(out)), axis)

    return fn


def pipelined_apply(mesh: Mesh, stage_fn: Callable, stacked_params, x,
                    n_micro: int, axis: str = STAGE_AXIS,
                    data_axis: str | None = None):
    """Convenience wrapper: shard stacked ``[L, ...]`` params over ``axis``,
    split ``x [B, ...]`` into ``n_micro`` microbatches, run the pipeline, and
    merge. ``stage_fn(local_params, h)`` sees ``local_params`` with a leading
    ``[L // n_stages]`` axis.

    If ``data_axis`` names a second mesh axis, the batch additionally shards
    over it (DP x PP): microbatching happens on each data-shard locally.
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    dp = mesh.shape[data_axis] if data_axis else 1
    if (b // dp) % n_micro != 0:
        raise ValueError(f"per-data-shard batch {b}//{dp} not divisible by "
                         f"n_micro={n_micro}")

    fn = gpipe(stage_fn, n_stages, n_micro, axis)

    def device_fn(local_params, xs):
        mb = xs.shape[0] // n_micro
        ys = fn(local_params,
                xs.reshape((n_micro, mb) + xs.shape[1:]))
        return ys.reshape((n_micro * mb,) + ys.shape[2:])

    p_params = jax.tree_util.tree_map(
        lambda a: P(axis) if hasattr(a, "ndim") else P(), stacked_params)
    px = P(data_axis) if data_axis else P()
    return shard_map(device_fn, mesh=mesh,
                     in_specs=(p_params, px), out_specs=px)(stacked_params, x)


def stage_scan(layer_fn: Callable) -> Callable:
    """Lift a single-layer fn ``(layer_params, h) -> h`` into a stage fn that
    scans the stage's local ``[L_local, ...]`` params."""
    def stage_fn(local_params, h):
        def body(carry, lp):
            return layer_fn(lp, carry), None
        out, _ = jax.lax.scan(body, h, local_params)
        return out
    return stage_fn
