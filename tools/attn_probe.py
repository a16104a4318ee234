"""Packed slab-attention component pricing (round 3).

The packed forward (ops/pallas/block_attention.py:_fwd_packed_kernel) runs
~93 ms/layer-call at the flagship shape — ~114 Tops/s counting the 4x
hardware MACs of the block-diagonal staging, vs the chip's 197 peak. This
probe prices each non-dot component by timing VARIANT kernels on the same
triangle-pair schedule (same grid, same DMA):

  kernel      — the production packed single call (reference point)
  dots_only   — QK dot + PV dots, no softmax/mask (accumulate raw)
  no_kbd      — full kernel but kbd/vbd staged by tile only (no iota/where)
  no_mask     — full kernel, mask dropped (values wrong, timing only)
  mask_last   — mask applied ONLY on each q-block's final (partial) chunk
                via @pl.when (30 of 42 pairs skip the iota+compare+select)
  exp2        — scores scaled by log2(e) at the dot, jnp.exp2 softmax

plus `xla_dot`: a dense [4096,4096]^2 bf16 XLA matmul = the chip's
practical dot ceiling under this tunnel's timing methodology.

Timing: bench._bench fori-loop differencing (one dispatch, fresh keys).
Run on the real TPU: python tools/attn_probe.py [n_iters]
"""

import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import bench
from frankenstein_tpu.ops.pallas import block_attention as ba

B, H, T, D = 128, 8, 6144, 32
BLOCK = 8          # tok_per_time at the flagship shape
NPACK, QB, CHUNK = 4, 512, 1024
PD = NPACK * D
SCALE = D ** -0.5
LOG2E = 1.4426950408889634


def _variant_kernel(i_ref, c_ref, first_ref, last_ref, q_ref, k_ref, v_ref,
                    o_ref, lse_ref, *scr, variant: str):
    s_scr, acc_scr = scr[0], scr[1]
    m_scrs, l_scrs = scr[2:2 + NPACK], scr[2 + NPACK:2 + 2 * NPACK]
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]

    @pl.when(first_ref[p] == 1)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        for h in range(NPACK):
            m_scrs[h][...] = jnp.full_like(m_scrs[h], -jnp.inf)
            l_scrs[h][...] = jnp.zeros_like(l_scrs[h])

    q = q_ref[0]
    kc = k_ref[0]
    vc = v_ref[0]
    if variant == "no_kbd":
        kbd = jnp.tile(kc, (NPACK, 1))          # timing-only: mixes heads
    else:
        sub = jax.lax.broadcasted_iota(jnp.int32, (NPACK * CHUNK, PD), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (NPACK * CHUNK, PD), 1)
        kbd = jnp.where((sub // CHUNK) == (lane2 // D),
                        jnp.tile(kc, (NPACK, 1)), 0).astype(kc.dtype)
    scale = SCALE * (LOG2E if variant == "exp2" else 1.0)
    s_scr[...] = jax.lax.dot_general(
        q, kbd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    if variant == "dots_only":
        # raw accumulate: prices the dot+DMA schedule with zero softmax
        for h in range(NPACK):
            sh = s_scr[:, h * CHUNK:(h + 1) * CHUNK]
            vbd_h = vc  # no staging either
            acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
                sh.astype(vc.dtype), vbd_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(last_ref[p] == 1)
        def _fin0():
            o_ref[0] = acc_scr[...].astype(o_ref.dtype)
            lse_ref[0] = jnp.zeros_like(lse_ref[0])
        return

    if variant == "mask_last":
        # the slab staircase of q-rows [i*QB, (i+1)*QB) lives entirely in
        # the final chunk (QB <= CHUNK, CHUNK % QB == 0) — earlier chunks
        # are fully allowed, so only the last pair needs the mask
        @pl.when(last_ref[p] == 1)
        def _apply_mask():
            allowed = ba._slab_mask(i, c, (QB, CHUNK), block=BLOCK, qb=QB,
                                    chunk=CHUNK)
            for h in range(NPACK):
                sh = s_scr[:, h * CHUNK:(h + 1) * CHUNK]
                s_scr[:, h * CHUNK:(h + 1) * CHUNK] = jnp.where(
                    allowed, sh, ba.NEG_INF)
    elif variant != "no_mask":
        allowed = ba._slab_mask(i, c, (QB, CHUNK), block=BLOCK, qb=QB,
                                chunk=CHUNK)

    exp = jnp.exp2 if variant == "exp2" else jnp.exp
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PD), 1) // D
    for h in range(NPACK):
        sh = s_scr[:, h * CHUNK:(h + 1) * CHUNK]
        if variant not in ("no_mask", "mask_last"):
            sh = jnp.where(allowed, sh, ba.NEG_INF)
        m_prev = m_scrs[h][...]
        m_new = jnp.maximum(m_prev, jnp.max(sh, axis=-1, keepdims=True))
        pexp_h = exp(sh - m_new)
        alpha_h = exp(m_prev - m_new)
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
        l_band = jnp.zeros((QB, PD), jnp.float32)
        for h in range(NPACK):
            l_band = l_band + jnp.where(lane == h, l_scrs[h][...], 0.0)
        o_ref[0] = (acc_scr[...] / l_band).astype(o_ref.dtype)
        for h in range(NPACK):
            lse_ref[0, h, pl.ds(i * QB, QB)] = (
                m_scrs[h][...] + jnp.log(l_scrs[h][...]))[:, 0]


def _variant_call(q4, k4, v4, variant: str):
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    nb, t, pd = q4.shape
    pr = ba._triangle_pairs(t, BLOCK, QB, CHUNK, True)
    pairs = (pr[0], pr[1], (pr[1] == 0).astype(pr[1].dtype), pr[2])
    i_arr, c_arr, first_arr, last_arr = pairs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb, len(i_arr)),
        in_specs=[
            pl.BlockSpec((1, QB, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, CHUNK, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, c_r[p], 0)),
            pl.BlockSpec((1, CHUNK, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, c_r[p], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, QB, pd),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, i_r[p], 0)),
            pl.BlockSpec((1, NPACK, t),
                         lambda b, p, i_r, c_r, f_r, l_r: (b, 0, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((QB, NPACK * CHUNK), jnp.float32),
             pltpu.VMEM((QB, pd), jnp.float32)]
            + [pltpu.VMEM((QB, 1), jnp.float32) for _ in range(2 * NPACK)]),
    )
    return pl.pallas_call(
        functools.partial(_variant_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, t, pd), q4.dtype),
            jax.ShapeDtypeStruct((nb, NPACK, t), jnp.float32),
        ],
        )(np.asarray(i_arr), np.asarray(c_arr), np.asarray(first_arr),
          np.asarray(last_arr), q4, k4, v4)


def main(n_iters: int = 6):
    nb = B * H // NPACK
    bench._PARAMS[0] = {}

    def layer_fn(variant):
        def fn(params, key):
            ks = jax.random.split(key, 3)
            q4 = jax.random.normal(ks[0], (nb, T, PD), jnp.bfloat16)
            k4 = jax.random.normal(ks[1], (nb, T, PD), jnp.bfloat16)
            v4 = jax.random.normal(ks[2], (nb, T, PD), jnp.bfloat16)
            out, _ = _variant_call(q4, k4, v4, variant)
            return out[:, -1]
        fn.__name__ = variant
        return fn

    def xla_dot(params, key):
        ks = jax.random.split(key, 2)
        a = jax.random.normal(ks[0], (4096, 4096), jnp.bfloat16)
        b = jax.random.normal(ks[1], (4096, 4096), jnp.bfloat16)
        return jnp.dot(a, b)[:1]

    results = {}
    t = bench._bench(xla_dot, max(n_iters * 8, 16))
    results["xla_dot_ms"] = round(t * 1e3, 3)
    results["xla_dot_tops"] = round(2 * 4096**3 / t / 1e12, 1)
    print(json.dumps({"xla_dot": results["xla_dot_tops"]}), file=sys.stderr,
          flush=True)

    # hw MACs of the schedule: every pair does QK [QB,PD]x[PD,NPACK*CHUNK]
    # + NPACK PV dots [QB,CHUNK]x[CHUNK,PD]
    n_pairs = len(ba._triangle_pairs(T, BLOCK, QB, CHUNK, True)[0])
    hw_flops = 2 * nb * n_pairs * (QB * PD * NPACK * CHUNK
                                   + NPACK * QB * CHUNK * PD)
    for variant in ("kernel", "dots_only", "no_kbd", "no_mask", "mask_last",
                    "exp2"):
        t = bench._bench(layer_fn(variant), n_iters)
        results[f"{variant}_ms"] = round(t * 1e3, 2)
        results[f"{variant}_hw_tops"] = round(hw_flops / t / 1e12, 1)
        print(json.dumps({variant: results[f"{variant}_ms"]}),
              file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
