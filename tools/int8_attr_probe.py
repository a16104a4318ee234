"""Where does the int8-QK production kernel's time go? (round 4)

qk_int8 at the flagship shape measured 482.5 vs 436.1 ms encode (0.904x) —
the bare-dot probes promised ~1.35x/layer, so something in the in-kernel
quantize/dequant chain costs more than the MXU's 2x int8 rate saves. This
probe prices each int8-specific component with VARIANT kernels on the same
triangle-pair schedule (rope omitted — it is identical work in both
production variants, so deltas here attribute the int8 machinery):

  bf16              — reference softmax kernel (attn_probe 'kernel')
  int8_dots_only    — int8 QK dot + raw accumulate: does the int8 dot hit
                      ~2x IN SITU with int8 kbd staging? (values wrong)
  int8_full         — production int8: Q quant at init (per row,head), K
                      quant per pair (per-head scalar), int32 scores,
                      dequant epilogue (convert + 2 muls), softmax
  int8_cheap_dequant— int8 dot, epilogue = convert * static scale only
                      (no per-row/per-head scales; values wrong) — prices
                      the per-score scale multiplies
  int8_noquant      — int8 dot with cast-only conversion (no abs/max
                      reduces; values wrong) — prices the max-abs chains

Timing: bench._bench fori-loop differencing.
Run on the real TPU: timeout 1500 python tools/int8_attr_probe.py
"""

import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import bench
from frankenstein_tpu.ops.pallas import block_attention as ba

B, H, T, D = 128, 8, 6144, 32
BLOCK = 256        # tok_per_time (electrodes per time slab) at the flagship
NPACK, QB, CHUNK = 4, 512, 1024
PD = NPACK * D
SCALE = D ** -0.5


def _kernel(i_ref, c_ref, first_ref, last_ref, q_ref, k_ref, v_ref,
            o_ref, lse_ref, *scr, variant: str):
    int8 = variant.startswith("int8")
    s_scr, acc_scr, q_scr = scr[0], scr[1], scr[2]
    m_scrs, l_scrs = scr[3:3 + NPACK], scr[3 + NPACK:3 + 2 * NPACK]
    qs_scrs = scr[3 + 2 * NPACK:3 + 3 * NPACK]
    p = pl.program_id(1)
    i = i_ref[p]
    c = c_ref[p]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PD), 1) // D

    @pl.when(first_ref[p] == 1)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        qv = q_ref[0]
        if variant in ("int8_full", "int8_cheap_dequant"):
            qf = qv.astype(jnp.float32)
            sb = jnp.zeros((QB, PD), jnp.float32)
            for h in range(NPACK):
                sh = (jnp.max(jnp.abs(qf[:, h * D:(h + 1) * D]), axis=-1,
                              keepdims=True) / 127.0 + 1e-12)
                qs_scrs[h][...] = sh
                sb = sb + jnp.where(lane == h, sh, 0.0)
            q_scr[...] = jnp.round(qf / sb).astype(jnp.int8)
        elif int8:
            # cast-only: no reduces (values wrong, timing only)
            q_scr[...] = jnp.round(qv.astype(jnp.float32) * 8.0
                                   ).astype(jnp.int8)
            for h in range(NPACK):
                qs_scrs[h][...] = jnp.full_like(qs_scrs[h], 0.125)
        else:
            q_scr[...] = qv.astype(q_scr.dtype)
        for h in range(NPACK):
            m_scrs[h][...] = jnp.full_like(m_scrs[h], -jnp.inf)
            l_scrs[h][...] = jnp.zeros_like(l_scrs[h])

    q = q_scr[...]
    kc = k_ref[0]
    vc = v_ref[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (NPACK * CHUNK, PD), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (NPACK * CHUNK, PD), 1)
    keep = (sub // CHUNK) == (lane2 // D)
    if int8:
        kf = kc.astype(jnp.float32)
        if variant in ("int8_full", "int8_cheap_dequant"):
            sk, sb_k = [], jnp.zeros((1, PD), jnp.float32)
            for h in range(NPACK):
                skh = jnp.max(jnp.abs(kf[:, h * D:(h + 1) * D])) / 127.0 + 1e-12
                sk.append(skh)
                sb_k = sb_k + jnp.where(lane == h, skh, 0.0)
            ki = jnp.round(kf / sb_k).astype(jnp.int8)
        else:
            sk = [jnp.float32(0.125)] * NPACK
            ki = jnp.round(kf * 8.0).astype(jnp.int8)
        kbd = jnp.where(keep, jnp.tile(ki, (NPACK, 1)),
                        jnp.zeros((), jnp.int8)).astype(jnp.int8)
        s_scr[...] = jax.lax.dot_general(
            q, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        kbd = jnp.where(keep, jnp.tile(kc, (NPACK, 1)), 0).astype(vc.dtype)
        s_scr[...] = jax.lax.dot_general(
            q, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE

    if variant == "int8_dots_only":
        for h in range(NPACK):
            sh = s_scr[:, h * CHUNK:(h + 1) * CHUNK].astype(jnp.bfloat16)
            acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
                sh, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(last_ref[p] == 1)
        def _fin0():
            o_ref[0] = acc_scr[...].astype(o_ref.dtype)
            lse_ref[0] = jnp.zeros_like(lse_ref[0])
        return

    allowed = ba._slab_mask(i, c, (QB, CHUNK), block=BLOCK, qb=QB,
                            chunk=CHUNK)
    for h in range(NPACK):
        if variant == "int8_full":
            sh_f = (s_scr[:, h * CHUNK:(h + 1) * CHUNK].astype(jnp.float32)
                    * (SCALE * sk[h])) * qs_scrs[h][...]
            sh = jnp.where(allowed, sh_f, ba.NEG_INF)
        elif int8:
            sh_f = (s_scr[:, h * CHUNK:(h + 1) * CHUNK].astype(jnp.float32)
                    * SCALE)
            sh = jnp.where(allowed, sh_f, ba.NEG_INF)
        else:
            sh = jnp.where(allowed, s_scr[:, h * CHUNK:(h + 1) * CHUNK],
                           ba.NEG_INF)
        m_prev = m_scrs[h][...]
        m_new = jnp.maximum(m_prev, jnp.max(sh, axis=-1, keepdims=True))
        pexp_h = jnp.exp(sh - m_new)
        alpha_h = jnp.exp(m_prev - m_new)
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
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (QB, PD), 1) // D
        l_band = jnp.zeros((QB, PD), jnp.float32)
        for h in range(NPACK):
            l_band = l_band + jnp.where(lane_f == h, l_scrs[h][...], 0.0)
        o_ref[0] = (acc_scr[...] / l_band).astype(o_ref.dtype)
        for h in range(NPACK):
            lse_ref[0, h, pl.ds(i * QB, QB)] = (
                m_scrs[h][...] + jnp.log(l_scrs[h][...]))[:, 0]


def _call(q4, k4, v4, variant: str):
    from jax.experimental.pallas import tpu as pltpu

    int8 = variant.startswith("int8")
    nb, t, pd = q4.shape
    pr = ba._triangle_pairs(t, BLOCK, QB, CHUNK, True)
    i_arr, c_arr, last_arr = pr
    first_arr = (c_arr == 0).astype(c_arr.dtype)
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
            [pltpu.VMEM((QB, NPACK * CHUNK),
                        jnp.int32 if int8 else jnp.float32),
             pltpu.VMEM((QB, pd), jnp.float32),
             pltpu.VMEM((QB, pd), jnp.int8 if int8 else q4.dtype)]
            + [pltpu.VMEM((QB, 1), jnp.float32) for _ in range(3 * NPACK)]),
    )
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, t, pd), q4.dtype),
            jax.ShapeDtypeStruct((nb, NPACK, t), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=ba.ROPE_FUSED_VMEM),
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
            out, _ = _call(q4, k4, v4, variant)
            return out[:, -1]
        fn.__name__ = variant
        return fn

    results = {}
    for variant in ("bf16", "int8_dots_only", "int8_full",
                    "int8_cheap_dequant", "int8_noquant"):
        t = bench._bench(layer_fn(variant), n_iters)
        results[f"{variant}_ms"] = round(t * 1e3, 2)
        print(json.dumps({variant: results[f"{variant}_ms"]}),
              file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
