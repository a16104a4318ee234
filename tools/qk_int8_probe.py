"""int8-QK encoder measurement at the flagship shape (round 4, VERDICT #1).

Times the production 4-layer slab encoder (b=128, t=6144, e=256, h=8 —
the 94%-of-serving, measured dot-bound phase) with the QK score dot at
bf16 vs the MXU's 2x int8 rate (ops/pallas/block_attention.py qk_int8),
and records the output drift of the quantized path at the same shape.

Runs under FK_QK_INT8_STRICT so a silent bf16 fallback is a loud error,
not a fake "wash". Timing: bench._bench fori-loop differencing.

Run on the real TPU: timeout 1200 python tools/qk_int8_probe.py
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ["FK_QK_INT8_STRICT"] = "1"

import jax
import jax.numpy as jnp

import bench
import __graft_entry__ as g
from frankenstein_tpu.decode.pipeline import cast_params_for_inference


def encode_fn_for(model, shape):
    def encode_fn(params, key):
        x = jax.random.normal(key, shape, jnp.float32)
        return model.apply(params, x, method=type(model).encode)
    return encode_fn


def main(batch: int = 128, n_iters: int = 8):
    model_bf, cfg = g._flagship(qk_int8=False)
    model_i8, _ = g._flagship(qk_int8=True)
    shape = (batch, cfg.brain.encoder.window_size,
             cfg.brain.encoder.n_electrodes)

    x1 = jnp.zeros((1,) + shape[1:], jnp.float32)
    y1 = jnp.zeros((1, cfg.max_tokens), jnp.int32)
    params = jax.jit(lambda: model_bf.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params

    # ---- parity drift at the production geometry (same params, same x) ----
    xs = jax.random.normal(jax.random.key(7), (8,) + shape[1:], jnp.float32)
    enc = lambda m: jax.jit(
        lambda p, x: m.apply(p, x, method=type(m).encode))(params, xs)
    e_bf = enc(model_bf).astype(jnp.float32)
    e_i8 = enc(model_i8).astype(jnp.float32)
    drift = float(jnp.max(jnp.abs(e_i8 - e_bf)))
    ref_absmax = float(jnp.max(jnp.abs(e_bf)))
    ref_rms = float(jnp.sqrt(jnp.mean(e_bf ** 2)))
    print(f"[probe] drift max={drift:.4g} vs ref absmax={ref_absmax:.4g} "
          f"rms={ref_rms:.4g}", file=sys.stderr, flush=True)

    # ---- timing ----
    t_bf = bench._bench(encode_fn_for(model_bf, shape), n_iters)
    t_i8 = bench._bench(encode_fn_for(model_i8, shape), n_iters, key0=300)

    result = {
        "metric": "encode_ms_per_batch",
        "batch": batch,
        "bf16_ms": round(t_bf * 1000, 1),
        "qk_int8_ms": round(t_i8 * 1000, 1),
        "speedup": round(t_bf / t_i8, 3),
        "drift_max": drift,
        "drift_rel_absmax": drift / (ref_absmax + 1e-12),
        "ref_rms": ref_rms,
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main(n_iters=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
