"""At-scale LLaMA validation (VERDICT r4 #5): run a ~1B-class geometry
(dim 2048 / 16 layers / GQA 32q-8kv / hidden 5632 — the llama-3 family
shape scaled down one notch) through prefill + decode on the real TPU,
random-init, and record:

- whether the fused kernel's VMEM gate (fused_llama_decode.supported)
  accepts the geometry or falls back to the scanned XLA path, in bf16 and
  w8a16 (the gate math, printed, is the artifact — a silent Mosaic OOM
  would mean the gate lied);
- measured ms/token (scanned or fused, whichever the gate routes) and the
  step's HBM-floor context: the weight stream is ~1.45 GB/step bf16, so
  ms/token vs (bytes / chip bandwidth) says how far XLA's scanned path is
  from speed-of-light at a scale the fused kernel cannot hold one layer
  of;
- the HBM-fit table: params + KV cache + beams at serving widths.

Run on the real TPU: python tools/llama_scale_probe.py [batch] [steps]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 8, prompt: int = 8, max_new: int = 24):
    import jax
    import jax.numpy as jnp

    import bench
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    from frankenstein_tpu.models import llama
    from frankenstein_tpu.ops.pallas import fused_llama_decode as fld
    from frankenstein_tpu.utils import profiling

    # geometry overridable via env (FK_PROBE_DIM/LAYERS/HEADS/KV/FF) — the
    # default is the ~0.82B BASELINE.md shape; FK_PROBE_DIM=2560
    # FK_PROBE_LAYERS=24 FK_PROBE_HEADS=20 FK_PROBE_KV=4 FK_PROBE_FF=6912
    # is a ~1.8B shape that still fits f32-init + bf16-cast on one 16 GB
    # chip (the probe inits on device; param_dtype is f32)
    import os as _os
    geo = lambda k, d: int(_os.environ.get(f"FK_PROBE_{k}", d))
    cfg = llama.LlamaConfig(vocab_size=50304, dim=geo("DIM", 2048),
                            n_layers=geo("LAYERS", 16),
                            n_heads=geo("HEADS", 32),
                            n_kv_heads=geo("KV", 8),
                            hidden_dim=geo("FF", 5632),
                            rope_theta=500000.0, max_seq_len=256,
                            tie_embeddings=True)
    model = llama.Llama(cfg, dtype=jnp.bfloat16)
    idx1 = jnp.zeros((1, prompt), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), idx1))()
    params = cast_params_for_inference(params)
    # persistent w8a16 weights (the serving-loop convention,
    # sampling.quantize_serving_weights): quantized ONCE here so the timed
    # loop measures the steady-state step, not the per-request requantize
    qw = sampling.quantize_serving_weights(model, params)
    bench._PARAMS[0] = (params, qw)

    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    s = sampling._round_cache_len(prompt + max_new + 1)
    e_kv = cfg.n_kv_heads * cfg.head_dim

    # gate verdicts (the honest artifact: accept or documented fallback).
    # At this scale one layer's weights (~90 MB bf16) exceed the
    # grid/pipelined kernels' double-buffered VMEM budget — acceptance
    # comes from the big-model chunked-MLP kernel (n_layers engages it).
    gates = {}
    for label, (item, witem, citem) in {
            "bf16": (2, 2, 2), "w8a16": (2, 1, 2),
            "bf16+int8kv": (2, 2, 1)}.items():
        ok = fld.supported(cfg.n_heads, cfg.head_dim, cfg.n_kv_heads,
                           cfg.hidden_dim, batch, s, itemsize=item,
                           cache_itemsize=citem, w_itemsize=witem,
                           n_layers=cfg.n_layers)
        gates[label] = bool(ok)

    # measured decode: generate() routes through decode_step, which
    # consults the gate per step — fused when accepted, scanned otherwise
    # (FK_LLAMA_FUSED=0 forces the scanned control run)
    import os
    forced_off = os.environ.get("FK_LLAMA_FUSED", "1") == "0"
    routed = {lbl: ("scanned (forced)" if forced_off
                    else ("fused-bigmodel" if ok else "scanned"))
              for lbl, ok in gates.items()}
    idx0 = jnp.zeros((batch, prompt), jnp.int32)

    def greedy_fn(pq, key):
        params, _ = pq
        toks = jax.random.randint(key, (batch, prompt), 0, cfg.vocab_size)
        return sampling.generate(model, params, toks, None, key,
                                 max_new_tokens=max_new, greedy=True)

    def greedy_w8_fn(pq, key):
        # per-call quantization variant (int8_weights=True alone): the
        # requantize of the full weight tree rides INSIDE the timed loop
        params, _ = pq
        toks = jax.random.randint(key, (batch, prompt), 0, cfg.vocab_size)
        return sampling.generate(model, params, toks, None, key,
                                 max_new_tokens=max_new, greedy=True,
                                 int8_weights=True)

    def greedy_w8p_fn(pq, key):
        params, qweights = pq
        toks = jax.random.randint(key, (batch, prompt), 0, cfg.vocab_size)
        return sampling.generate(model, params, toks, None, key,
                                 max_new_tokens=max_new, greedy=True,
                                 qweights=qweights)

    # print each measurement as it lands: a kernel fault in one variant
    # (the way the round-5 odd-hc deadlock surfaced) must not lose the
    # variants already measured
    greedy_s = bench._bench(greedy_fn, 4)
    print(json.dumps({"partial": "greedy_s", "value": round(greedy_s, 4)}),
          flush=True)
    w8_on = (gates["w8a16"]
             and os.environ.get("FK_LLAMA_FUSED", "1") == "1")
    w8_s = bench._bench(greedy_w8_fn, 4) if w8_on else None
    if w8_s is not None:
        print(json.dumps({"partial": "w8_s", "value": round(w8_s, 4)}),
              flush=True)
    w8p_s = bench._bench(greedy_w8p_fn, 4) if w8_on else None
    if w8p_s is not None:
        print(json.dumps({"partial": "w8p_s", "value": round(w8p_s, 4)}),
              flush=True)

    def prefill_fn(pq, key):
        params, _ = pq
        toks = jax.random.randint(key, (batch, prompt), 0, cfg.vocab_size)
        logits, _, _ = sampling._prefill_args(model, params, toks, None, s)
        return logits.sum(-1)

    prefill_s = bench._bench(prefill_fn, 4)
    per_token_ms = (greedy_s - prefill_s) * 1000 / max_new
    w8_per_token_ms = (None if w8_s is None
                       else (w8_s - prefill_s) * 1000 / max_new)
    w8p_per_token_ms = (None if w8p_s is None
                        else (w8p_s - prefill_s) * 1000 / max_new)

    # HBM floor context: the decode step streams all weights + the live
    # cache rows once
    weight_bytes = 2 * n_params
    cache_bytes = 2 * cfg.n_layers * batch * s * e_kv * 2
    bw = profiling.detect_hbm_bw()
    floor_ms = (weight_bytes + cache_bytes) / bw * 1000
    fit = {
        "params_gb_bf16": round(2 * n_params / 2**30, 2),
        "kv_cache_mb_bf16": round(cache_bytes / 2**20, 1),
        "kv_cache_mb_at_b128_w5": round(
            2 * cfg.n_layers * 128 * 5 * s * e_kv * 2 / 2**20, 1),
        "hbm_gb": 16,
    }

    print(json.dumps({
        "model": f"llama ~{n_params/1e9:.2f}B (dim {cfg.dim}, L{cfg.n_layers}, "
                 f"GQA {cfg.n_heads}q/{cfg.n_kv_heads}kv, ff {cfg.hidden_dim})",
        "batch": batch, "cache_len": s,
        "fused_gate": gates,
        "routed": routed,
        "prefill_ms_per_batch": round(prefill_s * 1000, 1),
        "decode_ms_per_token": round(per_token_ms, 3),
        "w8a16_decode_ms_per_token": (None if w8_per_token_ms is None
                                      else round(w8_per_token_ms, 3)),
        "w8a16_persistent_decode_ms_per_token": (
            None if w8p_per_token_ms is None else round(w8p_per_token_ms, 3)),
        "hbm_floor_ms_per_token": round(floor_ms, 3),
        "w8a16_floor_ms_per_token": round(
            (weight_bytes / 2 + cache_bytes) / bw * 1000, 3),
        "hbm_util": round(floor_ms / max(per_token_ms, 1e-9), 3),
        "hbm_fit": fit,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         max_new=int(sys.argv[2]) if len(sys.argv) > 2 else 24)
