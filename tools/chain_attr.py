"""Decode-step chain attribution (VERDICT r2 item 2).

The fused all-layer kernel runs at ~0.46 ms/token but the full decode loop
measures ~1.7 ms/token at b=128 — this experiment isolates where the other
~1.2 ms goes by timing progressively larger slices of the per-token chain,
each as a 25-step lax.scan inside ONE dispatched fori_loop (bench._bench's
n-trip/1-trip differencing — the only honest timing under the axon tunnel).

Variants (cumulative):
  prefill      — _prefill_args alone (runs once per sentence, not per token)
  kernel       — the fused step (in-kernel aliased cache write included)
  +head        — + ln_f + tied lm_head ([B, 50304] f32 logits materialized)
  +sample      — + approx_max_k + categorical + embed (== the full step)
  generate     — production sampling.generate (prefill + 25-step scan)

Run on the real TPU: python tools/chain_attr.py [--int8-kv]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(int8_kv: bool = False):
    import jax
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as g
    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    from frankenstein_tpu.models import gpt2
    from frankenstein_tpu.ops.pallas import fused_decode

    model, cfg = g._flagship()
    b, max_new = 128, cfg.max_tokens
    c = cfg.gpt
    e = c.n_embd

    x1 = jnp.zeros((1, cfg.brain.encoder.window_size,
                    cfg.brain.encoder.n_electrodes), jnp.float32)
    y1 = jnp.zeros((1, max_new), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params
    idx0 = jnp.full((b, 1), GPT2_EOT, jnp.int32)
    max_len = sampling._round_cache_len(1 + 32 + max_new + 1)

    def stacked_of(p):
        return gpt2._stack_decode_weights(
            p["params"]["llm_model"]["h"], jnp.bfloat16)

    def fresh_cache(p, key):
        """Random bf16 cache + live length (mirrors the post-prefill state);
        built on device from the key so no dispatch is memoized."""
        kc = jax.random.normal(key, (c.n_layer, b, max_len, e), jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(key, 1),
                               (c.n_layer, b, max_len, e), jnp.bfloat16)
        if int8_kv:
            return gpt2.quantize_cache((kc, vc))
        return (kc, vc)

    def x0_of(key):
        return jax.random.normal(jax.random.fold_in(key, 2), (b, e),
                                 jnp.bfloat16)

    length0 = jnp.int32(33)

    # ---- variant bodies ------------------------------------------------------

    def prefill_fn(p, key):
        prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
        logits, cache, length = sampling._prefill_args(
            model, p, idx0, prefix, max_len)
        return logits

    def kernel_fn(p, key):
        """Fused step only (the kernel writes the cache rows in place —
        there is no separate XLA cache-update stage to attribute anymore)."""
        cache = fresh_cache(p, key)
        st = stacked_of(p)

        def step(carry, _):
            x, cache, length = carry
            xo, cache = gpt2._fused_blocks(
                c, None, x, cache, length, stacked=st)
            return (xo, cache, length + 1), ()

        (x, _, _), _ = jax.lax.scan(step, (x0_of(key), cache, length0),
                                    None, length=max_new)
        return x

    def head_fn(p, key):
        cache = fresh_cache(p, key)
        st = stacked_of(p)
        lm = p["params"]["llm_model"]
        lnf_w, lnf_b = lm["ln_f"]["weight"], lm["ln_f"]["bias"]
        w_t = jnp.transpose(lm["wte"].astype(jnp.bfloat16))

        def step(carry, _):
            x, cache, length = carry
            xo, cache = gpt2._fused_blocks(
                c, None, x, cache, length, stacked=st)
            h = ((xo.astype(jnp.float32)
                  - jnp.mean(xo.astype(jnp.float32), -1, keepdims=True))
                 * jax.lax.rsqrt(jnp.var(xo.astype(jnp.float32), -1,
                                         keepdims=True) + 1e-5)
                 * lnf_w + lnf_b)
            logits = jnp.einsum("bd,dv->bv", h.astype(jnp.bfloat16), w_t,
                                preferred_element_type=jnp.float32)
            # data dependence so the head can't be DCE'd; adds one compare
            eps = (logits[:, :1] > 1e30).astype(xo.dtype)
            return (xo + eps, cache, length + 1), ()

        (x, _, _), _ = jax.lax.scan(step, (x0_of(key), cache, length0),
                                    None, length=max_new)
        return x

    def sample_fn(p, key):
        """The full production per-token chain, seeded from a synthetic
        cache (no prefill): logits -> top-k sample -> embed -> decode_step."""
        cache = fresh_cache(p, key)
        logits0 = jax.random.normal(jax.random.fold_in(key, 3),
                                    (b, c.vocab_size), jnp.float32)
        return sampling._sample_scan(model, p, logits0, cache, length0, key,
                                     max_new_tokens=max_new, top_k=10,
                                     compact_topk=False)

    def generate_fn(p, key):
        prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
        return sampling.generate(model, p, idx0, prefix, key,
                                 max_new_tokens=max_new, top_k=10,
                                 int8_kv=int8_kv)

    results = {}
    results["prefill_ms"] = bench._bench(prefill_fn, 8) * 1000
    for name, fn in [("kernel", kernel_fn),
                     ("head", head_fn), ("sample", sample_fn),
                     ("generate", generate_fn)]:
        t = bench._bench(fn, 8, key0=200 + 30 * len(results))
        results[f"{name}_ms"] = t * 1000
        results[f"{name}_ms_per_tok"] = t * 1000 / max_new
        print(f"[attr] {name}: {t * 1000:.2f} ms/batch "
              f"({t * 1000 / max_new:.3f} ms/token)", file=sys.stderr,
              flush=True)
    results["int8_kv"] = int8_kv
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main(int8_kv="--int8-kv" in sys.argv[1:])
