"""Deterministic copy detection: compile decode-scan variants for TPU and
count `copy` ops in the optimized HLO (the ~33 ms tunnel noise makes small
wall-clock diffs unattributable; HLO doesn't lie).

Round-3 findings recorded in BASELINE.md: the per-step cache
dynamic_update_slice was already in-place, but its [L, B, 1, E] row update
operands each cost a layout-retiling copy (~0.2 ms, HLO cost model) — which
is why the fused kernel now writes the rows itself into aliased cache
outputs. Variants: the fused decode step scan and production generate,
x {bf16, int8} caches. Run: python tools/hlo_copies.py
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.models import gpt2
    from frankenstein_tpu.ops.pallas import fused_decode

    model, cfg = g._flagship()
    c = cfg.gpt
    b, e, max_new = 128, c.n_embd, 25
    max_len = 64
    length0 = jnp.int32(33)

    x1 = jnp.zeros((1, 768, 256), jnp.float32)
    y1 = jnp.zeros((1, 25), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    params = cast_params_for_inference(params)
    st = gpt2._stack_decode_weights(
        params["params"]["llm_model"]["h"], jnp.bfloat16)

    def cache_of(key, int8):
        kc = jax.random.normal(key, (c.n_layer, b, max_len, e), jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(key, 1), kc.shape,
                               jnp.bfloat16)
        return gpt2.quantize_cache((kc, vc)) if int8 else (kc, vc)

    def body_after(x, cache, length):
        xo, cache = gpt2._fused_blocks(c, None, x, cache, length, stacked=st)
        return xo, cache

    def make_fn(variant, int8):
        def fn(key):
            cache = cache_of(key, int8)
            x0 = jax.random.normal(jax.random.fold_in(key, 2), (b, e),
                                   jnp.bfloat16)
            if variant == "after":
                def step(carry, _):
                    x, cache, length = carry
                    x, cache = body_after(x, cache, length)
                    return (x, cache, length + 1), ()

                (x, _, _), _ = jax.lax.scan(step, (x0, cache, length0),
                                            None, length=max_new)
            return jnp.sum(x.astype(jnp.float32))
        return fn

    # also the REAL production program
    idx0 = jnp.full((b, 1), 50256, jnp.int32)

    def gen_fn(int8):
        def fn(key):
            prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
            return sampling.generate(model, params, idx0, prefix, key,
                                     max_new_tokens=max_new, top_k=10,
                                     int8_kv=int8)
        return fn

    big = re.compile(
        r"copy[-.\w]*\.?\d* = (bf16|s8|f32)\[(12,128,64,768|12,128,768|"
        r"128,50304)\]")
    for name, fn in [
        ("after_bf16", make_fn("after", False)),
        ("after_int8", make_fn("after", True)),
        ("generate_bf16", gen_fn(False)),
        ("generate_int8", gen_fn(True)),
    ]:
        txt = jax.jit(fn).lower(jax.random.key(0)).compile().as_text()
        # count copy/fusion ops touching cache-sized arrays inside while loops
        cache_copies = len(re.findall(
            r"= (?:bf16|s8)\[12,128,64,768\][^\n]*copy", txt))
        all_copies = len(re.findall(r"copy\(", txt))
        dus_inplace = len(re.findall(r"dynamic-update-slice", txt))
        print(f"{name}: cache_sized_copies={cache_copies} "
              f"total_copies={all_copies} dus_ops={dus_inplace}",
              flush=True)
        Path(f"/tmp/hlo_{name}.txt").write_text(txt)


if __name__ == "__main__":
    main()
