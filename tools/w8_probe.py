"""w8a16 decode measurement (VERDICT r2 item 4): one TPU run of
``generate(int8_weights=True)`` at the flagship shape vs the bf16-weight
path, same fori-loop methodology. Records keep/kill evidence for
BASELINE.md. Run: python tools/w8_probe.py [--int8-kv]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(int8_kv: bool = False):
    import jax
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as g
    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference

    model, cfg = g._flagship()
    b, max_new = 128, cfg.max_tokens
    x1 = jnp.zeros((1, 768, 256), jnp.float32)
    y1 = jnp.zeros((1, max_new), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params
    idx0 = jnp.full((b, 1), GPT2_EOT, jnp.int32)

    def gen(w8):
        def fn(p, key):
            prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
            return sampling.generate(model, p, idx0, prefix, key,
                                     max_new_tokens=max_new, top_k=10,
                                     int8_kv=int8_kv, int8_weights=w8)
        fn.__name__ = f"gen_w8={w8}"
        return fn

    t_bf16 = bench._bench(gen(False), 12, key0=500, repeats=3)
    t_w8 = bench._bench(gen(True), 12, key0=600, repeats=3)
    print(json.dumps({
        "decode_bf16w_ms": round(t_bf16 * 1000, 2),
        "decode_w8a16_ms": round(t_w8 * 1000, 2),
        "speedup": round(t_bf16 / t_w8, 3),
        "int8_kv": int8_kv, "batch": b,
    }))


if __name__ == "__main__":
    main(int8_kv="--int8-kv" in sys.argv[1:])
