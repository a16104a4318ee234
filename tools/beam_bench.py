"""Beam-search decode timing at the flagship shape (serving breadth row).

Times sampling.beam_search (EOS-frozen beams, HF length penalty 1.0) at
b=128 x beam_width=5 — 640 effective decode rows — with the same fori-loop
differencing methodology as bench.py. greedy generate at b=128 prints
alongside as the reference point.

Run on the real TPU: python tools/beam_bench.py [beam_width] [--int8-kv]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(beam_width: int = 5, int8_kv: bool = False):
    import jax
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as g
    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference

    model, cfg = g._flagship()
    b, max_new = 128, cfg.max_tokens

    x1 = jnp.zeros((1, cfg.brain.encoder.window_size,
                    cfg.brain.encoder.n_electrodes), jnp.float32)
    y1 = jnp.zeros((1, max_new), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params
    idx0 = jnp.full((b, 1), GPT2_EOT, jnp.int32)

    def beam_fn(params, key):
        prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
        toks, scores = sampling.beam_search(
            model, params, idx0, prefix, max_new_tokens=max_new,
            beam_width=beam_width, eos_id=GPT2_EOT, length_penalty=1.0,
            int8_kv=int8_kv)
        return scores

    def greedy_fn(params, key):
        prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
        return sampling.generate(model, params, idx0, prefix, key,
                                 max_new_tokens=max_new, greedy=True)

    beam_s = bench._bench(beam_fn, 6)
    greedy_s = bench._bench(greedy_fn, 6, key0=300)
    print(json.dumps({
        "beam_width": beam_width,
        "int8_kv": int8_kv,
        "beam_ms_per_batch": round(beam_s * 1000, 1),
        "beam_ms_per_sentence": round(beam_s * 1000 / b, 3),
        "greedy_ms_per_batch": round(greedy_s * 1000, 1),
        "beam_vs_greedy": round(beam_s / greedy_s, 2),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 5, int8_kv="--int8-kv" in sys.argv[1:])
