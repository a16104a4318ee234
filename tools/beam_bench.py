"""Beam-search decode timing at the flagship shape (serving breadth row).

Times sampling.beam_search (EOS-frozen beams, HF length penalty 1.0) at
b=128 x beam_width=5 — 640 effective decode rows — with the same fori-loop
differencing methodology as bench.py. greedy generate at b=128 prints
alongside as the reference point.

--int8-w (w8a16) quantizes the block matmul weights once per call — the
beam step is bound by the 5x-batch cache streams plus the per-step weight
stream that int8 halves (VERDICT r3 #3). --parity runs ONE beam batch with
and without w8a16 on identical inputs and reports token agreement + score
drift instead of timing.

Run on the real TPU:
  python tools/beam_bench.py [beam_width] [--int8-kv] [--int8-w] [--parity]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _setup():
    import jax
    import jax.numpy as jnp

    import bench
    import __graft_entry__ as g
    from frankenstein_tpu.config import GPT2_EOT
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
    return model, params, idx0, b, max_new


def main(beam_width: int = 5, int8_kv: bool = False,
         int8_weights: bool = False):
    import jax
    import jax.numpy as jnp

    import bench
    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling

    model, params, idx0, b, max_new = _setup()

    def beam_fn(params, key):
        prefix = jax.random.normal(key, (b, 32, 768), jnp.float32)
        toks, scores = sampling.beam_search(
            model, params, idx0, prefix, max_new_tokens=max_new,
            beam_width=beam_width, eos_id=GPT2_EOT, length_penalty=1.0,
            int8_kv=int8_kv, int8_weights=int8_weights)
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
        "int8_weights": int8_weights,
        "beam_ms_per_batch": round(beam_s * 1000, 1),
        "beam_ms_per_sentence": round(beam_s * 1000 / b, 3),
        "greedy_ms_per_batch": round(greedy_s * 1000, 1),
        "beam_vs_greedy": round(beam_s / greedy_s, 2),
    }))


def parity(beam_width: int = 5, int8_kv: bool = False):
    """One identical beam batch with float vs w8a16 weights: token agreement
    and best-score drift (the serving-grade fidelity record for BASELINE.md)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling

    model, params, idx0, b, max_new = _setup()
    prefix = jax.random.normal(jax.random.key(11), (b, 32, 768), jnp.float32)
    run = lambda w8: sampling.beam_search(
        model, params, idx0, prefix, max_new_tokens=max_new,
        beam_width=beam_width, eos_id=GPT2_EOT, length_penalty=1.0,
        int8_kv=int8_kv, int8_weights=w8)
    toks_f, scores_f = run(False)
    toks_q, scores_q = run(True)
    toks_f, toks_q = np.asarray(toks_f), np.asarray(toks_q)
    sf, sq = np.asarray(scores_f, np.float64), np.asarray(scores_q, np.float64)
    print(json.dumps({
        "parity": "w8a16_beam",
        "beam_width": beam_width,
        "int8_kv": int8_kv,
        "token_agreement": round(float((toks_f == toks_q).mean()), 4),
        "rows_identical": round(float((toks_f == toks_q).all(1).mean()), 4),
        "score_drift_max": float(np.abs(sf - sq).max()),
        "score_scale": float(np.abs(sf).mean()),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    w = int(args[0]) if args else 5
    if "--parity" in sys.argv[1:]:
        parity(w, int8_kv="--int8-kv" in sys.argv[1:])
    else:
        main(w, int8_kv="--int8-kv" in sys.argv[1:],
             int8_weights="--int8-w" in sys.argv[1:])
