"""FrankyLlama serving benchmark on the real TPU: encode + cached decode
(greedy / beams) for the north-star composite, plus the cost of LLaMA
n-best rescoring at serving batch — the full
`brain -> beams -> rescore` chain (reference:README.md:19, unimplemented
there) priced end-to-end.

Methodology is bench.py's (fori_loop differencing, on-device inputs,
value-fetch sync). The decode path is whatever the model routes — since
round 4 that is the fused all-layer LLaMA kernel
(ops/pallas/fused_llama_decode.py, default ON; FK_LLAMA_FUSED=0 reverts
to the scanned XLA path for a control run).

Run on the real TPU: python tools/franky_llama_bench.py [batch] [beam_width]
[w8] — w8 (default 1) streams int8 block weights with per-out-lane scales
through the decode scans (measured 1.19-1.24x on the LLaMA kernel at b=32,
tools/llama_decode_probe.py 2026-08-20); w8=0 reverts to bf16 weights.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 32, beam: int = 5, max_new: int = 25, w8: int = 1):
    import jax
    import jax.numpy as jnp

    import bench
    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    from frankenstein_tpu.models import llama
    from frankenstein_tpu.models.franky import FrankyLlama, FrankyLlamaConfig

    cfg = FrankyLlamaConfig()           # flagship brain + ~110M LLaMA
    model = FrankyLlama(cfg, dtype=jnp.bfloat16)
    shape = (batch, cfg.brain.encoder.window_size,
             cfg.brain.encoder.n_electrodes)

    x1 = jnp.zeros((1,) + shape[1:], jnp.float32)
    y1 = jnp.zeros((1, cfg.max_tokens), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params
    idx0 = jnp.full((batch, 1), GPT2_EOT, jnp.int32)
    pdim = cfg.lm.dim
    ptok = cfg.brain.n_output_tokens

    def encode_fn(params, key):
        x = jax.random.normal(key, shape, jnp.float32)
        return model.apply(params, x, method=type(model).encode)

    def greedy_fn(params, key):
        prefix = jax.random.normal(key, (batch, ptok, pdim), jnp.float32)
        return sampling.generate(model, params, idx0, prefix, key,
                                 max_new_tokens=max_new, top_k=10,
                                 int8_weights=bool(w8))

    def beams_fn(params, key):
        prefix = jax.random.normal(key, (batch, ptok, pdim), jnp.float32)
        toks, _ = sampling.beam_search(model, params, idx0, prefix,
                                       max_new_tokens=max_new,
                                       beam_width=beam, eos_id=GPT2_EOT,
                                       length_penalty=1.0,
                                       int8_weights=bool(w8))
        return toks.astype(jnp.float32)

    def rescore_fn(params, key):
        # n-best rescoring cost at serving batch: one sequence_logprob
        # forward over batch*beam candidate rows (the chain's added stage)
        cands = jax.random.randint(key, (batch * beam, max_new), 0,
                                   cfg.lm.vocab_size)
        lp = model.apply(params, cands, None,
                         method=type(model).sequence_logprob)
        return lp

    encode_s = bench._bench(encode_fn, 8)
    greedy_s = bench._bench(greedy_fn, 8)
    beams_s = bench._bench(beams_fn, 6)
    rescore_s = bench._bench(rescore_fn, 6)

    print(json.dumps({
        "model": "franky-llama (~110M LM, flagship brain)",
        "w8a16": bool(w8),
        "batch": batch,
        "beam_width": beam,
        "encode_ms_per_batch": round(encode_s * 1000, 1),
        "greedy_decode_ms_per_batch": round(greedy_s * 1000, 1),
        "beam_decode_ms_per_batch": round(beams_s * 1000, 1),
        "rescore_ms_per_batch": round(rescore_s * 1000, 1),
        "greedy_sentences_per_sec_per_chip": round(
            batch / (encode_s + greedy_s), 1),
        "rescored_beams_sentences_per_sec_per_chip": round(
            batch / (encode_s + beams_s + rescore_s), 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5,
         w8=int(sys.argv[3]) if len(sys.argv) > 3 else 1)
