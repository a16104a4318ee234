"""Focused LLaMA decode pricing on the real TPU: grid vs manually-pipelined
fused kernel (FK_LLAMA_PIPE) x float vs w8a16 weights, at the ~110M
rescorer/FrankyLlama LM shape.

FK_LLAMA_PIPE is read at jit-TRACE time, so each config must run in its own
process: this script measures ONE config per invocation.

    FK_LLAMA_PIPE=0 python tools/llama_decode_probe.py 32 0   # grid, float
    FK_LLAMA_PIPE=1 python tools/llama_decode_probe.py 32 1   # pipelined, w8

Prints one JSON line with greedy generate ms/batch and ms/token (prefill
included — identical across configs, so per-config deltas isolate the
kernel scan).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 32, w8: int = 0, max_new: int = 25):
    import jax
    import jax.numpy as jnp

    import bench
    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    from frankenstein_tpu.models.franky import FrankyLlama, FrankyLlamaConfig

    cfg = FrankyLlamaConfig()           # flagship brain + ~110M LLaMA
    model = FrankyLlama(cfg, dtype=jnp.bfloat16)
    shape = (1, cfg.brain.encoder.window_size, cfg.brain.encoder.n_electrodes)
    x1 = jnp.zeros(shape, jnp.float32)
    y1 = jnp.zeros((1, cfg.max_tokens), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.key(0), x1, y1))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params
    idx0 = jnp.full((batch, 1), GPT2_EOT, jnp.int32)
    pdim, ptok = cfg.lm.dim, cfg.brain.n_output_tokens

    def greedy_fn(params, key):
        prefix = jax.random.normal(key, (batch, ptok, pdim), jnp.float32)
        return sampling.generate(model, params, idx0, prefix, key,
                                 max_new_tokens=max_new, top_k=10,
                                 int8_weights=bool(w8))

    greedy_s = bench._bench(greedy_fn, 8)
    print(json.dumps({
        "pipe": os.environ.get("FK_LLAMA_PIPE", "0"),
        "w8a16": bool(w8),
        "batch": batch,
        "greedy_ms_per_batch": round(greedy_s * 1000, 2),
        "ms_per_token": round(greedy_s * 1000 / max_new, 3),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
