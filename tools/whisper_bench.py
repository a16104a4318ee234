"""Whisper decode throughput on the real TPU (VERDICT r3 weak #3).

Times the TPU-native whisper serving path — conv+encoder+prefill as one
dispatch, the jitted ``greedy_decode_scan`` (decode/sampling.py) as the
second — at whisper-tiny geometry (the reference fine-tunes whisper-tiny on
the 'fake mel' brain features, reference:whisper_hugging_face.ipynb cells
5-27; HF `generate` there runs a host loop per token, which on this
harness's tunnel would cost ~33 ms/token of dispatch alone).

Methodology is bench.py's: n-trip vs 1-trip fori_loop differencing, fresh
fold_in keys per iteration, value-fetch sync. Decode cost is reported as
(prefill+decode) - (prefill-only) so both programs stay under the remote
compile limit.

Run on the real TPU: python tools/whisper_bench.py [batch]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 32, max_new: int = 25, beam: int = 0,
         int8_kv: int = 0):
    import jax
    import jax.numpy as jnp

    import bench
    from frankenstein_tpu.config import WhisperConfig
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.decode.pipeline import cast_params_for_inference
    from frankenstein_tpu.models import whisper as whisper_lib

    cfg = WhisperConfig()                       # whisper-tiny geometry
    model = whisper_lib.BrainWhisper(cfg, dtype=jnp.bfloat16)
    prompt = model.sot_prompt()
    mel1 = jnp.zeros((1, cfg.n_mels, 2 * cfg.n_audio_ctx), jnp.float32)
    tok1 = jnp.asarray([prompt], jnp.int32)
    cache1 = whisper_lib.init_whisper_cache(cfg, 1,
                                            len(prompt) + max_new + 2)
    params = jax.jit(lambda: model.init(jax.random.key(0), tok1, mel1,
                                        cache1,
                                        method=type(model).prefill))()
    params = cast_params_for_inference(params)
    bench._PARAMS[0] = params

    tok0 = jnp.tile(jnp.asarray(prompt, jnp.int32)[None], (batch, 1))

    def prefill(params, key):
        mel = jax.random.normal(key, (batch, cfg.n_mels, 2 * cfg.n_audio_ctx),
                                jnp.float32)
        cache = whisper_lib.init_whisper_cache(
            cfg, batch, len(prompt) + max_new + 2)
        logits, cache, length = model.apply(params, tok0, mel, cache,
                                            method=type(model).prefill)
        return logits, cache, length

    def prefill_fn(params, key):
        logits, _, _ = prefill(params, key)
        return logits.astype(jnp.float32).sum(-1)

    def full_fn(params, key):
        logits, cache, length = prefill(params, key)
        if int8_kv:
            # int8 self-KV + int8 cross-KV (fixed per-(head, dim) scales,
            # models/whisper.py:quantize_whisper_cache) — halves the
            # dominant cache streams of the beam step
            cache = whisper_lib.quantize_whisper_cache(cache)
        if beam > 1:
            toks, _ = sampling.beam_from_prefill(
                model, params, logits, cache, length, max_new_tokens=max_new,
                beam_width=beam, eos_id=model.eot_id())
        else:
            toks = sampling.greedy_decode_scan(
                model, params, logits, cache, length, max_new_tokens=max_new)
        return toks.astype(jnp.float32)

    prefill_s = bench._bench(prefill_fn, 8)
    full_s = bench._bench(full_fn, 8)
    decode_s = max(full_s - prefill_s, 1e-9)
    print(json.dumps({
        "model": "whisper-tiny-geometry",
        "batch": batch,
        "beam_width": beam,
        "int8_kv": bool(int8_kv),
        "max_new_tokens": max_new,
        "prefill_encode_ms_per_batch": round(prefill_s * 1000, 2),
        "decode_ms_per_batch": round(decode_s * 1000, 2),
        "decode_ms_per_token": round(decode_s * 1000 / max_new, 3),
        "sentences_per_sec_per_chip": round(batch / full_s, 1),
    }))


if __name__ == "__main__":
    # usage: whisper_bench.py [batch] [beam_width] [int8_kv]
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         beam=int(sys.argv[2]) if len(sys.argv) > 2 else 0,
         int8_kv=int(sys.argv[3]) if len(sys.argv) > 3 else 0)
