#!/usr/bin/env python
"""North-star pipeline: Franky beams -> LLaMA n-best rescoring.

The reference's README names `VQVAE -> MAE -> Perceiver -> LLAMA 3` as the
target architecture but implements only the GPT-2 stage
(reference:README.md:19 — the LLaMA stage exists there as intent only).
This script closes the loop with the pieces this framework has: the
Franky decoder produces an n-best beam list per trial
(decode/sampling.py beam_search(n_best=True)) and the LLaMA rescorer
re-ranks it by interpolated LM log-probability
(models/llama.py:rescore_candidates), reporting WER for the beam-best vs
the rescored pick.

By default both models are tiny + synthetic (a runnable demonstration of
the wiring, not a claim about WER on random weights); point --hf-llama at
a local HF LLaMA checkpoint directory to rescore with real weights
(zero-egress: the path must be local). A brain prefix can be injected
into the LM through rescore_candidates(prefix=...) once a projector into
the LM's embedding space has been trained — the reference never got
there, so text-only rescoring is the faithful default.

Usage:
  python examples/llama_rescoring.py --steps 200 --beam-width 5 --alpha 0.5
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200,
                    help="Franky warmup steps on synthetic data (0 = skip)")
    ap.add_argument("--beam-width", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=0.5,
                    help="rescore weight: alpha*LM + (1-alpha)*decoder")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-new-tokens", type=int, default=12)
    ap.add_argument("--hf-llama", default=None,
                    help="local HF LLaMA checkpoint dir (else tiny random)")
    args = ap.parse_args()

    from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                         PerceiverConfig, TrainConfig)
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.decode import sampling
    from frankenstein_tpu.eval import wer as wer_lib
    from frankenstein_tpu.models import franky, llama
    from frankenstein_tpu.train import trainer

    tok = tokenizers.best_available_tokenizer()
    tok_fn = tokenizers.get_tokenizer(tok)
    eot = tok.eot_id
    vocab = getattr(tok, "vocab_size", 50257)   # GPT-2 id range

    # ---- a small Franky on synthetic data --------------------------------
    cfg = FrankyConfig(
        brain=PerceiverConfig(
            encoder=MAEConfig(window_size=256, n_electrodes=64,
                              patch_size=32, dim=128, n_layers=2,
                              hidden_dim=256, n_heads=4),
            n_output_tokens=8, output_dim=128, dim=128, n_heads=4,
            head_dim=32, hidden_dim=256),
        gpt=GPTConfig(block_size=64, vocab_size=vocab, n_layer=2,
                      n_head=4, n_embd=128))
    model = franky.Franky(cfg, dtype=jnp.bfloat16)
    spec = trainer.TrainableSpec(module=model)

    ds = datasets.BrainDataset.synthetic(
        n_trials=max(args.batch_size * 4, 64), seed=0,
        tokenize_function=tok_fn, n_electrodes=64, max_input_len=256)
    x_all, y_all, d_all = ds.as_arrays()
    batch = (x_all[:args.batch_size], y_all[:args.batch_size],
             d_all[:args.batch_size])
    tcfg = TrainConfig(batch_size=args.batch_size, learning_rate=3e-4,
                       warmup_iters=20, use_scheduler=False)
    state, _tx = trainer.init_state(spec, tcfg, batch)
    if args.steps:
        step = trainer.make_train_step(spec, _tx, tcfg)
        jb = jax.tree_util.tree_map(jnp.asarray, batch)
        for i in range(args.steps):
            state, loss, _ = step(state, jb, jax.random.key(i))
        print(f"franky warmup: {args.steps} steps, loss {float(loss):.3f}")
    params = {"params": state.params}

    # ---- n-best beams ------------------------------------------------------
    xs, labels, _dates = batch
    prefix = model.apply(params, jnp.asarray(xs),
                         method=type(model).encode)
    idx0 = jnp.full((args.batch_size, 1), eot, jnp.int32)
    cands, dec_scores = sampling.beam_search(
        model, params, idx0, prefix, max_new_tokens=args.max_new_tokens,
        beam_width=args.beam_width, eos_id=eot, length_penalty=1.0,
        n_best=True)

    # ---- LLaMA rescoring ----------------------------------------------------
    if args.hf_llama:
        from transformers import LlamaForCausalLM
        hf = LlamaForCausalLM.from_pretrained(args.hf_llama)
        lm_params, lm_cfg = llama.params_from_hf_llama(hf)
        lm = llama.Llama(lm_cfg, dtype=jnp.bfloat16)
    else:
        lm_cfg = llama.tiny_llama_config(vocab_size=vocab)
        lm = llama.Llama(lm_cfg, dtype=jnp.bfloat16)
        lm_params = lm.init(jax.random.key(7),
                            jnp.zeros((1, 4), jnp.int32))

    cand_ids = llama.candidates_from_beams(cands, eot)
    best_idx, combined = llama.rescore_candidates(
        lm, lm_params, cand_ids, decoder_scores=dec_scores,
        alpha=args.alpha)

    # ---- WER: beam-best vs rescored pick -----------------------------------
    refs = [tok.decode([t for t in row if t >= 0]) for row in labels]

    def decode_beam(b, w):
        # decode the raw beam tokens ([B, W, T] — not the rescorer's
        # seed-prepended cand_ids view), trimmed at the first EOT
        row = sampling.trim_at_eot(np.asarray(cands[b, w:w + 1]), eot)[0]
        return tok.decode([int(t) for t in row], skip_special_tokens=True)

    beam_best = [decode_beam(b, 0) for b in range(args.batch_size)]
    rescored = [decode_beam(b, int(best_idx[b]))
                for b in range(args.batch_size)]
    w_beam = wer_lib.corpus_wer(refs, beam_best)
    w_resc = wer_lib.corpus_wer(refs, rescored)
    kept = float(np.mean(np.asarray(best_idx) == 0))
    print(f"beam-best WER {w_beam:.4f} | rescored WER {w_resc:.4f} | "
          f"rescorer kept the beam-best on {kept:.0%} of trials")


if __name__ == "__main__":
    main()
