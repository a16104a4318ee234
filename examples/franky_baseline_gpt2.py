#!/usr/bin/env python
"""Franky baseline: brain prefix -> GPT-2, end-to-end.

The script form of reference:notebooks_trainer/franky_baseline_gpt2.ipynb:
assemble BrainEncoder (window 768, patch 32 -> 6144 tokens, 32 output
vectors) + GPT-2 124M, optionally import HF GPT-2 weights, train with the
step-based loop, then decode + WER.

Usage:
  python examples/franky_baseline_gpt2.py --data /path/to/competitionData \
      [--hf-gpt2 /path/to/local/gpt2] [--steps 100000]
  python examples/franky_baseline_gpt2.py --data synthetic --steps 200
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--hf-gpt2", default=None,
                    help="local HF GPT-2 checkpoint dir (offline)")
    ap.add_argument("--reference-ckpt", default=None,
                    help="torch Franky checkpoint (.safetensors/.pt) from the "
                         "reference stack, e.g. step_5000_loss_3.1739."
                         "safetensors — imported via models/import_reference")
    ap.add_argument("--save-folder", default="logs")
    ap.add_argument("--eval-wer", action="store_true")
    args = ap.parse_args()

    from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                         PerceiverConfig, TrainConfig)
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.models.franky import Franky
    from frankenstein_tpu.train import trainer

    # reference cell 5: MAEConfig(window_size=768, patch_size=32),
    # n_output_tokens=32, output_dim = gpt n_embd
    hf_vocab = args.hf_gpt2 or args.reference_ckpt
    cfg = FrankyConfig(
        brain=PerceiverConfig(encoder=MAEConfig(window_size=768, patch_size=32),
                              n_output_tokens=32, output_dim=768),
        gpt=GPTConfig(vocab_size=50257 if hf_vocab else 50304))
    model = Franky(cfg, dtype=jnp.bfloat16)
    spec = trainer.TrainableSpec(module=model)

    tok = tokenizers.best_available_tokenizer()
    tok_fn = tokenizers.get_tokenizer(tok)
    if args.data == "synthetic":
        train_ds = datasets.BrainDataset.synthetic(512, 0, tok_fn)
        val_ds = datasets.BrainDataset.synthetic(64, 1, tok_fn)
    else:
        root = Path(args.data)
        train_ds = datasets.BrainDataset(root / "train", tok_fn)
        val_ds = datasets.BrainDataset(root / "test", tok_fn)

    tcfg = TrainConfig(exp_name="franky_unfreezed_gpt2",   # reference cell 11
                       batch_size=args.batch_size, eval_interval=500,
                       max_steps=args.steps)

    sample = next(iter(datasets.batch_iterator(train_ds, 8, shuffle=False,
                                               epochs=1)))
    state, _ = trainer.init_state(spec, tcfg, sample)
    if args.reference_ckpt:
        from frankenstein_tpu.models import import_reference as ir
        sd = ir.load_state_dict(args.reference_ckpt)
        imported = ir.franky_params(sd)
        # a checkpoint trained at a different geometry (e.g. nanoGPT's 50304
        # from-scratch vocab) would otherwise install silently and fail later
        # with an opaque apply error — compare tree shapes up front
        want = jax.tree_util.tree_map(lambda a: a.shape, state.params)
        got = jax.tree_util.tree_map(lambda a: a.shape, imported["params"])
        if want != got:
            diffs = [
                f"  {jax.tree_util.keystr(k)}: ckpt {gs} != model {ws}"
                for (k, ws), (_, gs) in zip(
                    jax.tree_util.tree_leaves_with_path(want),
                    jax.tree_util.tree_leaves_with_path(got)) if ws != gs]
            raise ValueError(
                f"reference checkpoint shapes do not match the configured "
                f"model (check --vocab-size / config geometry):\n"
                + "\n".join(diffs[:20]))
        state = state.replace(params=imported["params"])
        print(f"loaded reference Franky checkpoint: {args.reference_ckpt}")
    if args.hf_gpt2:
        from transformers import GPT2LMHeadModel
        from frankenstein_tpu.models.gpt2_import import params_from_hf_model
        hf = GPT2LMHeadModel.from_pretrained(args.hf_gpt2)
        gpt_params, _ = params_from_hf_model(hf)
        params = dict(state.params)
        params["llm_model"] = gpt_params["params"]
        state = state.replace(params=params)
        print("loaded HF GPT-2 weights")

    state = trainer.run_train_model(spec, (train_ds, val_ds), tcfg,
                                    project_name="frankenstein",
                                    save_folder=Path(args.save_folder))

    if args.eval_wer:
        from frankenstein_tpu.eval.evaluate import evaluate_franky_wer
        wer, preds = evaluate_franky_wer(model, {"params": state.params},
                                         val_ds, tok, beam_width=5)
        print(f"val WER: {wer:.4f}")


if __name__ == "__main__":
    main()
