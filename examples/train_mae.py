#!/usr/bin/env python
"""MAE pretraining (script form of reference:notebooks_trainer/train_mae.ipynb:
``MAEConfig(window_size=1024)``, BrainDataset without tokenization)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--window", type=int, default=768)
    ap.add_argument("--save-folder", default="logs")
    args = ap.parse_args()

    from frankenstein_tpu.config import MAEConfig, TrainConfig
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.models.brainformer import MAE
    from frankenstein_tpu.train import trainer

    cfg = MAEConfig(window_size=args.window, patch_size=32)
    spec = trainer.TrainableSpec(module=MAE(cfg, dtype=jnp.bfloat16),
                                 rng_names=("mask",), needs_labels=False)

    tok_fn = tokenizers.get_tokenizer(tokenizers.best_available_tokenizer())
    if args.data == "synthetic":
        train_ds = datasets.BrainDataset.synthetic(512, 0, tok_fn,
                                                   max_input_len=args.window)
        val_ds = datasets.BrainDataset.synthetic(64, 1, tok_fn,
                                                 max_input_len=args.window)
    else:
        root = Path(args.data)
        train_ds = datasets.BrainDataset(root / "train", tok_fn,
                                         max_input_len=args.window)
        val_ds = datasets.BrainDataset(root / "test", tok_fn,
                                       max_input_len=args.window)

    tcfg = TrainConfig(exp_name="brainformer_simple",   # reference cell 2
                       batch_size=args.batch_size, max_steps=args.steps)
    trainer.run_train_model(spec, (train_ds, val_ds), tcfg,
                            project_name="mae",
                            save_folder=Path(args.save_folder))

    # pretrain -> finetune: the checkpoint this run leaves behind warm-starts
    # the composites (the workflow the reference intends but never wires —
    # its train_mae.ipynb MAE is never loaded by franky_baseline_gpt2.ipynb):
    #   python train.py --model franky --init-encoder-from \
    #       logs/brainformer_simple --data ... --patch 32 --window 768
    # (geometry must match; mismatches raise — see
    # frankenstein_tpu/train/checkpoints.py:graft_encoder_from_mae)
    print(f"warm-start a composite with: train.py --model franky "
          f"--init-encoder-from {Path(args.save_folder) / tcfg.exp_name}")


if __name__ == "__main__":
    main()
