#!/usr/bin/env python
"""CLI trainer — the packaged replacement for the reference's notebook
entry points (notebooks_trainer/*.ipynb).

Examples:
  # end-to-end Franky on synthetic data (no dataset needed)
  python train.py --model franky --data synthetic --steps 200 --batch-size 32

  # MAE pretraining on the competition data
  python train.py --model mae --data /data/competitionData --steps 100000

  # VQ-VAE neural tokenizer
  python train.py --model vqvae --data /data/competitionData --channels 512
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_model(args):
    import jax.numpy as jnp

    from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                         PerceiverConfig, VQVAEConfig)
    from frankenstein_tpu.train.trainer import TrainableSpec
    from frankenstein_tpu.utils import profiling

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mae_cfg = MAEConfig(window_size=args.window, n_electrodes=args.channels,
                        patch_size=args.patch)

    if args.model == "franky":
        from frankenstein_tpu.models.franky import Franky
        cfg = FrankyConfig(
            brain=PerceiverConfig(encoder=mae_cfg, n_output_tokens=32,
                                  output_dim=768),
            gpt=GPTConfig(dropout=args.dropout))
        return TrainableSpec(
            module=Franky(cfg, dtype=dtype), needs_train_flag=True,
            rng_names=("dropout",) if args.dropout > 0 else (),
            flops_per_sample=profiling.franky_fwd_flops_per_sample(cfg)), cfg
    if args.model == "mae":
        from frankenstein_tpu.models.brainformer import MAE
        return TrainableSpec(
            module=MAE(mae_cfg, dtype=dtype),
            rng_names=("mask",), needs_labels=False,
            flops_per_sample=profiling.mae_fwd_flops_per_sample(mae_cfg)), mae_cfg
    if args.model == "brainformer":
        from frankenstein_tpu.models.brainformer import BrainFormer
        cfg = PerceiverConfig(encoder=mae_cfg, n_output_tokens=25,
                              output_dim=50257)
        return TrainableSpec(module=BrainFormer(cfg, dtype=dtype)), cfg
    if args.model == "simple_mae":
        from frankenstein_tpu.config import SimpleEncoderConfig, SimpleMAEConfig
        from frankenstein_tpu.models.simple_mae import SimpleMAE
        ec = SimpleEncoderConfig(block_size=args.window,
                                 patch_size=args.channels)
        dc = SimpleMAEConfig()
        return TrainableSpec(module=SimpleMAE(ec, dc, dtype=dtype),
                             rng_names=("mask",), needs_labels=False), (ec, dc)
    if args.model == "vqvae":
        from frankenstein_tpu.models.vq_brain import SoundStream
        cfg = VQVAEConfig(n_electrodes=args.channels)
        return TrainableSpec(
            module=SoundStream(cfg, dtype=dtype),
            rng_names=("vq",), mutable=("vq",),
            needs_train_flag=True, needs_labels=False,
            flops_per_sample=profiling.vqvae_fwd_flops_per_sample(
                cfg, t=args.window)), cfg
    raise SystemExit(f"unknown model {args.model}")


def build_datasets(args):
    from frankenstein_tpu.data import datasets, tokenizers

    tok = tokenizers.best_available_tokenizer()
    tok_fn = tokenizers.get_tokenizer(tok)
    if args.data == "synthetic":
        train = datasets.BrainDataset.synthetic(
            n_trials=args.synthetic_trials, seed=0, tokenize_function=tok_fn,
            n_electrodes=args.channels, max_input_len=args.window)
        val = datasets.BrainDataset.synthetic(
            n_trials=max(args.synthetic_trials // 8, 8), seed=1,
            tokenize_function=tok_fn, n_electrodes=args.channels,
            max_input_len=args.window)
        return train, val
    root = Path(args.data)
    train = datasets.BrainDataset(root / "train", tokenize_function=tok_fn,
                                  max_input_len=args.window)
    val = datasets.BrainDataset(root / "test", tokenize_function=tok_fn,
                                max_input_len=args.window)
    return train, val


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="franky",
                   choices=["franky", "mae", "brainformer", "vqvae",
                            "simple_mae"])
    p.add_argument("--data", default="synthetic",
                   help="'synthetic' or path to competitionData/")
    p.add_argument("--exp-name", default=None)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--wd-mask", action="store_true",
                   help="decay only ndim>=2 params (nanoGPT grouping)")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="GPT dropout rate (franky)")
    p.add_argument("--p-augs", type=float, default=0.0,
                   help="per-sample probability of time-mask augmentation")
    p.add_argument("--eval-interval", type=int, default=1000)
    p.add_argument("--warmup", type=int, default=2000)
    p.add_argument("--decay-iters", type=int, default=50_000)
    p.add_argument("--window", type=int, default=768)
    p.add_argument("--patch", type=int, default=32)
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--synthetic-trials", type=int, default=512)
    p.add_argument("--save-folder", default="logs")
    p.add_argument("--mesh", default=None,
                   help="data,model mesh shape, e.g. '8,1'")
    args = p.parse_args()

    from frankenstein_tpu.config import TrainConfig
    from frankenstein_tpu.parallel.mesh import maybe_initialize_distributed
    from frankenstein_tpu.train.trainer import run_train_model

    maybe_initialize_distributed()

    spec, model_cfg = build_model(args)
    datasets_ = build_datasets(args)
    mesh_shape = (tuple(int(s) for s in args.mesh.split(","))
                  if args.mesh else None)
    cfg = TrainConfig(
        exp_name=args.exp_name or f"{args.model}_{args.data.split('/')[-1]}",
        batch_size=args.batch_size, grad_accum=args.grad_accum,
        learning_rate=args.lr, weight_decay=args.weight_decay,
        weight_decay_mask=args.wd_mask, p_augs=args.p_augs,
        max_steps=args.steps, eval_interval=args.eval_interval,
        warmup_iters=args.warmup, lr_decay_iters=args.decay_iters,
        mixed_precision=args.bf16, mesh_shape=mesh_shape)

    save = Path(args.save_folder)
    state = run_train_model(spec, datasets_, cfg, project_name="frankenstein_tpu",
                            save_folder=save)
    print(f"done at step {int(state.step)}; logs in {save / cfg.exp_name}")


if __name__ == "__main__":
    main()
