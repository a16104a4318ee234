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
import os
from pathlib import Path

if os.environ.get("FK_PLATFORM"):
    # fresh-process platform override (the axon TPU plugin overrides the
    # JAX_PLATFORMS env var, so subprocess tests — e.g. the day-1 dress
    # rehearsal — set FK_PLATFORM=cpu and we win via jax.config)
    import jax
    jax.config.update("jax_platforms", os.environ["FK_PLATFORM"])


def make_spec(name, cfg, dtype, window: int = 768):
    """TrainableSpec for a built model config (args OR YAML path)."""
    from frankenstein_tpu.train.trainer import TrainableSpec
    from frankenstein_tpu.utils import profiling

    if name in ("franky", "moe-gpt"):
        from frankenstein_tpu.models.franky import Franky
        return TrainableSpec(
            module=Franky(cfg, dtype=dtype), needs_train_flag=True,
            rng_names=("dropout",) if cfg.gpt.dropout > 0 else (),
            flops_per_sample=profiling.franky_fwd_flops_per_sample(cfg))
    if name == "franky-llama":
        from frankenstein_tpu.models.franky import FrankyLlama
        return TrainableSpec(
            module=FrankyLlama(cfg, dtype=dtype),
            flops_per_sample=profiling.franky_llama_fwd_flops_per_sample(cfg))
    if name == "mae":
        from frankenstein_tpu.models.brainformer import MAE
        return TrainableSpec(
            module=MAE(cfg, dtype=dtype),
            rng_names=("mask",), needs_labels=False,
            flops_per_sample=profiling.mae_fwd_flops_per_sample(cfg))
    if name == "brainformer":
        from frankenstein_tpu.models.brainformer import BrainFormer
        return TrainableSpec(module=BrainFormer(cfg, dtype=dtype))
    if name == "simple_mae":
        from frankenstein_tpu.models.simple_mae import SimpleMAE
        ec, dc = cfg
        return TrainableSpec(module=SimpleMAE(ec, dc, dtype=dtype),
                             rng_names=("mask",), needs_labels=False)
    if name == "vqvae":
        from frankenstein_tpu.models.vq_brain import SoundStream
        return TrainableSpec(
            module=SoundStream(cfg, dtype=dtype),
            rng_names=("vq",), mutable=("vq",),
            needs_train_flag=True, needs_labels=False,
            flops_per_sample=profiling.vqvae_fwd_flops_per_sample(
                cfg, t=window))
    raise SystemExit(f"unknown model {name}")


def config_from_args(args):
    """Model config from CLI geometry flags (the no-YAML path)."""
    from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                         PerceiverConfig, SimpleEncoderConfig,
                                         SimpleMAEConfig, VQVAEConfig)
    mae_cfg = MAEConfig(window_size=args.window, n_electrodes=args.channels,
                        patch_size=args.patch)
    if args.model in ("franky", "moe-gpt"):
        # moe-gpt: the flagship with every GPT block's MLP swapped for a
        # top-k-routed MoE, experts sharded over the 'model' mesh axis
        moe = args.moe_experts if args.model == "moe-gpt" else 0
        return FrankyConfig(
            brain=PerceiverConfig(encoder=mae_cfg, n_output_tokens=32,
                                  output_dim=768),
            gpt=GPTConfig(dropout=args.dropout, moe_experts=moe,
                          moe_k=args.moe_k,
                          moe_capacity=getattr(args, "moe_capacity", 1.25)))
    if args.model == "franky-llama":
        from frankenstein_tpu.models.franky import FrankyLlamaConfig
        return FrankyLlamaConfig(
            brain=PerceiverConfig(encoder=mae_cfg, n_output_tokens=32,
                                  output_dim=1024))
    if args.model == "mae":
        return mae_cfg
    if args.model == "brainformer":
        return PerceiverConfig(encoder=mae_cfg, n_output_tokens=25,
                               output_dim=50257)
    if args.model == "simple_mae":
        return (SimpleEncoderConfig(block_size=args.window,
                                    patch_size=args.channels),
                SimpleMAEConfig())
    if args.model == "vqvae":
        return VQVAEConfig(n_electrodes=args.channels)
    raise SystemExit(f"unknown model {args.model}")


MODEL_CONFIG_CLASSES = {
    "franky": "FrankyConfig",
    "moe-gpt": "FrankyConfig",
    "mae": "MAEConfig",
    "brainformer": "PerceiverConfig",
    "vqvae": "VQVAEConfig",
}


def config_from_yaml(doc):
    """(model name, model config) from a parsed YAML document; nested
    sections round-trip through each config's _SerializableMixin."""
    import frankenstein_tpu.config as cfg_lib

    name = doc["model"]
    mc = doc.get("model_config", {})
    if name == "simple_mae":
        return name, (cfg_lib.SimpleEncoderConfig.from_dict(mc.get("encoder", {})),
                      cfg_lib.SimpleMAEConfig.from_dict(mc.get("decoder", {})))
    if name == "franky-llama":
        from frankenstein_tpu.models.franky import FrankyLlamaConfig
        return name, FrankyLlamaConfig.from_dict(mc)
    cls = getattr(cfg_lib, MODEL_CONFIG_CLASSES[name])
    return name, cls.from_dict(mc)


def build_model(args):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.config:
        import yaml
        doc = yaml.safe_load(Path(args.config).read_text())
        args.yaml_train = doc.get("train", {})
        name, cfg = config_from_yaml(doc)
        args.model = name
        # geometry for the data pipeline follows the YAML model
        if name in ("franky", "moe-gpt", "franky-llama", "brainformer"):
            args.window = cfg.brain.encoder.window_size \
                if name != "brainformer" else cfg.encoder.window_size
            args.channels = cfg.brain.encoder.n_electrodes \
                if name != "brainformer" else cfg.encoder.n_electrodes
        elif name == "mae":
            args.window, args.channels = cfg.window_size, cfg.n_electrodes
        elif name == "vqvae":
            args.channels = cfg.n_electrodes
    else:
        cfg = config_from_args(args)
    return make_spec(args.model, cfg, dtype, window=args.window), cfg


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
    p.add_argument("--config", default=None,
                   help="YAML config (see configs/); explicitly passed CLI "
                        "flags override its train section")
    p.add_argument("--model", default="franky",
                   choices=["franky", "moe-gpt", "franky-llama", "mae",
                            "brainformer", "vqvae", "simple_mae"])
    p.add_argument("--moe-experts", type=int, default=8,
                   help="expert count for --model moe-gpt")
    p.add_argument("--moe-k", type=int, default=2,
                   help="experts routed per token for --model moe-gpt")
    p.add_argument("--moe-capacity", type=float, default=1.25,
                   help="expert capacity factor for --model moe-gpt "
                        "(tokens over cap are dropped; residual carries them)")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic' or path to competitionData/")
    p.add_argument("--exp-name", default=None)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="optimizer steps per dispatched program (scan over "
                        "step-stacked batches; amortizes per-dispatch cost "
                        "on remote TPUs, identical numerics)")
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
    p.add_argument("--init-encoder-from", default=None, metavar="CKPT",
                   help="graft a pretrained MAE checkpoint's encoder into "
                        "the franky/franky-llama composite before training "
                        "(orbax step_*_loss_* dir, or a run dir — best by "
                        "val loss is picked); the MAEConfig geometry must "
                        "match the composite's brain encoder")
    p.add_argument("--mesh", default=None,
                   help="data,model mesh shape, e.g. '8,1'")
    args = p.parse_args()

    from frankenstein_tpu.config import TrainConfig
    from frankenstein_tpu.parallel.mesh import maybe_initialize_distributed
    from frankenstein_tpu.train.trainer import run_train_model

    maybe_initialize_distributed()

    args.yaml_train = {}
    spec, model_cfg = build_model(args)
    datasets_ = build_datasets(args)
    mesh_shape = (tuple(int(s) for s in args.mesh.split(","))
                  if args.mesh else None)
    cli_values = dict(
        exp_name=args.exp_name or f"{args.model}_{args.data.split('/')[-1]}",
        batch_size=args.batch_size, grad_accum=args.grad_accum,
        steps_per_dispatch=args.steps_per_dispatch,
        learning_rate=args.lr, weight_decay=args.weight_decay,
        weight_decay_mask=args.wd_mask, p_augs=args.p_augs,
        max_steps=args.steps, eval_interval=args.eval_interval,
        warmup_iters=args.warmup, lr_decay_iters=args.decay_iters,
        mixed_precision=args.bf16, mesh_shape=mesh_shape)
    if args.config:
        # YAML train section is the base; only explicitly typed CLI flags win
        import sys
        flag_to_field = {
            "exp_name": "exp_name", "batch_size": "batch_size",
            "grad_accum": "grad_accum",
            "steps_per_dispatch": "steps_per_dispatch",
            "lr": "learning_rate",
            "weight_decay": "weight_decay", "wd_mask": "weight_decay_mask",
            "p_augs": "p_augs", "steps": "max_steps",
            "eval_interval": "eval_interval", "warmup": "warmup_iters",
            "decay_iters": "lr_decay_iters", "bf16": "mixed_precision",
            "no_bf16": "mixed_precision", "mesh": "mesh_shape"}
        typed = {a.split("=")[0].lstrip("-").replace("-", "_")
                 for a in sys.argv[1:] if a.startswith("--")}
        cfg = TrainConfig.from_dict(args.yaml_train)
        overrides = {field: cli_values[field]
                     for flag, field in flag_to_field.items() if flag in typed}
        if "exp_name" not in args.yaml_train and "exp_name" not in overrides:
            overrides["exp_name"] = cli_values["exp_name"]
        cfg = cfg.replace(**overrides)
    else:
        cfg = TrainConfig(**cli_values)

    init_transform = None
    if args.init_encoder_from:
        if args.model not in ("franky", "moe-gpt", "franky-llama"):
            raise SystemExit("--init-encoder-from needs a composite model "
                             "(franky / moe-gpt / franky-llama)")
        from frankenstein_tpu.train import checkpoints as ckpt_lib
        init_transform = lambda params: ckpt_lib.graft_encoder_from_mae(
            args.init_encoder_from, params)

    save = Path(args.save_folder)
    # serialize the MODEL config next to the run so downstream CLIs
    # (examples/submit_data.py --run-dir) rebuild the exact model without
    # re-stating geometry flags (SURVEY.md §5: config serialized per run)
    run_dir = save / cfg.exp_name
    run_dir.mkdir(parents=True, exist_ok=True)
    mc = (model_cfg.to_dict() if hasattr(model_cfg, "to_dict")
          else [c.to_dict() for c in model_cfg])
    (run_dir / "model_config.json").write_text(
        json.dumps({"model": args.model, "model_config": mc}, indent=1))
    state = run_train_model(spec, datasets_, cfg, project_name="frankenstein_tpu",
                            save_folder=save,
                            init_params_transform=init_transform)
    print(f"done at step {int(state.step)}; logs in {save / cfg.exp_name}")


if __name__ == "__main__":
    main()
