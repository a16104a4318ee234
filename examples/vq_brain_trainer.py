#!/usr/bin/env python
"""VQ-VAE neural tokenizer training (script form of
reference:notebooks_trainer/vq_brain_trainer.ipynb:
``SoundStream(C=256, D=64, codebook_size=1024, n_electrodes=512)``, the
512-channel spikePow+tx4 concat preprocessing)."""

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
    ap.add_argument("--batch-size", type=int, default=64)   # reference cell 3
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--save-folder", default="logs")
    args = ap.parse_args()

    from frankenstein_tpu.config import TrainConfig, VQVAEConfig
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.models.vq_brain import SoundStream
    from frankenstein_tpu.train import trainer

    cfg = VQVAEConfig(n_electrodes=args.channels)
    spec = trainer.TrainableSpec(module=SoundStream(cfg, dtype=jnp.bfloat16),
                                 rng_names=("vq",), mutable=("vq",),
                                 needs_train_flag=True, needs_labels=False)

    tok_fn = tokenizers.get_tokenizer(tokenizers.best_available_tokenizer())
    if args.data == "synthetic":
        train_ds = datasets.BrainDataset.synthetic(
            512, 0, tok_fn, n_electrodes=args.channels)
        val_ds = datasets.BrainDataset.synthetic(
            64, 1, tok_fn, n_electrodes=args.channels)
    else:
        # 512-channel mode: spikePow ++ tx4 with smoothing (process_signal)
        root = Path(args.data)
        train_data = datasets.process_all_files(root / "train", mode="concat512")
        val_data = datasets.process_all_files(root / "test", mode="concat512")
        train_ds = datasets.BrainDataset(data=train_data, tokenize_function=tok_fn)
        val_ds = datasets.BrainDataset(data=val_data, tokenize_function=tok_fn)

    tcfg = TrainConfig(exp_name="vq_brain", batch_size=args.batch_size,
                       eval_interval=500, max_steps=args.steps)
    trainer.run_train_model(spec, (train_ds, val_ds), tcfg,
                            project_name="frankenstein",
                            save_folder=Path(args.save_folder))


if __name__ == "__main__":
    main()
