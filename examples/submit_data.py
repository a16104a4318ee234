#!/usr/bin/env python
"""eval.ai submission (script form of reference:notebooks/submit_data.ipynb):
decode every held-out trial with the trained Franky checkpoint, normalize,
write one line per trial to sub.txt."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="competitionData root")
    ap.add_argument("--split", default="test")
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (step_*_loss_*)")
    ap.add_argument("--out", default="sub.txt")
    ap.add_argument("--beam-width", type=int, default=5)
    args = ap.parse_args()

    from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                         PerceiverConfig, TrainConfig)
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.decode.pipeline import make_franky_predictor
    from frankenstein_tpu.eval.submission import create_string_file, make_predictions
    from frankenstein_tpu.models.franky import Franky
    from frankenstein_tpu.train import checkpoints as ckpt_lib
    from frankenstein_tpu.train import trainer

    cfg = FrankyConfig(
        brain=PerceiverConfig(encoder=MAEConfig(window_size=768, patch_size=32),
                              n_output_tokens=32, output_dim=768),
        gpt=GPTConfig())
    model = Franky(cfg, dtype=jnp.bfloat16)
    tok = tokenizers.best_available_tokenizer()
    ds = datasets.BrainDataset(Path(args.data) / args.split,
                               tokenize_function=tokenizers.get_tokenizer(tok))

    spec = trainer.TrainableSpec(module=model)
    sample = next(iter(datasets.batch_iterator(ds, 2, shuffle=False, epochs=1)))
    state, _ = trainer.init_state(spec, TrainConfig(batch_size=2), sample)
    state = ckpt_lib.restore_checkpoint(Path(args.checkpoint), state)

    predict = make_franky_predictor(model, {"params": state.params}, tok,
                                    beam_width=args.beam_width)
    sentences = make_predictions(ds, predict, batch_size=32)
    out = create_string_file(args.out, sentences)
    print(f"wrote {len(sentences)} predictions to {out}")


if __name__ == "__main__":
    main()
