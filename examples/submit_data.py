#!/usr/bin/env python
"""eval.ai submission (script form of reference:notebooks/submit_data.ipynb):
decode every held-out trial with the trained Franky checkpoint, normalize,
write one line per trial to sub.txt.

Two ways to point at a model:
  --run-dir logs/<exp>     turnkey: reads the run's model_config.json
                           (written by train.py) and its best-by-val-loss
                           checkpoint — the day-1 real-data path
                           (train.py --data <competitionData> ... then this)
  --checkpoint <dir>       explicit orbax step_*_loss_* dir, flagship
                           geometry unless --run-dir also given
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("FK_PLATFORM"):
    # fresh-process platform override (the axon plugin overrides the
    # JAX_PLATFORMS env var; jax.config wins — see train.py)
    import jax
    jax.config.update("jax_platforms", os.environ["FK_PLATFORM"])

import argparse
import json


def build_from_run_dir(run_dir: Path, dtype):
    """(model, model_cfg, best checkpoint path) from a train.py run dir."""
    from frankenstein_tpu.models.franky import Franky, FrankyLlama
    from frankenstein_tpu.train import checkpoints as ckpt_lib
    import frankenstein_tpu.config as cfg_lib

    doc = json.loads((run_dir / "model_config.json").read_text())
    name, mc = doc["model"], doc["model_config"]
    if name in ("franky", "moe-gpt"):
        cfg = cfg_lib.FrankyConfig.from_dict(mc)
        model = Franky(cfg, dtype=dtype)
    elif name == "franky-llama":
        from frankenstein_tpu.models.franky import FrankyLlamaConfig
        cfg = FrankyLlamaConfig.from_dict(mc)
        model = FrankyLlama(cfg, dtype=dtype)
    else:
        raise SystemExit(f"--run-dir decoding supports the composite "
                         f"models, not {name}")
    best = ckpt_lib.best_checkpoint(run_dir)
    if best is None:
        raise SystemExit(f"no step_*_loss_* checkpoint under {run_dir}")
    return model, cfg, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="competitionData root")
    ap.add_argument("--split", default="test")
    ap.add_argument("--run-dir", default=None,
                    help="train.py run dir (model_config.json + checkpoints)")
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir (step_*_loss_*); defaults to "
                         "the run dir's best")
    ap.add_argument("--out", default="sub.txt")
    ap.add_argument("--beam-width", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp

    from frankenstein_tpu.config import (FrankyConfig, GPTConfig, MAEConfig,
                                         PerceiverConfig, TrainConfig)
    from frankenstein_tpu.data import datasets, tokenizers
    from frankenstein_tpu.decode.pipeline import make_franky_predictor
    from frankenstein_tpu.eval.submission import create_string_file, make_predictions
    from frankenstein_tpu.models.franky import Franky
    from frankenstein_tpu.train import checkpoints as ckpt_lib
    from frankenstein_tpu.train import trainer

    ckpt = Path(args.checkpoint) if args.checkpoint else None
    if args.run_dir:
        model, cfg, best = build_from_run_dir(Path(args.run_dir), jnp.bfloat16)
        ckpt = ckpt or best
    else:
        if ckpt is None:
            raise SystemExit("pass --run-dir or --checkpoint")
        cfg = FrankyConfig(
            brain=PerceiverConfig(encoder=MAEConfig(window_size=768,
                                                    patch_size=32),
                                  n_output_tokens=32, output_dim=768),
            gpt=GPTConfig())
        model = Franky(cfg, dtype=jnp.bfloat16)

    enc = cfg.brain.encoder
    tok = tokenizers.best_available_tokenizer()
    ds = datasets.BrainDataset(Path(args.data) / args.split,
                               tokenize_function=tokenizers.get_tokenizer(tok),
                               max_input_len=enc.window_size)

    spec = trainer.TrainableSpec(module=model)
    sample = next(iter(datasets.batch_iterator(ds, 2, shuffle=False, epochs=1)))
    state, _ = trainer.init_state(spec, TrainConfig(batch_size=2), sample)
    state = ckpt_lib.restore_checkpoint(ckpt, state)

    predict = make_franky_predictor(model, {"params": state.params}, tok,
                                    max_new_tokens=cfg.max_tokens,
                                    beam_width=args.beam_width)
    sentences = make_predictions(ds, predict, batch_size=args.batch_size)
    out = create_string_file(args.out, sentences)
    print(f"wrote {len(sentences)} predictions to {out}")


if __name__ == "__main__":
    main()
