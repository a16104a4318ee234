#!/usr/bin/env python
"""Whisper-path pipeline (script form of
reference:notebooks/whisper_prepare_data.ipynb + whisper_hugging_face.ipynb):
PCA 256->80 fit on train voltages, 50->100 Hz resample, pad to 3000 frames,
then fine-tune the seq2seq model with WER-selected checkpoints."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=16)   # reference cell 19
    ap.add_argument("--lr", type=float, default=2.5e-5)
    ap.add_argument("--hf-whisper", default=None,
                    help="local HF whisper checkpoint dir (offline)")
    ap.add_argument("--save-folder", default="logs")
    args = ap.parse_args()

    from frankenstein_tpu.config import TrainConfig, WhisperConfig
    from frankenstein_tpu.data import datasets, tokenizers, whisper_prep
    from frankenstein_tpu.models import whisper
    from frankenstein_tpu.train import trainer

    tok = tokenizers.best_available_tokenizer()

    # ---- offline prep: PCA-80, resample 2x, pad 3000 ------------------------
    if args.data == "synthetic":
        brains, sentences, blocks = datasets.synthetic_trials(128, 0)
        brains = datasets.z_score_per_block_scaling(brains, blocks)
        val_brains, val_sentences, vb = datasets.synthetic_trials(32, 1)
        val_brains = datasets.z_score_per_block_scaling(val_brains, vb)
    else:
        root = Path(args.data)
        tr = datasets.process_all_files(root / "train")
        va = datasets.process_all_files(root / "test")
        brains, sentences = tr["brain_list"], tr["sentence_list"]
        val_brains, val_sentences = va["brain_list"], va["sentence_list"]

    mean, comps = whisper_prep.fit_pca(brains)
    mels = whisper_prep.prepare_brain_data_for_whisper(brains, mean, comps)
    val_mels = whisper_prep.prepare_brain_data_for_whisper(val_brains, mean,
                                                           comps)

    # ---- model ----------------------------------------------------------------
    if args.hf_whisper:
        from transformers import WhisperForConditionalGeneration
        hf = WhisperForConditionalGeneration.from_pretrained(args.hf_whisper)
        params0, cfg = whisper.params_from_hf_whisper(hf)
    else:
        cfg = WhisperConfig()
        params0 = None
    model = whisper.BrainWhisper(cfg, dtype=jnp.bfloat16)
    spec = trainer.TrainableSpec(module=model)

    def tokenize(s):
        ids = tok.encode(s)[: 30]
        return ids + [-100] * (32 - len(ids))

    labels = np.asarray([tokenize(s) for s in sentences], np.int64)
    val_labels = np.asarray([tokenize(s) for s in val_sentences], np.int64)

    class ArrayDataset:
        def __init__(self, mels, labels):
            self.mels, self.labels = mels.astype(np.float32), labels
        def __len__(self):
            return len(self.mels)
        def __getitem__(self, i):
            return self.mels[i], self.labels[i], 0

    tcfg = TrainConfig(exp_name="whisper_brain", batch_size=args.batch_size,
                       learning_rate=args.lr, max_steps=args.steps,
                       eval_interval=500, warmup_iters=len(mels) // args.batch_size)

    def wer_metric(state, step):
        from frankenstein_tpu.eval.evaluate import evaluate_seq2seq_wer
        # no start_id: the model's own SOT prompt (real HF ids when imported)
        wer, _ = evaluate_seq2seq_wer(
            model, {"params": state.params}, val_mels[:64], val_sentences[:64],
            tok, batch_size=args.batch_size)
        print(f"step {step}: WER {wer:.4f}")
        return wer

    state, _ = trainer.init_state(spec, tcfg,
                                  (mels[:8].astype(np.float32), labels[:8],
                                   np.zeros(8, np.int32)))
    if params0 is not None:
        state = state.replace(params=params0["params"])

    trainer.run_train_model(spec, (ArrayDataset(mels, labels),
                                   ArrayDataset(val_mels, val_labels)),
                            tcfg, project_name="whisper_brain",
                            save_folder=Path(args.save_folder),
                            eval_metric=wer_metric)


if __name__ == "__main__":
    main()
