"""Franky: BrainEncoder prefix -> GPT-2, the end-to-end brain-to-text model
(reference:notebooks_trainer/franky_baseline_gpt2.ipynb cells 3-5).

Training: 32 Perceiver output vectors become a soft prompt; targets with -100
padding are swapped to 50256 for the input ids (reference cell 4).

Generation: the reference's ``Franky.generate`` is broken (passes ``x``
instead of ``input_ids`` to generate, references an undefined variable —
reference cell 4); here we implement the intended behavior with a KV-cached
decode loop (see decode/sampling.py for sampling/beam drivers).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from frankenstein_tpu.config import FrankyConfig, GPT2_EOT, IGNORE_INDEX
from frankenstein_tpu.models.brainformer import BrainEncoder
from frankenstein_tpu.models.gpt2 import GPT


class Franky(nn.Module):
    cfg: FrankyConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.brain_model = BrainEncoder(self.cfg.brain, dtype=self.dtype,
                                        name="brain_model")
        self.llm_model = GPT(self.cfg.gpt, dtype=self.dtype, name="llm_model")

    def __call__(self, x, targets=None, date_info=None, train: bool = False):
        """x: [B, 768, 256] signal; targets: [B, 25] token ids with -100 pad.

        Returns (loss, logits) — the uniform trainable-model contract
        (reference:utils/train_utils.py:138). ``train=True`` enables GPT
        dropout (needs a 'dropout' rng when cfg.gpt.dropout > 0).
        """
        features = self.brain_model(x, date_info=date_info)
        idx = jnp.where(targets == IGNORE_INDEX, self.cfg.pad_token_id, targets)
        return self.llm_model(idx, prefix=features, targets=targets, train=train)

    def encode(self, x, date_info=None):
        """Brain window -> prefix vectors (decode-time entry)."""
        return self.brain_model(x, date_info=date_info)

    def prefill(self, idx, prefix, cache):
        return self.llm_model.prefill(idx, prefix, cache)

    def decode_step(self, token, cache, length, qweights=None):
        return self.llm_model.decode_step(token, cache, length, qweights)

    def decode_step_topk(self, token, cache, length, w_t=None, *, k: int):
        return self.llm_model.decode_step_topk(token, cache, length, w_t, k=k)

    def lm_head_table(self):
        return self.llm_model.lm_head_table()

    @staticmethod
    def reorder_cache(cache, flat_idx, group: int = 0):
        return GPT.reorder_cache(cache, flat_idx, group=group)
