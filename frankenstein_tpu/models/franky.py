"""Franky: BrainEncoder prefix -> GPT-2, the end-to-end brain-to-text model
(reference:notebooks_trainer/franky_baseline_gpt2.ipynb cells 3-5).

Training: 32 Perceiver output vectors become a soft prompt; targets with -100
padding are swapped to 50256 for the input ids (reference cell 4).

Generation: the reference's ``Franky.generate`` is broken (passes ``x``
instead of ``input_ids`` to generate, references an undefined variable —
reference cell 4); here we implement the intended behavior with a KV-cached
decode loop (see decode/sampling.py for sampling/beam drivers).

``FrankyLlama`` below is the same composite with the LLaMA decoder the
reference's README names as the target architecture
(`VQVAE -> MAE -> Perceiver -> LLAMA 3`, reference:README.md:19) but never
implements — there the LLaMA stage exists only as intent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from frankenstein_tpu.config import (FrankyConfig, GPT2_EOT, IGNORE_INDEX,
                                     MAEConfig, MAX_TOKENS, PerceiverConfig,
                                     _SerializableMixin)
from frankenstein_tpu.models.brainformer import BrainEncoder
from frankenstein_tpu.models.gpt2 import GPT
from frankenstein_tpu.models.llama import (Llama, LlamaConfig,
                                           init_llama_cache)


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


@dataclass(frozen=True)
class FrankyLlamaConfig(_SerializableMixin):
    """Composite config for the reference's north-star decoder
    (reference:README.md:19 names `... -> Perceiver -> LLAMA 3`; the LLaMA
    stage is unimplemented there). The default LM is a ~110M from-scratch
    LLaMA over GPT-2 BPE ids so the composite trains end-to-end without any
    external checkpoint; point ``lm`` at llama-3 geometry (and import
    weights via models/llama.py:params_from_hf_llama) for the real thing."""

    brain: PerceiverConfig = field(
        default_factory=lambda: PerceiverConfig(
            encoder=MAEConfig(window_size=768, patch_size=32),
            n_output_tokens=32,
            output_dim=1024,
        )
    )
    lm: LlamaConfig = field(
        default_factory=lambda: LlamaConfig(
            vocab_size=50304, dim=1024, n_layers=8, n_heads=16,
            n_kv_heads=8, hidden_dim=2816, rope_theta=10000.0,
            max_seq_len=128, tie_embeddings=True))
    max_tokens: int = MAX_TOKENS
    # -100 label padding becomes this input id (the GPT-2 EOT, matching the
    # Franky convention — reference:franky_baseline_gpt2.ipynb cell 4)
    pad_token_id: int = GPT2_EOT


class FrankyLlama(nn.Module):
    """BrainEncoder prefix -> LLaMA: the complete north-star composite.

    Same trainable contract and decode surface as Franky (the generic
    generate/beam/rescoring drivers in decode/ work unchanged); the brain
    Perceiver projects into the LM's embedding space
    (``cfg.brain.output_dim`` must equal ``cfg.lm.dim``)."""

    cfg: FrankyLlamaConfig
    dtype: Any = jnp.float32

    def setup(self):
        assert self.cfg.brain.output_dim == self.cfg.lm.dim, (
            "Perceiver output_dim must match the LM embedding dim")
        self.brain_model = BrainEncoder(self.cfg.brain, dtype=self.dtype,
                                        name="brain_model")
        self.llm_model = Llama(self.cfg.lm, dtype=self.dtype,
                               name="llm_model")

    def __call__(self, x, targets=None, date_info=None):
        """x: [B, T, C] signal; targets: [B, max_tokens] ids with -100 pad.
        Returns (loss, logits) — the uniform trainable contract
        (reference:utils/train_utils.py:138)."""
        features = self.brain_model(x, date_info=date_info)
        idx = jnp.where(targets == IGNORE_INDEX, self.cfg.pad_token_id,
                        targets)
        return self.llm_model(idx, prefix=features, targets=targets)

    def encode(self, x, date_info=None):
        return self.brain_model(x, date_info=date_info)

    def sequence_logprob(self, idx, prefix=None,
                         ignore_index: int = IGNORE_INDEX):
        """Prefix-conditioned LM scoring — lets the trained composite serve
        as its own brain-conditioned rescorer (rescore_candidates(prefix=
        encode(x)))."""
        return self.llm_model.sequence_logprob(idx, prefix,
                                               ignore_index=ignore_index)

    def init_decode_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        return init_llama_cache(self.cfg.lm, batch, max_len, dtype)

    def prefill(self, idx, prefix, cache):
        return self.llm_model.prefill(idx, prefix, cache)

    def decode_step(self, token, cache, length, qweights=None):
        return self.llm_model.decode_step(token, cache, length, qweights)

    @staticmethod
    def reorder_cache(cache, flat_idx, group: int = 0):
        return GPT.reorder_cache(cache, flat_idx, group=group)

    expand_cache = staticmethod(Llama.expand_cache)
