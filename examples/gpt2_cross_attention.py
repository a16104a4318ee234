#!/usr/bin/env python
"""Cross-attention-conditioned GPT-2 exploration.

Script form of reference:notebooks/llm_hugging_face.ipynb cells 0-1, the
reference's abandoned exploration of conditioning a language model on brain
features via CROSS-ATTENTION (``GPT2Model.from_pretrained(...,
add_cross_attention=True)`` over random ``encoder_hidden_states``) instead of
the soft-prompt prefix Franky ended up using.

Here the same experiment, TPU-native: a small GPT-2-style decoder whose
blocks interleave causal self-attention with cross-attention over encoder
hidden states (frankenstein_tpu CrossBlock), randomly initialized like the
notebook's fresh cross-attention weights, generating greedily and by
sampling from random encoder states. Run on CPU or TPU:

  python examples/gpt2_cross_attention.py [--steps 30] [--vocab 50257]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax
import jax.numpy as jnp
import flax.linen as nn


class CrossAttnLM(nn.Module):
    """Token decoder with per-block cross-attention over encoder states —
    the shape of HF's ``add_cross_attention=True`` GPT-2
    (reference:notebooks/llm_hugging_face.ipynb cell 0)."""

    vocab: int
    dim: int = 256
    n_layers: int = 4
    n_heads: int = 4

    @nn.compact
    def __call__(self, idx, enc_states):
        from frankenstein_tpu.models.layers import CrossBlock, LayerNorm
        from frankenstein_tpu.ops import masks

        b, t = idx.shape
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (self.vocab, self.dim), jnp.float32)
        wpe = self.param("wpe", nn.initializers.normal(0.02),
                         (1024, self.dim), jnp.float32)
        x = wte[idx] + wpe[:t][None]
        causal = masks.causal_mask(t, t)
        for i in range(self.n_layers):
            x = CrossBlock(self.dim, self.n_heads, self.dim // self.n_heads,
                           4 * self.dim, name=f"h_{i}")(
                x, enc_states, self_mask=causal)
        x = LayerNorm(self.dim, name="ln_f")(x)
        return x @ wte.T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--n-enc-tokens", type=int, default=16)
    ap.add_argument("--temperature", type=float, default=0.9)
    args = ap.parse_args()

    from frankenstein_tpu.config import GPT2_EOT
    from frankenstein_tpu.data.tokenizers import best_available_tokenizer

    tok = best_available_tokenizer()
    model = CrossAttnLM(vocab=args.vocab)

    # random encoder hidden states, like the notebook's torch.rand(1, 16, E)
    enc = jax.random.uniform(jax.random.key(1),
                             (1, args.n_enc_tokens, model.dim))
    idx0 = jnp.full((1, 1), GPT2_EOT, jnp.int32)
    params = model.init(jax.random.key(0), idx0, enc)

    def generate(rng, greedy):
        idx = idx0
        for _ in range(args.steps):
            logits = model.apply(params, idx, enc)[:, -1]
            if greedy:
                nxt = jnp.argmax(logits, axis=-1)
            else:
                rng, r = jax.random.split(rng)
                nxt = jax.random.categorical(r, logits / args.temperature,
                                             axis=-1)
            idx = jnp.concatenate([idx, nxt[:, None]], axis=1)
        return idx[0, 1:]

    print("greedy :", tok.decode(list(map(int, generate(jax.random.key(2),
                                                        True)))))
    print("sampled:", tok.decode(list(map(int, generate(jax.random.key(3),
                                                        False)))))
    # the exploration's conclusion (and the reference's): untrained
    # cross-attention babbles; Franky's soft-prompt prefix won out.


if __name__ == "__main__":
    main()
