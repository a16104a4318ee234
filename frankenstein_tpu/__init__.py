"""frankenstein_tpu — a TPU-native (JAX/XLA/Pallas/pjit) brain-to-text framework.

A from-scratch redesign of the capabilities of ALVI-Labs/frankenstein
(Brain-to-Text Benchmark '24: decode sentences from 256-electrode
intracortical recordings) built TPU-first:

- pure-functional models (flax.linen) with bf16 compute policy
- block-causal ("slab") attention as a mask-free Pallas flash kernel
- vector quantization with EMA codebook updates that ride XLA collectives
- KV-cached decode + batched beam search (the reference re-forwards O(T^2))
- pjit/Mesh data/model parallelism over ICI
- orbax checkpoints, JSONL metrics, MFU meters

Reference parity citations point into ALVI-Labs/frankenstein as
``reference:<path>:<line>``.
"""

__version__ = "0.1.0"

from frankenstein_tpu import config as config
from frankenstein_tpu import ops as ops
