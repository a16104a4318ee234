"""Frozen configuration dataclasses for every model family and the trainer.

Parity notes (defaults match the reference where it defines them):
- ``MAEConfig``   ~ reference:models/brainformer.py:17-37
- ``PerceiverConfig`` ~ reference:models/brainformer.py:39-53 (``Config``)
- ``GPTConfig``   ~ reference:models/gpt2_model.py:108-116
- ``VQVAEConfig`` ~ reference:models/vq_brain.py:162-196 + notebook config
  ``dict(C=256, D=64, codebook_size=1024, n_electrodes=512)``
- ``TrainConfig`` ~ reference:utils/train_utils.py:12-37

Unlike the reference (mutable dataclasses + simple_parsing), configs here are
frozen (hashable, safe as jit static args) and serializable to/from JSON so
each checkpoint directory can carry its exact config.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional


def _asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


class _SerializableMixin:
    """JSON (de)serialization for nested frozen config dataclasses."""

    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict):
        # `from __future__ import annotations` stringifies f.type — resolve
        # real classes so nested configs rebuild as dataclasses, not dicts
        import typing
        hints = typing.get_type_hints(cls)
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            t = hints.get(f.name, f.type)
            if isinstance(v, dict) and dataclasses.is_dataclass(t):
                v = t.from_dict(v)
            elif isinstance(v, list):
                # JSON/YAML round-trips tuples as lists; frozen configs must
                # stay hashable (jit statics)
                v = tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Data geometry (reference:utils/data_utils.py:11-12)
# ---------------------------------------------------------------------------

MAX_INPUT_LEN = 768   # time bins per trial at 50 Hz (~15.4 s)
MAX_TOKENS = 25       # GPT-2 tokens per sentence incl. bos/eos
N_ELECTRODES = 256    # Utah-array channels (spikePow features)
IGNORE_INDEX = -100   # label padding ignored by the CE loss
GPT2_EOT = 50256      # <|endoftext|>
N_SESSIONS = 24       # recording sessions (reference:utils/data_utils.py:14-37)


# ---------------------------------------------------------------------------
# Transformer-core configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MAEConfig(_SerializableMixin):
    """BrainFormer encoder / MAE geometry (reference:models/brainformer.py:17-37)."""

    # data params
    window_size: int = 1024
    n_electrodes: int = 256
    patch_size: int = 48

    # encoder
    dim: int = 256
    n_layers: int = 4
    head_dim: int = 32
    hidden_dim: int = 1024
    n_heads: int = 8
    n_kv_heads: int = 8
    rope_theta: float = 10000.0

    # decoder (MAE reconstruction head)
    n_dec_layers: int = 4
    decoder_dim: int = 256

    # MAE masking
    masking_ratio: float = 0.75

    # optional per-session (recording day) conditioning: 0 = off.
    # DATE_TO_INDEX exists in the reference but is never consumed by a model
    # (reference:utils/data_utils.py:342, SURVEY.md §7 caveat) — here it is a
    # real learned embedding when enabled.
    n_sessions: int = 0

    # sequence parallelism: when True AND the enclosing `with mesh:` has a
    # 'seq' axis, the Encoder's slab attention routes through ring attention
    # (parallel/ring_attention.py) — K/V blocks rotate the ICI ring, for
    # windows whose 6144+-token slab attention exceeds one chip. No mesh =>
    # silently the normal single-chip paths (identical math either way).
    seq_parallel: bool = False

    # int8 QK scores: run the encoder's slab QK dot at the MXU's 2x int8
    # rate (Q quantized per (row, head), K per (chunk, head), exact dequant
    # in the int32->f32 convert). Serving-grade accuracy, NOT bit-exact —
    # drift bounds in tests/test_attention.py::test_rope_fused_qk_int8_*.
    # Gradients are approximately straight-through (recomputed exact-bf16
    # dots against the quantized forward's residuals). Only the rope-fused
    # Pallas path honors it; fallbacks warn and compute exact bf16 (set
    # FK_QK_INT8_STRICT=1 to raise instead).
    qk_int8: bool = False

    @property
    def n_patches_per_channel(self) -> int:
        return self.window_size // self.patch_size

    @property
    def block_size(self) -> int:
        """Total token count: time-slabs x electrodes."""
        return self.n_patches_per_channel * self.n_electrodes


@dataclass(frozen=True)
class PerceiverConfig(_SerializableMixin):
    """Perceiver resampler on top of the encoder (reference:models/brainformer.py:39-53)."""

    encoder: MAEConfig = field(default_factory=MAEConfig)

    n_output_tokens: int = 32
    output_dim: int = 1024

    dim: int = 256  # must equal encoder.dim
    n_layers: int = 2
    head_dim: int = 16
    hidden_dim: int = 512
    n_heads: int = 4
    n_kv_heads: int = 4
    rope_theta: float = 10000.0


@dataclass(frozen=True)
class SimpleEncoderConfig(_SerializableMixin):
    """SimpleMAE time-patch encoder (reference:models/simple_mae + simple_mae.ipynb cell 1)."""

    block_size: int = 6           # number of time-patch tokens (window//patch)
    patch_size: int = 128         # channels*? — tokens are whole time patches
    dim: int = 256
    n_layers: int = 6
    head_dim: int = 32
    hidden_dim: int = 1024
    n_heads: int = 8
    n_kv_heads: int = 8
    rope_theta: float = 10000.0


@dataclass(frozen=True)
class SimpleMAEConfig(_SerializableMixin):
    """SimpleMAE decoder config."""

    dim: int = 256
    n_layers: int = 2
    head_dim: int = 32
    hidden_dim: int = 1024
    n_heads: int = 8
    n_kv_heads: int = 8
    rope_theta: float = 10000.0
    masking_ratio: float = 0.75


# ---------------------------------------------------------------------------
# GPT-2 (reference:models/gpt2_model.py:108-116)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GPTConfig(_SerializableMixin):
    block_size: int = 1024
    vocab_size: int = 50304   # padded to multiple of 64 (MXU-friendly; HF ckpt uses 50257)
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    dropout: float = 0.0
    bias: bool = True

    # Mixture-of-Experts MLP (beyond-reference; models/moe.py). moe_experts=0
    # keeps the dense GELU MLP; >0 swaps every block's MLP for a top-k-routed
    # MoESwiGLU sharded over the 'model' mesh axis (expert parallelism,
    # parallel/sharding.py:MOE_EP_RULES). The Switch load-balancing auxiliary
    # loss is added to the LM loss with weight moe_aux_weight.
    moe_experts: int = 0
    moe_k: int = 2
    moe_capacity: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


# ---------------------------------------------------------------------------
# VQ-VAE "SoundStream" neural tokenizer (reference:models/vq_brain.py)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VQVAEConfig(_SerializableMixin):
    n_electrodes: int = 512   # spikePow(+tx4) channels into the codec
    C: int = 256              # conv width
    D: int = 64               # latent/codebook dim
    codebook_size: int = 1024
    strides: tuple = (2, 2)   # two stride-2 encoder blocks => 4x temporal downsample

    # VectorQuantize knobs (reference:models/vq_brain.py:184-193)
    commitment_weight: float = 0.25
    use_cosine_sim: bool = True
    kmeans_init: bool = True
    ema_decay: float = 0.8          # vector_quantize_pytorch default decay
    threshold_ema_dead_code: float = 2.0
    eps: float = 1e-5


# ---------------------------------------------------------------------------
# Franky (brain prefix -> GPT-2) composite
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FrankyConfig(_SerializableMixin):
    """Composite config (reference:notebooks_trainer/franky_baseline_gpt2.ipynb cell 5)."""

    brain: PerceiverConfig = field(
        default_factory=lambda: PerceiverConfig(
            encoder=MAEConfig(window_size=768, patch_size=32),
            n_output_tokens=32,
            output_dim=768,
        )
    )
    gpt: GPTConfig = field(default_factory=GPTConfig)
    max_tokens: int = MAX_TOKENS
    # -100 label padding becomes this input id (reference uses 50256,
    # reference:franky_baseline_gpt2.ipynb cell 4)
    pad_token_id: int = GPT2_EOT


# ---------------------------------------------------------------------------
# Whisper-style seq2seq path (reference:notebooks/whisper_*.ipynb)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WhisperConfig(_SerializableMixin):
    """Whisper-tiny-like encoder/decoder geometry for the 80x3000 'fake mel' input."""

    n_mels: int = 80
    n_audio_ctx: int = 1500     # 3000 frames /2 after conv stride
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51864
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    dropout: float = 0.0

    # special tokens. -1 = unset (fall back to top-of-vocab placeholders);
    # params_from_hf_whisper fills the REAL ids from the HF config so an
    # imported checkpoint decodes with the true
    # <|startoftranscript|>... prompt (reference:whisper_hugging_face.ipynb
    # cells 5-27 decode through the HF processor)
    decoder_start_token_id: int = -1
    eos_token_id: int = -1
    pad_token: int = -1
    # full decoder prompt: (sot, lang?, task?, notimestamps?) — HF
    # forced_decoder_ids flattened behind decoder_start_token_id
    sot_sequence: tuple = ()


# ---------------------------------------------------------------------------
# Trainer (reference:utils/train_utils.py:12-37)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig(_SerializableMixin):
    exp_name: str = "default"

    batch_size: int = 256          # GLOBAL batch (split across data shards)
    grad_accum: int = 1

    # per-sample probability of a random time-masking augmentation on the
    # brain signal (the reference declares this knob but never implements an
    # augmentation, reference:utils/train_utils.py:22 — here it is real:
    # see trainer.augment_batch)
    p_augs: float = 0.0

    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # True => decay only params with ndim >= 2 (matmul weights + embeddings),
    # never biases/norm scales — nanoGPT's configure_optimizers grouping
    # (reference:models/gpt2_model.py:286-310). False => torch-AdamW decay on
    # everything, which is what run_train_model uses
    # (reference:utils/train_utils.py:117-119).
    weight_decay_mask: bool = False

    max_steps: int = 100_000
    eval_interval: int = 1_000

    use_scheduler: bool = True
    warmup_iters: int = 2_000
    lr_decay_iters: int = 50_000

    grad_clip: float = 1.0         # clip by VALUE (reference uses clip_grad_value_)
    # bf16 compute on TPU (reference: fp16 AMP). Consumed by the train step —
    # float batch inputs are cast to bf16 before the forward — and by
    # train.py, which constructs models with dtype=bf16 iff this is set.
    mixed_precision: bool = True

    seed: int = 42
    log_interval: int = 10
    keep_checkpoints: int = 3

    # optimizer steps executed inside ONE dispatched program (a lax.scan
    # over step-stacked batches). >1 amortizes the fixed per-dispatch cost
    # of a remote/tunneled TPU and removes per-step host round trips;
    # logging/eval cadence is preserved (boundaries checked per dispatch).
    # Numerics match the single-step loop to f32 reassociation tolerance
    # (property-tested; the rng stream is identical).
    steps_per_dispatch: int = 1

    # mesh geometry: data x model
    mesh_shape: Optional[tuple] = None   # None => (n_devices, 1)

    # rematerialize activations in backward (jax.checkpoint) to fit bigger
    # batches in HBM
    remat: bool = False

    # ZeRO-3-style parameter/optimizer-state sharding over the data axis
    # (the reference is plain DDP; SURVEY.md §2.2 lists this as the optional
    # TPU-native extension)
    fsdp: bool = False
