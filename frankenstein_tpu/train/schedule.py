"""LR schedule: linear warmup -> cosine decay -> floor at lr/10
(reference:utils/train_utils.py:49-72)."""

from __future__ import annotations

import jax.numpy as jnp

from frankenstein_tpu.config import TrainConfig


def make_lr_schedule(config: TrainConfig):
    lr = config.learning_rate
    warm = config.warmup_iters
    decay = config.lr_decay_iters
    min_lr = lr / 10

    def get_lr(step):
        step = jnp.asarray(step, jnp.float32)
        if not config.use_scheduler:
            return jnp.full_like(step, lr)
        warm_lr = lr * step / max(warm, 1)
        ratio = jnp.clip((step - warm) / max(decay - warm, 1), 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
        cos_lr = min_lr + coeff * (lr - min_lr)
        return jnp.where(step < warm, warm_lr,
                         jnp.where(step > decay, min_lr, cos_lr))

    return get_lr
