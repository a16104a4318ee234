"""Training runtime: pjit train step, grad accumulation, bf16 policy,
warmup-cosine schedule, value clipping, periodic eval, best-val orbax
checkpoints, JSONL metrics.

TPU-native re-design of reference:utils/train_utils.py:93-261:
- the Accelerate DDP wrap + fp16 AMP becomes one jitted step over a
  ('data','model') Mesh with bf16 compute; the gradient all-reduce is the
  XLA-inserted psum at the jit boundary;
- ``clip_grad_value_(1.0)`` -> optax.clip(1.0) (elementwise value clip);
- grad accumulation is a lax.scan over microbatches inside the step (one
  optimizer update per global batch, same semantics as
  ``accelerator.accumulate``);
- checkpoints carry params + optimizer state + mutable collections + step
  (the reference saves weights only and cannot resume optimization,
  reference:train_utils.py:171).

The uniform model contract is the reference's: ``loss, pred = model(inputs,
labels, date_info)`` (reference:train_utils.py:138), adapted per-model by
``TrainableSpec``.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from pathlib import Path
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from frankenstein_tpu.config import TrainConfig
from frankenstein_tpu.parallel import mesh as mesh_lib
from frankenstein_tpu.train.schedule import make_lr_schedule
from frankenstein_tpu.utils.metrics import MetricLogger


@dataclasses.dataclass(frozen=True)
class TrainableSpec:
    """How to drive a model through the uniform (inputs, labels, date) call."""

    module: Any                      # linen module
    rng_names: Tuple[str, ...] = ()  # e.g. ('mask',) for MAE, ('vq',) for VQ-VAE
    mutable: Tuple[str, ...] = ()    # e.g. ('vq',) — threaded state collections
    needs_train_flag: bool = False   # pass train=True/False
    needs_labels: bool = True        # MAE variants ignore labels
    flops_per_sample: float = 0.0    # fwd FLOPs/sample; enables MFU logging

    def call_kwargs(self, train: bool):
        return {"train": train} if self.needs_train_flag else {}


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    extra: Any            # dict of mutable collections (possibly empty)
    step: jnp.ndarray


def make_optimizer(config: TrainConfig):
    """AdamW + value clip, lr driven by the warmup-cosine schedule.

    Default: weight decay applies to every parameter — torch AdamW semantics,
    what run_train_model uses (reference:train_utils.py:117-119). With
    ``config.weight_decay_mask``, only ndim>=2 params decay (matmul weights +
    embeddings; biases and norm scales don't) — nanoGPT's
    configure_optimizers grouping (reference:gpt2_model.py:286-310).
    """
    sched = make_lr_schedule(config)
    mask = ((lambda params: jax.tree_util.tree_map(
                 lambda p: jnp.ndim(p) >= 2, params))
            if config.weight_decay_mask else None)
    tx = optax.chain(
        optax.clip(config.grad_clip),
        optax.adamw(learning_rate=sched, b1=config.adam_b1, b2=config.adam_b2,
                    weight_decay=config.weight_decay, mask=mask),
    )
    return tx, sched


def augment_batch(batch, rng, p_augs: float, mask_frac: float = 1 / 16):
    """SpecAugment-style time masking on the brain signal.

    With probability ``p_augs`` per sample, zero a random contiguous span of
    ``mask_frac`` of the time axis of batch[0] ([B, T, C]). The reference's
    TrainConfig declares ``p_augs`` but implements no augmentation
    (reference:utils/train_utils.py:22); this makes the knob real.
    """
    x = batch[0]
    b, t = x.shape[0], x.shape[1]
    span = max(int(t * mask_frac), 1)
    r_apply, r_start = jax.random.split(rng)
    apply = jax.random.bernoulli(r_apply, p_augs, (b,))
    start = jax.random.randint(r_start, (b,), 0, t - span + 1)
    ti = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    in_span = (ti >= start[:, None]) & (ti < (start + span)[:, None])
    keep = ~(apply[:, None] & in_span)
    shaped = keep.reshape(keep.shape + (1,) * (x.ndim - 2))
    return (x * shaped.astype(x.dtype),) + tuple(batch[1:])


def init_state(spec: TrainableSpec, config: TrainConfig, sample_batch,
               seed: Optional[int] = None) -> Tuple[TrainState, Any]:
    """Initialize params/extra collections from one batch and build the tx."""
    tx, _ = make_optimizer(config)
    seed = config.seed if seed is None else seed
    rngs = {"params": jax.random.key(seed)}
    for i, name in enumerate(spec.rng_names):
        rngs[name] = jax.random.key(seed + 1 + i)
    x, y, d = sample_batch
    args = (jnp.asarray(x[:2]),) + ((jnp.asarray(y[:2]),) if spec.needs_labels else ())
    variables = spec.module.init(rngs, *args, **spec.call_kwargs(train=False))
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k not in ("params",)}
    state = TrainState(params=params, opt_state=tx.init(params), extra=extra,
                       step=jnp.zeros((), jnp.int32))
    return state, tx


def _forward(spec: TrainableSpec, params, extra, batch, rngs, *, train: bool):
    x, y, d = batch
    args = (x,) + ((y,) if spec.needs_labels else ())
    variables = {"params": params, **extra}
    mutable = list(spec.mutable) + (["aux"] if train else [])
    out, mutated = spec.module.apply(
        variables, *args, date_info=d, rngs=rngs, mutable=mutable,
        **spec.call_kwargs(train))
    loss = out[0]
    aux = {}
    if "aux" in mutated:
        aux = {k: jnp.mean(jnp.asarray(v)) for k, v in
               flax.traverse_util.flatten_dict(mutated["aux"], sep="/").items()}
        mutated = {k: v for k, v in mutated.items() if k != "aux"}
    new_extra = {**extra, **mutated}
    return loss, new_extra, aux


def make_train_step(spec: TrainableSpec, tx, config: TrainConfig,
                    n_steps: int = 1):
    """Build the jitted step. With ``n_steps > 1`` the returned function
    takes STEP-STACKED batches ([n_steps, B, ...] leaves) and runs that many
    optimizer steps inside one dispatched ``lax.scan`` — same numerics as
    n_steps separate calls (each inner step folds its rng from state.step),
    but one dispatch + zero host round trips for the whole group. Returns
    the LAST step's (loss, aux), matching what the single-step loop logs."""
    accum = max(config.grad_accum, 1)

    def split_rngs(rng, i):
        return {name: jax.random.fold_in(jax.random.fold_in(rng, i), h)
                for h, name in enumerate(spec.rng_names)}

    def train_step(state: TrainState, batch, rng):
        # ``rng`` is a BASE key: the per-step key derives from state.step
        # INSIDE the jit. The host loop passes the same key object every
        # step, so there is no per-step host-side jax.random.split — on a
        # remote-dispatch backend (axon tunnel) that split alone costs a
        # ~33 ms dispatch per step.
        rng = jax.random.fold_in(rng, state.step)
        if config.p_augs > 0.0:
            rng, aug_rng = jax.random.split(rng)
            batch = augment_batch(batch, aug_rng, config.p_augs)
        if config.mixed_precision:
            # cast float inputs to bf16 at the jit boundary (params stay
            # fp32; the reference's fp16-AMP analog, reference:train_utils.py:97)
            batch = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, batch)

        def loss_fn(params, micro, extra, i):
            fwd = functools.partial(_forward, spec, train=True)
            if config.remat:
                # trade FLOPs for activation memory (jax.checkpoint)
                fwd = jax.checkpoint(fwd, static_argnums=())
            loss, new_extra, aux = fwd(params, extra, micro, split_rngs(rng, i))
            return loss, (new_extra, aux)

        if accum == 1:
            (loss, (extra, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, state.extra, 0)
        else:
            micro = jax.tree_util.tree_map(
                lambda a: a.reshape((accum, a.shape[0] // accum) + a.shape[1:]),
                batch)

            def scan_body(carry, im):
                i, m = im
                gsum, lsum, extra = carry
                (l, (new_extra, aux)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, m, extra, i)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (gsum, lsum + l, new_extra), aux

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, lsum, extra), auxs = jax.lax.scan(
                scan_body, (zeros, 0.0, state.extra),
                (jnp.arange(accum), micro))
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            loss = lsum / accum
            aux = jax.tree_util.tree_map(jnp.mean, auxs)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, extra=extra,
                               step=state.step + 1)
        gnorm = optax.global_norm(grads)
        return new_state, loss, {"grad_norm": gnorm, **aux}

    if n_steps == 1:
        return jax.jit(train_step, donate_argnums=(0,))

    def multi_step(state: TrainState, batches, rng):
        def body(st, b):
            st, loss, aux = train_step(st, b, rng)
            return st, (loss, aux)
        state, (losses, auxs) = jax.lax.scan(body, state, batches)
        last = jax.tree_util.tree_map(lambda a: a[-1], auxs)
        return state, losses[-1], last

    return jax.jit(multi_step, donate_argnums=(0,))


def make_eval_step(spec: TrainableSpec):
    def eval_step(state: TrainState, batch, rng):
        rngs = {name: jax.random.fold_in(rng, h)
                for h, name in enumerate(spec.rng_names)}
        loss, _, _ = _forward(spec, state.params, state.extra, batch, rngs,
                              train=False)
        return loss

    return jax.jit(eval_step)


def run_train_model(spec: TrainableSpec, datasets, config: TrainConfig,
                    project_name: str = "transformer",
                    save_folder: Path = Path("logs"),
                    mesh=None,
                    hooks: Optional[Callable] = None,
                    eval_metric: Optional[Callable] = None,
                    resume: bool = False,
                    init_params_transform: Optional[Callable] = None
                    ) -> TrainState:
    """Step-based training loop (reference:utils/train_utils.py:93-186):
    infinite epochs over the train loader, eval every ``eval_interval`` steps,
    best-val checkpoint, stop at ``max_steps`` (a multi-step dispatch group
    cannot stop mid-group, so overshoot is < config.steps_per_dispatch).

    ``eval_metric(state, step) -> float``: when given, checkpoint selection
    uses this (lower is better) instead of the val loss — e.g. a WER hook,
    mirroring the HF trainer's ``metric_for_best_model="wer"``
    (reference:whisper_hugging_face.ipynb cell 19)."""
    from frankenstein_tpu.data.datasets import batch_iterator
    from frankenstein_tpu.train import checkpoints as ckpt_lib

    mesh = mesh or mesh_lib.make_mesh(config.mesh_shape)
    train_ds, val_ds = datasets
    save_dir = Path(save_folder) / config.exp_name
    save_dir.mkdir(parents=True, exist_ok=True)
    (save_dir / "train_config.json").write_text(config.to_json())

    logger = MetricLogger(save_dir / "metrics.jsonl", project=project_name)
    from frankenstein_tpu.data.loader import prefetch, stack_steps, to_device
    # device_put INSIDE the prefetch thread: the host->device copy of the
    # next batch overlaps the current step's compute instead of blocking
    # the dispatch (on a slow host link — e.g. this harness's ~87 MB/s
    # tunnel — the copy would otherwise dominate the step wall-clock)
    k_steps = max(config.steps_per_dispatch, 1)
    host_iter = batch_iterator(train_ds, config.batch_size,
                               shuffle=True, seed=config.seed)
    if k_steps > 1:
        host_iter = stack_steps(host_iter, k_steps)
    train_iter = prefetch(to_device(host_iter))

    sample = next(iter(batch_iterator(train_ds, min(config.batch_size, 8),
                                      shuffle=False, epochs=1)))
    state, tx = init_state(spec, config, sample)

    # warm-start hook (e.g. checkpoints.graft_encoder_from_mae for the
    # MAE -> Franky/FrankyLlama transfer): rewrites params BEFORE
    # sharding/replication; the freshly-initialized optimizer state is
    # shape-compatible (Adam moments are zeros of the param shapes)
    if init_params_transform is not None:
        state = state.replace(params=init_params_transform(state.params))

    # auto-resume: pick up the best prior checkpoint, params + OPT STATE +
    # step (the reference can only reload weights, reference:train_utils.py:171)
    if resume:
        prior = ckpt_lib.best_checkpoint(save_dir)
        if prior is not None:
            state = ckpt_lib.restore_checkpoint(prior, state)
            print(f"resumed from {prior.name} at step {int(state.step)}")

    if config.fsdp:
        from frankenstein_tpu.parallel import sharding as shard_lib
        state = TrainState(
            params=shard_lib.shard_params_fsdp(mesh, state.params),
            opt_state=shard_lib.shard_params_fsdp(mesh, state.opt_state),
            extra=mesh_lib.replicate(mesh, state.extra),
            step=jax.device_put(state.step, mesh_lib.replicated(mesh)))
    else:
        state = mesh_lib.replicate(mesh, state)

    train_step = make_train_step(spec, tx, config, n_steps=k_steps)
    eval_step = make_eval_step(spec)
    _, sched = make_optimizer(config)

    rng = jax.random.key(config.seed)
    best_val = float("inf")
    # ONE device fetch to learn the resume point; from here the loop keeps a
    # host-side counter. int(state.step)/float(loss) every step would cost
    # two synchronous tunnel round trips per step on a remote TPU — measured
    # 1.23 s/step vs ~0.3 s of device compute on this harness's axon link.
    step = int(state.step)
    t0 = time.perf_counter()
    tokens_seen = 0     # samples since the timing origin (post-warmup)
    steps_timed = 0     # steps since the timing origin
    warmed_up = False   # first step includes compile — excluded from rates

    def _check_finite(loss_f: float):
        # failure detection: a NaN/inf loss poisons every later step — stop
        # loudly instead of silently training garbage. Checked at every loss
        # FETCH (log steps + loop end): a non-finite loss persists, so
        # detection latency is <= log_interval steps and the loop never pays
        # a per-step device sync for it.
        if not np.isfinite(loss_f):
            logger.log(step, {"train/loss": loss_f, "fatal": 1.0})
            raise FloatingPointError(
                f"non-finite train loss at step {step}: {loss_f}")

    def crossed(interval: int) -> bool:
        # "step hit a multiple of interval inside this dispatch group" —
        # reduces to step % interval == 0 when k_steps == 1
        return (step // interval) > ((step - k_steps) // interval)

    loss = None
    with mesh:
        for batch in train_iter:
            if step >= config.max_steps:
                # a multi-step dispatch cannot stop mid-group, so the loop
                # stops once the counter REACHES max_steps — overshoot is
                # bounded by k_steps - 1, never a whole extra group
                break
            sharded = mesh_lib.shard_batch(
                mesh, batch, batch_axis=1 if k_steps > 1 else 0)
            state, loss, aux = train_step(state, sharded, rng)
            step += k_steps
            if not warmed_up:
                # value fetch = the only real sync on axon; restart the
                # timing origin so compile time never pollutes MFU. The
                # log/eval boundary checks below STILL run for this group
                # (a boundary inside the first dispatch must not vanish).
                _check_finite(float(loss))
                warmed_up = True
                t0 = time.perf_counter()
            else:
                tokens_seen += (batch[0].shape[0] if k_steps == 1
                                else k_steps * batch[0].shape[1])
                steps_timed += k_steps

            if crossed(config.log_interval):
                loss_f = float(loss)
                _check_finite(loss_f)
                dt = time.perf_counter() - t0
                metrics = {
                    "train/loss": loss_f,
                    "lr": float(sched(step)),
                    "grad_norm": float(aux.get("grad_norm", 0.0)),
                    **{k: float(v) for k, v in aux.items() if k != "grad_norm"},
                }
                if steps_timed:  # rate meters undefined inside the warm-up
                    metrics["samples_per_sec"] = tokens_seen / max(dt, 1e-9)
                if spec.flops_per_sample and steps_timed:
                    from frankenstein_tpu.utils import profiling
                    # fwd+bwd ~ 3x fwd FLOPs (PaLM App. B convention)
                    metrics["mfu"] = profiling.estimate_mfu(
                        3 * spec.flops_per_sample * tokens_seen / steps_timed,
                        dt / steps_timed)
                logger.log(step, metrics)

            if crossed(config.eval_interval):
                # drain the in-flight train dispatch BEFORE starting the
                # eval clock — otherwise its compute time is excluded from
                # the throughput clock below and samples/sec reads high
                _check_finite(float(loss))
                eval_t0 = time.perf_counter()
                val_losses = []
                for vb in batch_iterator(val_ds, config.batch_size,
                                         shuffle=False, epochs=1):
                    vsharded = mesh_lib.shard_batch(mesh, vb)
                    val_losses.append(float(eval_step(state, vsharded, rng)))
                mean_val = float(np.mean(val_losses)) if val_losses else float("nan")
                logger.log(step, {"val/loss": mean_val})
                print(f"step {step}: train {float(loss):.4f} val {mean_val:.4f}")
                select = mean_val
                if eval_metric is not None:
                    select = float(eval_metric(state, step))
                    logger.log(step, {"val/metric": select})
                if select < best_val:
                    best_val = select
                    ckpt_lib.save_checkpoint(save_dir, state, step, select,
                                             keep=config.keep_checkpoints)
                if hooks:
                    hooks(state, step)
                # eval + checkpointing are not training throughput — keep
                # them out of the samples/sec + MFU clock
                t0 += time.perf_counter() - eval_t0
        if loss is not None:
            _check_finite(float(loss))
    return state
