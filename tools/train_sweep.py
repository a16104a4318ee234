"""Training-efficiency sweep on the real TPU (VERDICT r3 weak #5).

Sweeps flagship-Franky training over batch {16, 32, 64} x remat {off, on}
at K=4 steps/dispatch and reports sustained samples/sec + analytic MFU per
cell, using the axon-safe protocol from train/trainer.py: one warm-up
dispatch (compile, excluded), then M multi-step dispatches timed between
two value fetches. The batch is generated once and device-resident (host->
device is ~87 MB/s here); the carry (state) changes every dispatch so the
tunnel memo never serves a repeat.

The reference's training loop is reference:utils/train_utils.py:93-186
(torch AMP + grad clip, batch 256 in the notebooks); the MFU ceiling
argument this sweep supports lives in BASELINE.md.

Run on the real TPU: python tools/train_sweep.py [--cells b,remat ...]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_cell(spec, tcfg, batch_host, *, k_steps: int, m_dispatch: int):
    import jax
    import jax.numpy as jnp

    from frankenstein_tpu.parallel import mesh as mesh_lib
    from frankenstein_tpu.train import trainer

    b = batch_host[0].shape[0]
    state, tx = trainer.init_state(spec, tcfg, batch_host)
    step = trainer.make_train_step(spec, tx, tcfg, n_steps=k_steps)
    mesh = mesh_lib.make_mesh((1, 1), devices=jax.devices()[:1])
    state = mesh_lib.replicate(mesh, state)

    # one device-resident step-stacked batch, reused across dispatches
    # (throughput measurement; state evolves so dispatches are not memoized)
    dev = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (k_steps,) + a.shape) if k_steps > 1
        else jnp.asarray(a), batch_host)

    with mesh:
        sharded = mesh_lib.shard_batch(mesh, dev,
                                       batch_axis=1 if k_steps > 1 else 0)
        state, loss, _ = step(state, sharded, jax.random.key(0))
        float(loss)                                  # compile + warm fetch
        t0 = time.perf_counter()
        for _ in range(m_dispatch):
            state, loss, _ = step(state, sharded, jax.random.key(0))
        loss_f = float(loss)                         # the only sync
        dt = time.perf_counter() - t0
    assert jnp.isfinite(loss_f), f"non-finite loss in sweep cell: {loss_f}"

    n_steps = m_dispatch * k_steps
    samples = n_steps * b
    out = {"batch": b, "remat": tcfg.remat, "k_steps": k_steps,
           "steps_timed": n_steps,
           "samples_per_sec": round(samples / dt, 1)}
    if spec.flops_per_sample:
        from frankenstein_tpu.utils import profiling
        out["mfu"] = round(profiling.estimate_mfu(
            3 * spec.flops_per_sample * b, dt / n_steps), 4)
    return out


def main():
    import argparse

    import jax.numpy as jnp

    from frankenstein_tpu.config import TrainConfig
    from frankenstein_tpu.data import datasets, tokenizers
    import train as train_cli

    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,32,64")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--dispatches", type=int, default=8)
    p.add_argument("--model", default="franky")
    args = p.parse_args()

    ns = argparse.Namespace(model=args.model, window=768, patch=32,
                            channels=256, dropout=0.0, bf16=True,
                            moe_experts=8, moe_k=2, config=None)
    spec, _ = train_cli.build_model(ns)

    tok_fn = tokenizers.get_tokenizer(tokenizers.best_available_tokenizer())
    ds = datasets.BrainDataset.synthetic(n_trials=128, seed=0,
                                         tokenize_function=tok_fn,
                                         n_electrodes=256, max_input_len=768)

    rows = []
    for b in [int(s) for s in args.batches.split(",")]:
        batch = next(iter(datasets.batch_iterator(ds, b, shuffle=False,
                                                  epochs=1)))
        for remat in (False, True):
            tcfg = TrainConfig(batch_size=b, grad_accum=1, remat=remat,
                               learning_rate=1e-3, warmup_iters=0,
                               use_scheduler=False, mixed_precision=True,
                               steps_per_dispatch=args.k)
            print(f"[sweep] batch={b} remat={remat}...", file=sys.stderr,
                  flush=True)
            try:
                row = run_cell(spec, tcfg, batch, k_steps=args.k,
                               m_dispatch=args.dispatches)
            except Exception as err:  # OOM cells report, don't kill the sweep
                row = {"batch": b, "remat": remat, "k_steps": args.k,
                       "error": f"{type(err).__name__}: "
                                f"{str(err).splitlines()[0][:200]}"}
            print(json.dumps(row), flush=True)
            rows.append(row)
    print(json.dumps({"train_sweep": rows}), flush=True)


if __name__ == "__main__":
    main()
