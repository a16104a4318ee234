"""MoE capacity-factor sweep on the real TPU (round-4 backlog item).

The capacity factor sets the STATIC expert buffer ``C = cap * N * k / E``
(models/moe.py): larger caps mean fewer dropped tokens (better quality on a
trained router) but strictly more einsum FLOPs and memory — the sweep
prices that trade on the moe-gpt flagship so the default (1.25, the GShard
choice) is a measured decision, not folklore.

Also reports the drop fraction each cap produces on the (random-init,
roughly-balanced) router at the sweep batch — the floor of what a trained,
aux-loss-balanced router would drop.

Run on the real TPU: python tools/moe_capacity_sweep.py [--caps 1.0,1.25,2.0]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def drop_fraction(batch: int, cap: float, *, seq: int = 57, dim: int = 768,
                  n_experts: int = 8, k: int = 2, seed: int = 0) -> float:
    """Fraction of routed (token, choice) slots the capacity cap drops in
    one standalone MoESwiGLU forward on random activations at the moe-gpt
    token count (batch x (32 prefix + 25 text)) — the random-router floor
    of what a trained, aux-balanced router would drop. Recomputes the
    layer's own routing math (same cumsum priority) up to the keep mask,
    eagerly (outside any scan trace)."""
    import jax
    import jax.numpy as jnp

    from frankenstein_tpu.models.moe import MoESwiGLU

    n_tok = batch * seq
    c = max(1, int(cap * n_tok * k / n_experts))
    moe = MoESwiGLU(dim=dim, hidden_dim=4 * dim, n_experts=n_experts, k=k,
                    capacity_factor=cap)
    x = jax.random.normal(jax.random.key(seed), (batch, seq, dim),
                          jnp.float32)
    params = moe.init(jax.random.key(1), x)
    wg = params["params"]["wg"]
    probs = jax.nn.softmax(x.reshape(n_tok, dim) @ wg, axis=-1)
    _, gate_idx = jax.lax.top_k(probs, k)
    assign = jax.nn.one_hot(gate_idx, n_experts, dtype=jnp.int32)
    flat = assign.transpose(1, 0, 2).reshape(k * n_tok, n_experts)
    pos_flat = jnp.cumsum(flat, axis=0) - flat
    pos = (pos_flat.reshape(k, n_tok, n_experts).transpose(1, 0, 2)
           * assign).sum(-1)
    keep = pos < c
    return 1.0 - float(jnp.sum(keep)) / float(keep.size)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--caps", default="1.0,1.25,2.0")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--dispatches", type=int, default=6)
    args = p.parse_args()

    from frankenstein_tpu.config import TrainConfig
    from frankenstein_tpu.data import datasets, tokenizers
    import train as train_cli
    from tools.train_sweep import run_cell

    tok_fn = tokenizers.get_tokenizer(tokenizers.best_available_tokenizer())
    ds = datasets.BrainDataset.synthetic(n_trials=64, seed=0,
                                         tokenize_function=tok_fn,
                                         n_electrodes=256, max_input_len=768)
    batch = next(iter(datasets.batch_iterator(ds, args.batch, shuffle=False,
                                              epochs=1)))

    rows = []
    for cap in [float(s) for s in args.caps.split(",")]:
        ns = argparse.Namespace(model="moe-gpt", window=768, patch=32,
                                channels=256, dropout=0.0, bf16=True,
                                moe_experts=8, moe_k=2, moe_capacity=cap,
                                config=None)
        spec, _ = train_cli.build_model(ns)
        tcfg = TrainConfig(batch_size=args.batch, grad_accum=1, remat=False,
                           learning_rate=1e-3, warmup_iters=0,
                           use_scheduler=False, mixed_precision=True,
                           steps_per_dispatch=args.k)
        print(f"[sweep] capacity={cap}...", file=sys.stderr, flush=True)
        row = run_cell(spec, tcfg, batch, k_steps=args.k,
                       m_dispatch=args.dispatches)
        row["moe_capacity"] = cap
        row["drop_fraction_random_router"] = round(
            drop_fraction(args.batch, cap), 4)
        print(json.dumps(row), flush=True)
        rows.append(row)
    print(json.dumps({"moe_capacity_sweep": rows}), flush=True)


if __name__ == "__main__":
    main()
