"""Tensor-parallel sharding rules: param-path patterns -> PartitionSpecs.

Megatron-style TP over the 'model' mesh axis: column-split the q/k/v (and
gate/up, c_attn, c_fc) projections, row-split the output (o_proj, down_proj,
c_proj) projections, split embedding/head tables on the vocab axis. XLA
inserts the all-reduce over ICI after each row-parallel matmul at the pjit
boundary — no hand-written collectives.

Layer-scanned modules carry a leading [L] axis on every block param, so block
rules target the last two dims.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL = "col"   # split output features: [.., in, out] -> P(..., None, 'model')
ROW = "row"   # split input features:  [.., in, out] -> P(..., 'model', None)
VOCAB = "vocab"  # split dim 0 of an embedding table
EXPERT = "expert"  # split dim 0 of stacked [E, ...] MoE expert weights
EXPERT_SCAN = "expert_scan"  # dim 1 of layer-scanned [L, E, ...] stacks

# pattern (regex over '/'-joined path) -> rule
LLAMA_TP_RULES: Sequence[Tuple[str, str]] = (
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", COL),
    (r".*(o_proj|down_proj)/kernel$", ROW),
    (r".*(embed|lm_head)$", VOCAB),
)

# expert parallelism for models/moe.py:MoESwiGLU — stacked [E, d, f] expert
# weights shard on the expert axis; the tiny router wg replicates. Inside a
# layer-scanned LM (GPTConfig/LlamaConfig moe_experts>0) the stack carries a
# leading [L] axis, so the expert axis is dim 1.
MOE_EP_RULES: Sequence[Tuple[str, str]] = (
    (r".*/moe/(w1|w2|w3)$", EXPERT_SCAN),
    (r".*/(w1|w2|w3)$", EXPERT),
)

GPT2_TP_RULES: Sequence[Tuple[str, str]] = (
    (r".*(c_attn|c_fc)/kernel$", COL),
    (r".*(c_proj|mlp_c_proj)/kernel$", ROW),
    (r".*wte$", VOCAB),
)


def spec_for(path: str, shape, rules) -> P:
    for pattern, kind in rules:
        if re.match(pattern, path):
            ndim = len(shape)
            if kind == COL:
                return P(*([None] * (ndim - 1) + ["model"]))
            if kind == ROW:
                return P(*([None] * (ndim - 2) + ["model", None]))
            if kind in (VOCAB, EXPERT):
                return P(*(["model"] + [None] * (ndim - 1)))
            if kind == EXPERT_SCAN:
                return P(*([None, "model"] + [None] * (ndim - 2)))
    return P()  # replicate


def fsdp_spec(shape, mesh: Mesh, min_size: int = 2 ** 16) -> P:
    """ZeRO-3-style placement: shard the largest divisible dim of big params
    over 'data'; small params replicate. XLA all-gathers at use sites."""
    dsize = mesh.shape.get("data", 1)
    import numpy as _np
    if dsize <= 1 or _np.prod(shape) < min_size:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % dsize == 0:
            spec = [None] * len(shape)
            spec[d] = "data"
            return P(*spec)
    return P()


def shard_params_fsdp(mesh: Mesh, tree, min_size: int = 2 ** 16):
    """device_put a pytree (params or optimizer state) with FSDP placement."""
    def place(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(x.shape, mesh, min_size)))
    return jax.tree_util.tree_map(place, tree)


def shard_params(mesh: Mesh, params, rules=LLAMA_TP_RULES):
    """device_put every param with its TP sharding (replicated over 'data')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, x):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        spec = spec_for(name, x.shape, rules)
        # guard: axis size must divide the sharded dim
        msize = mesh.shape.get("model", 1)
        for dim, ax in enumerate(spec):
            if ax == "model" and x.shape[dim] % msize != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    leaves = {tuple(p): place(p, x) for p, x in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [leaves[tuple(p)] for p, _ in flat])
