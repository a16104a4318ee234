"""Mixture-of-Experts SwiGLU layer with expert parallelism, TPU-native.

Beyond-reference capability (the reference has no MoE): a GShard/Switch-style
sparsely-activated MLP designed for the XLA compilation model —

- routing, dispatch and combine are ALL dense einsums over one-hot tensors
  with STATIC shapes (tokens x experts x capacity). No gather/scatter, no
  data-dependent shapes: everything tiles onto the MXU and jits once;
- fixed expert capacity (``capacity_factor``): overflow tokens are dropped
  (their MoE contribution is zero and the residual connection carries them —
  Switch Transformer semantics);
- top-k routing (k=1 Switch, k=2 GShard default) with probability-weighted
  combine, normalized over the selected experts;
- Switch-style load-balancing auxiliary loss (mean gate x token fraction,
  scaled by n_experts; == 1.0 at perfect uniformity);
- expert parallelism ("ep") = shard the leading [E, ...] axis of the stacked
  expert weights over a mesh axis, and constrain the dispatched activations
  [E, C, D] the same way — XLA GSPMD inserts the all_to_all over ICI at the
  jit boundary. ``parallel/sharding.py:MOE_EP_RULES`` carries the placement;
  tests verify sharded == unsharded bit-for-bit on the 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

EXPERT_AXIS = "expert"


class MoESwiGLU(nn.Module):
    """Sparse SwiGLU MLP: y[token] = sum_{e in top-k} gate_e * SwiGLU_e(x).

    Input/output ``[B, T, dim]``. Returns ``(y, aux_loss)`` — add
    ``aux_weight * aux_loss`` to the training objective to keep experts
    balanced. ``mesh_axis`` (optional) names the mesh axis experts shard
    over; it only adds sharding CONSTRAINTS, the math is identical.
    """

    dim: int
    hidden_dim: int
    n_experts: int
    k: int = 2
    capacity_factor: float = 1.25
    mesh_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        n_tok = b * t
        e = self.n_experts
        cap = max(1, int(self.capacity_factor * n_tok * self.k / e))
        if t == 1:
            # single-position (cached decode) call: capacity is per-dispatch,
            # so the training-time factor would drop tokens a full forward
            # keeps and skew serving logits — make drops impossible instead
            cap = n_tok
        # enter the compute dtype HERE: callers hand over LayerNorm output,
        # which is f32 even for bf16 models (f32 norm params promote), and
        # everything downstream keys its dtype off xt — without this cast a
        # bf16 model's residual stream silently promotes to f32, which also
        # breaks the nn.scan carry-dtype contract in the GPT block stack
        xt = x.reshape(n_tok, d).astype(self.dtype)

        # ---- router (always f32: tiny, numerically sensitive) --------------
        wg = self.param("wg", nn.initializers.normal(0.02), (d, e),
                        jnp.float32)
        probs = jax.nn.softmax(xt.astype(jnp.float32) @ wg, axis=-1)  # [N, E]
        gate_vals, gate_idx = jax.lax.top_k(probs, self.k)            # [N, K]
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

        # ---- capacity assignment (static shapes) ---------------------------
        # choice slot (n, j): token n's j-th expert. Priority: all first
        # choices before any second choice (GShard), then token order.
        assign = jax.nn.one_hot(gate_idx, e, dtype=jnp.int32)         # [N,K,E]
        flat = assign.transpose(1, 0, 2).reshape(self.k * n_tok, e)   # [KN,E]
        pos_flat = jnp.cumsum(flat, axis=0) - flat                    # [KN,E]
        pos = (pos_flat.reshape(self.k, n_tok, e).transpose(1, 0, 2)
               * assign).sum(-1)                                      # [N,K]
        keep = pos < cap
        gate_vals = gate_vals * keep

        # dispatch[n, e, c] = 1 iff token n occupies slot c of expert e;
        # combine = gate-weighted dispatch
        slot = jax.nn.one_hot(jnp.where(keep, pos, cap), cap,
                              dtype=xt.dtype)                         # [N,K,C]
        disp_k = assign.astype(xt.dtype)[..., None] * slot[:, :, None, :]
        dispatch = disp_k.sum(1)                                      # [N,E,C]
        combine = (gate_vals.astype(xt.dtype)[..., None, None]
                   * disp_k).sum(1)                                   # [N,E,C]

        # ---- expert computation (stacked weights, batched einsum) ----------
        init = nn.initializers.normal(0.02)
        w1 = self.param("w1", init, (e, d, self.hidden_dim), jnp.float32)
        w3 = self.param("w3", init, (e, d, self.hidden_dim), jnp.float32)
        w2 = self.param("w2", init, (e, self.hidden_dim, d), jnp.float32)

        xe = jnp.einsum("nec,nd->ecd", dispatch, xt)                  # [E,C,D]
        xe = self._constrain(xe)
        cdt = self.dtype
        h = (nn.silu(jnp.einsum("ecd,edf->ecf", xe.astype(cdt),
                                w1.astype(cdt)))
             * jnp.einsum("ecd,edf->ecf", xe.astype(cdt), w3.astype(cdt)))
        ye = jnp.einsum("ecf,efd->ecd", h, w2.astype(cdt))            # [E,C,D]
        ye = self._constrain(ye)
        y = jnp.einsum("nec,ecd->nd", combine, ye.astype(xt.dtype))

        # ---- Switch load-balancing loss ------------------------------------
        # fraction of tokens whose FIRST choice is e x mean router prob of e
        first = jax.nn.one_hot(gate_idx[:, 0], e, dtype=jnp.float32)
        aux = e * jnp.sum(jnp.mean(first, axis=0) * jnp.mean(probs, axis=0))

        return y.reshape(b, t, d), aux

    def _constrain(self, a):
        """Pin the expert dim of [E, C, D] activations to the expert mesh
        axis (GSPMD then lowers dispatch/combine einsums to all_to_all)."""
        if self.mesh_axis is None:
            return a
        try:
            from jax.sharding import PartitionSpec as P
            return jax.lax.with_sharding_constraint(
                a, P(self.mesh_axis, None, None))
        except (ValueError, RuntimeError):  # no mesh in context
            return a
