"""Attention backward pricing on the real TPU (round 4, packed backward).

At the flagship training shape (b=32, t=6144, e=256, h=8, d=32) times the
rope-fused attention forward and forward+backward, for both the packed
backward (_bwd_packed) and the per-head triangle fallback (_bwd), using
bench.py's n-trip fori_loop differencing.

Floor arithmetic: the packed backward issues 7 block-diagonal dots per
pair-set vs the forward's 2 (dq pass: s, dP, dQ; dkv pass: sT, dPT, dV,
dK), so its MXU floor is ~3.5x the forward's dots-only time plus a 2x
softmax recompute. Run: python tools/bwd_probe.py [batch]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 32):
    import jax
    import jax.numpy as jnp

    import bench
    from frankenstein_tpu.ops import rope as rope_ops
    from frankenstein_tpu.ops.pallas import block_attention as ba

    t, e, h, d, block = 6144, 256, 8, 32, 256
    cache = rope_ops.build_rope_cache(d, t)

    def mk(key):
        ks = jax.random.split(key, 3)
        mkx = lambda k: (jax.random.normal(k, (batch, t, e), jnp.bfloat16)
                         * 0.1)
        return mkx(ks[0]), mkx(ks[1]), mkx(ks[2])

    def fwd(params, key):
        q, k, v = mk(key)
        out = ba.slab_causal_attention_rope(q, k, v, block, cache, h)
        return jnp.sum(out.astype(jnp.float32))[None]

    def fwd_bwd(params, key):
        q, k, v = mk(key)

        def loss(q, k, v):
            out = ba.slab_causal_attention_rope(q, k, v, block, cache, h)
            return jnp.sum(out.astype(jnp.float32))

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in grads)
        return (l + 0.0 * gn)[None]

    bench._PARAMS[0] = ()
    out = {"batch": batch, "t": t, "heads": h, "d": d}
    fwd_s = bench._bench(fwd, 6)
    out["fwd_ms"] = round(fwd_s * 1000, 1)
    print(f"[bwd_probe] fwd: {fwd_s * 1000:.1f} ms", file=sys.stderr,
          flush=True)

    for name, forced in (("packed", None), ("per_head", False)):
        saved = ba._bwd_packed_supported
        if forced is False:
            ba._bwd_packed_supported = lambda *a, **k: False
        try:
            s = bench._bench(fwd_bwd, 6, key0=200 + (0 if forced is None
                                                     else 50))
        finally:
            ba._bwd_packed_supported = saved
        out[f"fwd_bwd_{name}_ms"] = round(s * 1000, 1)
        out[f"bwd_{name}_ms"] = round((s - fwd_s) * 1000, 1)
        print(f"[bwd_probe] fwd+bwd ({name}): {s * 1000:.1f} ms",
              file=sys.stderr, flush=True)
    out["bwd_vs_fwd_dots"] = round(
        out["bwd_packed_ms"] / (out["fwd_ms"] * 0.8), 2)  # dots ~80% of fwd
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
