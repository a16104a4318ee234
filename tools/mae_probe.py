"""MAE training-step attribution on the real TPU (VERDICT r3 weak #5).

Round-1/3 measured MAE pretraining at ~0.09 train MFU with "the dense
6144-token decoder dominates" as an untested hypothesis. This probe prices
the step's pieces at the flagship MAE geometry (window 768, patch 32 ->
6144 tokens; encoder sees the 1536 kept tokens via the gathered kernel,
the decoder attends DENSELY over all 6144, models/brainformer.py:201 /
reference:models/brainformer.py:415-486):

  mae_fwd        - full MAE loss forward
  mae_fwd_bwd    - loss + grads (the training step minus optimizer)
  dec_fwd[_bwd]  - the 4 dense decoder Blocks alone on [B, 6144, 256]

Methodology is bench.py's n-trip fori_loop differencing (fresh fold_in key
per iteration, value-fetch sync). Run: python tools/mae_probe.py [batch]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch: int = 32):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    import bench
    from frankenstein_tpu.config import MAEConfig
    from frankenstein_tpu.models import brainformer, layers

    cfg = MAEConfig(window_size=768, n_electrodes=256, patch_size=32)
    mae = brainformer.MAE(cfg, dtype=jnp.bfloat16)
    t = (cfg.window_size // cfg.patch_size) * cfg.n_electrodes

    x1 = jnp.zeros((1, cfg.window_size, cfg.n_electrodes), jnp.float32)
    params = jax.jit(lambda: mae.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x1))()

    class DecoderOnly(nn.Module):
        """The MAE decoder stack in isolation: 4 dense Blocks + MSE head."""
        cfg: MAEConfig

        @nn.compact
        def __call__(self, tok):
            c = self.cfg
            for i in range(c.n_dec_layers):
                tok = layers.Block(c.decoder_dim, c.n_heads, c.head_dim,
                                   c.hidden_dim, dtype=jnp.bfloat16,
                                   name=f"dec_{i}")(tok)
            return jnp.mean(jnp.square(tok.astype(jnp.float32)))

    dec = DecoderOnly(cfg)
    tok1 = jnp.zeros((1, t, cfg.decoder_dim), jnp.bfloat16)
    dec_params = jax.jit(lambda: dec.init(jax.random.key(2), tok1))()

    def mae_fwd(params, key):
        x = jax.random.normal(key, (batch, cfg.window_size, cfg.n_electrodes),
                              jnp.float32)
        loss, _ = mae.apply(params, x, rngs={"mask": key})
        return loss[None]

    def mae_fwd_bwd(params, key):
        x = jax.random.normal(key, (batch, cfg.window_size, cfg.n_electrodes),
                              jnp.float32)
        loss, grads = jax.value_and_grad(
            lambda p: mae.apply(p, x, rngs={"mask": key})[0])(params)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree_util.tree_leaves(grads))
        return (loss + 0.0 * gn)[None]

    def dec_fwd(params, key):
        tok = jax.random.normal(key, (batch, t, cfg.decoder_dim),
                                jnp.bfloat16)
        return dec.apply(params, tok)[None]

    def dec_fwd_bwd(params, key):
        tok = jax.random.normal(key, (batch, t, cfg.decoder_dim),
                                jnp.bfloat16)
        loss, grads = jax.value_and_grad(
            lambda p: dec.apply(p, tok))(params)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree_util.tree_leaves(grads))
        return (loss + 0.0 * gn)[None]

    out = {"batch": batch, "tokens": t}
    for name, fn, p in (("mae_fwd", mae_fwd, params),
                        ("mae_fwd_bwd", mae_fwd_bwd, params),
                        ("dec_fwd", dec_fwd, dec_params),
                        ("dec_fwd_bwd", dec_fwd_bwd, dec_params)):
        bench._PARAMS[0] = p
        s = bench._bench(fn, 4)
        out[name + "_ms"] = round(s * 1000, 1)
        print(f"[mae_probe] {name}: {s * 1000:.1f} ms", file=sys.stderr,
              flush=True)
    out["decoder_share_fwd"] = round(out["dec_fwd_ms"] / out["mae_fwd_ms"], 3)
    out["decoder_share_step"] = round(
        out["dec_fwd_bwd_ms"] / out["mae_fwd_bwd_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
