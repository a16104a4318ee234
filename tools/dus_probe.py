"""Is the per-step KV-cache dynamic_update_slice copying?

chain_attr measured +8.5 ms/25-token-batch (+0.34 ms/token) for the two
cache DUS writes at b=128 — in-place DUS should cost ~0 (2.4 MB of row
writes). 0.34 ms at 819 GB/s is ~280 MB ≈ one full cache copy per step.
This probe times DUS-only scan bodies at several cache sizes and layouts to
pin the mechanism. Run on TPU: python tools/dus_probe.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    import bench

    L, B, E = 12, 128, 768
    bench._PARAMS[0] = jnp.zeros((1,), jnp.float32)   # unused params slot
    results = {}

    def dus_scan(S, n_caches=2, layout="lbse"):
        """25-step scan; carry = caches + step; body writes one row/layer."""
        def fn(_p, key):
            if layout == "lbse":
                shape = (L, B, S, E)
                idx = lambda i: (0, 0, i, 0)
                row = lambda r: r[:, :, None]
            else:  # "slbe": seq-major
                shape = (S, L, B, E)
                idx = lambda i: (i, 0, 0, 0)
                row = lambda r: r[None]
            caches = [jax.random.normal(jax.random.fold_in(key, j), shape,
                                        jnp.bfloat16) for j in range(n_caches)]
            rows = jax.random.normal(jax.random.fold_in(key, 9), (L, B, E),
                                     jnp.bfloat16)

            def step(carry, _):
                cs, i = carry
                # row content depends on i so nothing folds away
                r = row(rows * (1.0 + i.astype(jnp.bfloat16)))
                cs = tuple(jax.lax.dynamic_update_slice(c, r, idx(i))
                           for c in cs)
                return (cs, i + 1), ()

            (cs, _), _ = jax.lax.scan(step, (tuple(caches), jnp.int32(5)),
                                      None, length=25)
            return cs[0]
        fn.__name__ = f"dus_S{S}_{layout}_{n_caches}c"
        return fn

    for name, fn in [
        ("dus_s64_2c", dus_scan(64)),          # production shape
        ("dus_s64_1c", dus_scan(64, n_caches=1)),
        ("dus_s32_2c", dus_scan(32)),          # half cache: copy => ~halves
        ("dus_s64_seqmajor", dus_scan(64, layout="slbe")),
    ]:
        t = bench._bench(fn, 8, key0=300 + len(results) * 17)
        results[name + "_ms"] = round(t * 1000, 3)
        print(f"[dus] {name}: {t * 1000:.2f} ms/25-step-batch",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
