"""Host ingest benchmark: numpy vs native C++ preprocessing on a synthetic
corpus at the reference dataset's scale (12,100 trials, ~400 time-bins x 256
channels, 24 sessions x ~20 blocks — reference:utils/data_utils.py:14-37).

Times the normalization stage (per-block z-score; the ingest hot loop) and
the concat512 variant (z-score + gaussian smooth). Run anywhere:
    python tools/ingest_bench.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from frankenstein_tpu.data import datasets, native  # noqa: E402


def corpus(n_trials=12_100, n_ch=256, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(200, 768, n_trials)
    brains = [rng.standard_normal((t, n_ch), dtype=np.float32) for t in lens]
    blocks = rng.integers(0, 480, n_trials)       # 24 sessions x 20 blocks
    return brains, list(blocks)


def timeit(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    if not native.available():
        import subprocess
        subprocess.run(["make", "-C",
                        str(Path(__file__).resolve().parents[1] / "native")],
                       check=True, capture_output=True)
        native._load.cache_clear()
    assert native.available(), "native lib failed to build"

    brains, blocks = corpus()
    t_np = timeit(lambda: datasets.z_score_per_block_scaling(brains, blocks))
    t_nat = timeit(lambda: native.z_score_per_block_scaling(brains, blocks))

    # correctness on the same corpus
    a = datasets.z_score_per_block_scaling(brains[:300], blocks[:300])
    b = native.z_score_per_block_scaling(brains[:300], blocks[:300])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-4, rtol=2e-4)

    x = brains[0]
    from scipy.ndimage import gaussian_filter1d
    t_sm_np = timeit(lambda: [gaussian_filter1d(b, sigma=1.0, axis=0)
                              for b in brains[:500]])
    t_sm_nat = timeit(lambda: [native.gaussian_smooth(b, 1.0)
                               for b in brains[:500]])

    print(json.dumps({
        "n_trials": len(brains),
        "zscore_numpy_s": round(t_np, 3),
        "zscore_native_s": round(t_nat, 3),
        "zscore_speedup": round(t_np / t_nat, 2),
        "smooth500_scipy_s": round(t_sm_np, 3),
        "smooth500_native_s": round(t_sm_nat, 3),
        "smooth_speedup": round(t_sm_np / t_sm_nat, 2),
    }))


if __name__ == "__main__":
    main()
