"""Native (C++) host preprocessing: parity with the numpy/scipy paths.
Skips gracefully when the shared library hasn't been built
(``make -C native``)."""

import numpy as np
import pytest

from frankenstein_tpu.data import datasets, native


def test_fallback_always_works():
    rng = np.random.default_rng(0)
    brains = [rng.standard_normal((20, 3)).astype(np.float32)]
    out = native.z_score_per_block_scaling(brains, [0])
    assert out[0].shape == (20, 3)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_zscore_matches_numpy():
    rng = np.random.default_rng(1)
    brains = [rng.standard_normal((t, 6)).astype(np.float32) * 2 + 5
              for t in (40, 25, 70)]
    blocks = [3, 9, 3]
    a = native.z_score_per_block_scaling(brains, blocks)
    b = datasets.z_score_per_block_scaling(brains, blocks)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_gaussian_matches_scipy():
    from scipy.ndimage import gaussian_filter1d
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    np.testing.assert_allclose(native.gaussian_smooth(x, 1.0),
                               gaussian_filter1d(x, 1.0, axis=0), atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_pad_truncate():
    x = np.ones((30, 3), np.float32)
    p = native.pad_truncate(x, 50)
    assert p.shape == (50, 3) and p[30:].sum() == 0
    t = native.pad_truncate(x, 20)
    assert t.shape == (20, 3)
