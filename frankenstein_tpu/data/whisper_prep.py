"""Offline prep for the Whisper path (reference:notebooks/whisper_prepare_data.ipynb):
PCA 256->80 components fit on train voltages, 50->100 Hz resample, zero-pad to
3000 frames — a "fake mel spectrogram" [N, 80, 3000].

Runs the math on device (jnp SVD PCA + FFT resample from ops/preprocess.py);
host numpy fallbacks included for very large corpora.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from frankenstein_tpu.ops import preprocess


def fit_pca(brain_list: Sequence[np.ndarray], n_voltage_ch: int = 256):
    """Fit PCA on all train voltage rows (reference cell 7)."""
    x = np.concatenate([b[:, :n_voltage_ch] for b in brain_list], axis=0)
    mean, comps = preprocess.pca_fit(jnp.asarray(x, jnp.float32), x.shape[1])
    return np.asarray(mean), np.asarray(comps)


def prepare_brain_data_for_whisper(brain_list: Sequence[np.ndarray],
                                   pca_mean: np.ndarray,
                                   pca_components: np.ndarray,
                                   n_components: int = 80,
                                   pad_length: int = 3000,
                                   n_voltage_ch: int = 256) -> np.ndarray:
    """[N ragged [T, C]] -> [N, n_components, pad_length] (reference cell 8)."""
    out = np.zeros((len(brain_list), n_components, pad_length), np.float32)
    comps = jnp.asarray(pca_components[:n_components])
    mean = jnp.asarray(pca_mean)
    for i, data in enumerate(brain_list):
        x = jnp.asarray(data[:, :n_voltage_ch], jnp.float32)
        z = preprocess.pca_transform(x, mean, comps).T       # [80, T]
        t = z.shape[1]
        z2 = preprocess.resample_fft(z, t * 2, axis=1)        # 50 -> 100 Hz
        n = min(2 * t, pad_length)
        out[i, :, :n] = np.asarray(z2[:, :n])
    return out
