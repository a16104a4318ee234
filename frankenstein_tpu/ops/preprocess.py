"""Device-side signal preprocessing (jnp; fuses under jit on TPU).

The reference preprocesses on the host with sklearn/scipy
(reference:utils/data_utils.py:78-156). The host path is kept for .mat ingest
(data/datasets.py); these jnp equivalents serve the fused online pipeline and
are tested for parity against scipy/sklearn.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def zscore(x: jnp.ndarray, axis=0, eps: float = 0.0) -> jnp.ndarray:
    """StandardScaler semantics: ddof=0, zero-std columns left unscaled
    (std==0 -> 1; reference:data_utils.py:142-145)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    std = jnp.where(std == 0, 1.0, std)
    return (x - mean) / (std + eps)


def zscore_by_segments(x: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """Per-block z-score over a batch of concatenated trials.

    x: [N, C] rows; segment_ids: [N] int block index per row. Each block is
    normalized by its own mean/std (the reference's per-block StandardScaler,
    reference:data_utils.py:78-109), computed with segment reductions on
    device.
    """
    ones = jnp.ones((x.shape[0], 1), x.dtype)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments)          # [S, 1]
    s1 = jax.ops.segment_sum(x, segment_ids, num_segments)              # [S, C]
    s2 = jax.ops.segment_sum(x * x, segment_ids, num_segments)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    std = jnp.sqrt(var)
    std = jnp.where(std == 0, 1.0, std)
    return (x - mean[segment_ids]) / std[segment_ids]


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Matches scipy.ndimage.gaussian_filter1d's kernel."""
    radius = int(truncate * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_smooth(x: jnp.ndarray, sigma: float = 1.0,
                    truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian smoothing along time (axis 0 of [T, C] or axis 1 of [B, T, C]),
    'reflect' boundary mode like scipy's default
    (reference:data_utils.py:154)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, t, c = x.shape
    k = gaussian_kernel1d(sigma, truncate)
    r = (k.shape[0] - 1) // 2
    # scipy.ndimage "reflect" duplicates the edge sample == numpy "symmetric"
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="symmetric")
    # depthwise conv over time: treat channels as features
    out = jax.lax.conv_general_dilated(
        xp.transpose(0, 2, 1).reshape(b * c, 1, t + 2 * r),
        k.reshape(1, 1, -1),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    out = out.reshape(b, c, t).transpose(0, 2, 1)
    return out[0] if squeeze else out


def resample_fft(x: jnp.ndarray, num: int, axis: int = 0) -> jnp.ndarray:
    """FFT resample matching scipy.signal.resample (used by the Whisper prep,
    reference:notebooks/whisper_prepare_data.ipynb cell 8)."""
    n = x.shape[axis]
    X = jnp.fft.rfft(x, axis=axis)
    # build the resized half-spectrum (scipy.signal.resample real-input path)
    shape = list(x.shape)
    shape[axis] = num // 2 + 1
    N = min(num, n)
    nyq = N // 2 + 1
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, nyq)
    Y = jnp.zeros(shape, X.dtype).at[tuple(idx)].set(X[tuple(idx)])
    if N % 2 == 0:
        nyq_idx = [slice(None)] * x.ndim
        nyq_idx[axis] = slice(N // 2, N // 2 + 1)
        if num < n:      # downsampling: fold the negative-frequency half in
            Y = Y.at[tuple(nyq_idx)].multiply(2.0)
        elif num > n:    # upsampling: split the Nyquist bin
            Y = Y.at[tuple(nyq_idx)].multiply(0.5)
    y = jnp.fft.irfft(Y, n=num, axis=axis)
    return y * (num / n)


def pca_fit(x: jnp.ndarray, n_components: int):
    """SVD PCA over [N, C] rows -> (mean [C], components [n_components, C]).

    jnp replacement for sklearn.decomposition.PCA (whisper prep path,
    reference:whisper_prepare_data.ipynb cell 7)."""
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
    return mean, vt[:n_components]


def pca_transform(x: jnp.ndarray, mean: jnp.ndarray,
                  components: jnp.ndarray) -> jnp.ndarray:
    return (x - mean) @ components.T
