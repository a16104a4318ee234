"""Exploration/analysis utilities — the library form of the reference's
exploration notebooks (reference:notebooks/explore_data.ipynb,
reduce_brain_dimensionality.ipynb, explore_gpt2_nano.ipynb).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def dataset_stats(brain_list: Sequence[np.ndarray],
                  token_lists: Sequence[Sequence[int]] | None = None) -> Dict:
    """Trial-length / token-count statistics (explore_data.ipynb cell 0:
    max signal len 919, 58 trials over 768, max 24 tokens)."""
    lengths = np.asarray([len(b) for b in brain_list])
    stats = {
        "n_trials": int(len(brain_list)),
        "max_len": int(lengths.max()) if len(lengths) else 0,
        "min_len": int(lengths.min()) if len(lengths) else 0,
        "mean_len": float(lengths.mean()) if len(lengths) else 0.0,
        "n_over_768": int((lengths > 768).sum()),
    }
    if token_lists is not None:
        tl = np.asarray([len(t) for t in token_lists])
        stats.update(max_tokens=int(tl.max()), min_tokens=int(tl.min()))
    return stats


def find_long_samples(sample_list, max_length: int) -> List[int]:
    """Indices of trials exceeding max_length (reference:data_utils.py:230-240)."""
    return [i for i, s in enumerate(sample_list) if len(s) > max_length]


def reduce_dimensionality(x: np.ndarray, n_components: int,
                          method: str = "pca") -> np.ndarray:
    """[N, C] -> [N, n_components] via PCA (on-device SVD) or sklearn
    ICA/NMF/Isomap (host) — the reduce_brain_dimensionality.ipynb sweep."""
    if method == "pca":
        import jax.numpy as jnp
        from frankenstein_tpu.ops import preprocess
        mean, comps = preprocess.pca_fit(jnp.asarray(x, jnp.float32),
                                         n_components)
        return np.asarray(preprocess.pca_transform(
            jnp.asarray(x, jnp.float32), mean, comps))
    if method == "ica":
        from sklearn.decomposition import FastICA
        return FastICA(n_components=n_components, max_iter=500).fit_transform(x)
    if method == "nmf":
        from sklearn.decomposition import NMF
        x = x - x.min()
        return NMF(n_components=n_components, max_iter=500).fit_transform(x)
    if method == "isomap":
        from sklearn.manifold import Isomap
        return Isomap(n_components=n_components).fit_transform(x)
    raise ValueError(f"unknown method {method}")


def crop_gpt_layers(params: dict, n_layers: int) -> dict:
    """Layer-cutting distillation: keep the first n stacked GPT layers
    (explore_gpt2_nano.ipynb cells 19-21 cut GPT-2 to fewer blocks).
    Use with GPTConfig(n_layer=n_layers)."""
    import jax

    p = dict(params["params"])
    p["h"] = jax.tree_util.tree_map(lambda x: x[:n_layers], p["h"])
    return {"params": p}


def crop_block_size(params: dict, cfg, block_size: int):
    """Shrink the position table (reference:gpt2_model.py:218-227)."""
    assert block_size <= cfg.block_size
    p = dict(params["params"])
    p["wpe"] = p["wpe"][:block_size]
    return {"params": p}, cfg.replace(block_size=block_size)
