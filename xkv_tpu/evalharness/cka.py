"""Centered linear CKA between layers' K/V projections + grouping tool.

Counterpart of the reference's CKA notebook + offline grouping script:
  * collect per-layer k_proj/v_proj outputs on a calibration prompt
    (reference `scripts/cka_similarity_analysis.ipynb` cells 4-8 — hooks on
    the HF modules; here the functional model returns them directly),
  * centered linear CKA (Kornblith et al.) between every layer pair
    (notebook cell 13),
  * agglomerative clustering of the dissimilarity with optional
    index-distance weighting and forced contiguity, emitting an xKV YAML
    config (reference `group_layers.py:9-80`).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xkv_tpu.configs import LayerGroup, XKVConfig


def linear_cka_centered(x: jax.Array, y: jax.Array) -> jax.Array:
    """Centered linear CKA between (n, d1) and (n, d2) feature matrices."""
    x = x - jnp.mean(x, axis=0, keepdims=True)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    xty = x.T @ y
    hsic = jnp.sum(xty * xty)
    norm_x = jnp.linalg.norm(x.T @ x)
    norm_y = jnp.linalg.norm(y.T @ y)
    return hsic / (norm_x * norm_y + 1e-12)


def collect_kv_features(params, cfg, tokens, which: str = "k") -> List[jax.Array]:
    """Per-layer pre-RoPE K (or V) features on a calibration prompt,
    flattened to (seq, hkv*hd)."""
    from xkv_tpu.models import llama
    from xkv_tpu.compress.svd import heads_to_matrix

    _, kvs = llama.prefill(params, cfg, tokens)
    idx = 0 if which == "k" else 1
    return [heads_to_matrix(kv[idx])[0].astype(jnp.float32) for kv in kvs]


def cka_matrix(features: List[jax.Array]) -> np.ndarray:
    """Pairwise CKA similarity matrix over layers."""
    n = len(features)
    sim = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(i, n):
            v = float(linear_cka_centered(features[i], features[j]))
            sim[i, j] = sim[j, i] = v
    return sim


def group_layers_from_cka(
    sim: np.ndarray,
    n_groups: int,
    index_distance_scale: Optional[float] = None,
) -> List[List[int]]:
    """Agglomerative clustering + forced contiguity
    (reference `group_layers.py:13-55`)."""
    from sklearn.cluster import AgglomerativeClustering

    n = sim.shape[0]
    weighted = sim.copy()
    if index_distance_scale is not None:
        idx = np.arange(n)
        weight = np.exp(-np.abs(idx[:, None] - idx[None, :]) / index_distance_scale)
        weighted = weighted * weight
    dissim = 1.0 - weighted
    np.fill_diagonal(dissim, 0.0)
    labels = AgglomerativeClustering(
        n_clusters=n_groups, metric="precomputed", linkage="average"
    ).fit_predict(dissim)

    # Force contiguity: only adjacent layers with the same label share a group.
    groups: List[List[int]] = [[0]]
    for i in range(1, n):
        if labels[i] == labels[i - 1]:
            groups[-1].append(i)
        else:
            groups.append([i])
    return groups


def make_grouped_config(
    groups: List[List[int]],
    num_layers: int,
    rank_k: int,
    rank_v: int,
    merge_key: bool = True,
    merge_value: bool = True,
) -> XKVConfig:
    """Emit an xKV config from CKA-derived groups (singleton groups are kept
    as grouped layers with per-layer SVD, matching the reference's emitted
    YAML structure, `group_layers.py:58-80`)."""
    return XKVConfig(
        num_layers=num_layers,
        layer_merge_impl="svd",
        rank_k=rank_k,
        rank_v=rank_v,
        merge_key=merge_key,
        merge_value=merge_value,
        layer_groups=[LayerGroup(layers=list(g)) for g in groups],
    )
