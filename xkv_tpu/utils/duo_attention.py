"""DuoAttention pattern support: per-head full-vs-streaming attention masks.

Counterpart of the reference's `xKV/utils/duo_attn_utils.py:6-37` (support
code for its sparse-attention roadmap item, reference README.md:142). Loads
DuoAttention-format per-head gate scores (tsv + config.json with
sink/recent sizes) and thresholds them into binary head patterns. The
head patterns plug into the attention ops as per-head sink+recent masks.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


def sparsify_attention_heads(
    full_attention_heads: np.ndarray,
    threshold: Optional[float] = None,
    sparsity: Optional[float] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """Binarize per-head gate scores at a threshold or target sparsity
    (reference `duo_attn_utils.py:6-25`; tie-break noise made deterministic)."""
    rng = np.random.default_rng(seed)
    scores = full_attention_heads + rng.uniform(0, 1e-6, full_attention_heads.shape)
    if sparsity is not None:
        threshold = np.quantile(scores, sparsity)
        if sparsity >= 1:
            threshold = 2.0
        if sparsity <= 0:
            threshold = -1.0
    elif threshold is None:
        raise ValueError("Either threshold or sparsity must be provided")
    heads = (scores >= threshold).astype(float)
    return heads, float(1 - np.mean(heads))


def load_attn_pattern(attn_load_dir: str) -> Tuple[np.ndarray, int, int]:
    """Load DuoAttention-format head patterns
    (reference `duo_attn_utils.py:28-37`)."""
    heads = np.loadtxt(
        os.path.join(attn_load_dir, "full_attention_heads.tsv"),
        dtype=float,
        delimiter="\t",
    )
    heads = np.clip(heads, 0, 1)
    with open(os.path.join(attn_load_dir, "config.json")) as f:
        config = json.load(f)
    return heads, config["sink_size"], config["recent_size"]


def streaming_head_mask(
    q_len: int, kv_len: int, sink_size: int, recent_size: int, q_offset: int = 0
) -> np.ndarray:
    """(q_len, kv_len) bool mask for a *streaming* head: attend to the first
    ``sink_size`` tokens plus the most recent ``recent_size`` (causal)."""
    q_pos = q_offset + np.arange(q_len)[:, None]
    kv_pos = np.arange(kv_len)[None, :]
    causal = kv_pos <= q_pos
    sink = kv_pos < sink_size
    recent = kv_pos > q_pos - recent_size
    return causal & (sink | recent)
