"""KV-cache collection for compressor training.

The reference registers forward hooks on every layer's k_proj/v_proj and
stacks the outputs (`src/kv_cache_collector.py:9-132`). The functional JAX
model already returns per-layer K/V from ``prefill``, so collection is a
pure function — no hook lifecycle, no state to clear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xkv_tpu.models.config import ModelConfig


def collect_kv(params, cfg: ModelConfig, tokens: jax.Array) -> jax.Array:
    """Frozen forward over tokens (b, s); returns the stacked K‖V tensor
    (b, num_layers, s, 2 * hkv * hd) — the compressor's input layout
    (reference `compressor.py:47-89`)."""
    from xkv_tpu.compress.svd import heads_to_matrix
    from xkv_tpu.models import llama

    _, kvs = llama.prefill(params, cfg, tokens)
    per_layer = [
        jnp.concatenate([heads_to_matrix(k), heads_to_matrix(v)], axis=-1)
        for k, v in kvs
    ]
    return jnp.stack(per_layer, axis=1)
