"""RoPE parity tests against HF transformers' Llama implementation."""

import numpy as np
import torch

import pytest
import jax.numpy as jnp

from xkv_tpu.ops.rope import apply_rope, rope_cos_sin


def hf_rope(q: np.ndarray, positions: np.ndarray, theta: float):
    from transformers.models.llama.modeling_llama import (
        LlamaRotaryEmbedding,
        apply_rotary_pos_emb,
    )
    from transformers.models.llama.configuration_llama import LlamaConfig

    b, nh, s, hd = q.shape
    cfg = LlamaConfig(
        hidden_size=hd * nh,
        num_attention_heads=nh,
        num_key_value_heads=nh,
        rope_theta=theta,
        max_position_embeddings=4096,
    )
    rot = LlamaRotaryEmbedding(config=cfg)
    qt = torch.from_numpy(q)
    pos = torch.from_numpy(positions)
    cos, sin = rot(qt, pos)
    out, _ = apply_rotary_pos_emb(qt, qt, cos, sin)
    return out.numpy()


@pytest.mark.slow
def test_rope_matches_hf():
    rng = np.random.default_rng(0)
    b, nh, s, hd = 2, 3, 17, 32
    q = rng.standard_normal((b, nh, s, hd)).astype(np.float32)
    positions = np.tile(np.arange(s)[None, :], (b, 1))
    ref = hf_rope(q, positions, theta=10000.0)

    cos, sin = rope_cos_sin(jnp.asarray(positions), hd, theta=10000.0)
    ours = apply_rope(jnp.asarray(q), cos, sin)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_rope_arbitrary_positions():
    """Decode-time RoPE uses non-contiguous positions."""
    rng = np.random.default_rng(1)
    b, nh, hd = 1, 2, 16
    positions = np.array([[5, 100, 3]])
    q = rng.standard_normal((b, nh, 3, hd)).astype(np.float32)
    ref = hf_rope(q, positions, theta=50000.0)
    cos, sin = rope_cos_sin(jnp.asarray(positions), hd, theta=50000.0)
    ours = apply_rope(jnp.asarray(q), cos, sin)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_llama3_scaling_matches_hf():
    from transformers.models.llama.modeling_llama import LlamaRotaryEmbedding
    from transformers.models.llama.configuration_llama import LlamaConfig

    hd, nh, s = 64, 2, 9
    scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    }
    cfg = LlamaConfig(
        hidden_size=hd * nh,
        num_attention_heads=nh,
        num_key_value_heads=nh,
        rope_theta=500000.0,
        rope_scaling=dict(scaling),
        max_position_embeddings=131072,
    )
    rot = LlamaRotaryEmbedding(config=cfg)
    pos = torch.arange(s)[None, :]
    cos_ref, sin_ref = rot(torch.zeros(1, nh, s, hd), pos)

    cos, sin = rope_cos_sin(
        jnp.arange(s)[None, :], hd, theta=500000.0, rope_scaling=scaling
    )
    np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), sin_ref.numpy(), rtol=1e-5, atol=1e-6)
