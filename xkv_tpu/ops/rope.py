"""Rotary position embeddings (HF Llama "rotate_half" convention).

The xKV numerical contract (reference `xKV/attn_patch/llama.py:38-53`,
`fake_layer_merge_dynamic_cache.py:142-152`): the compressed cache stores
*pre-RoPE* keys; SVD/SLERP merging happens on pre-RoPE keys; RoPE is applied
to the *reconstructed* keys afterwards. Decode must therefore apply RoPE
after reading the factored cache — either here (XLA path) or fused inside
the Pallas attention kernel.

Also includes DeepSeek-V2's interleaved-RoPE variant
(reference `xKV/attn_patch/deepseek_v2.py:19-49`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def default_inv_freq(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def llama3_scaled_inv_freq(
    inv_freq: jax.Array,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> jax.Array:
    """Llama-3.1 rope scaling (HF `_compute_llama3_parameters` parity)."""
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2 * math.pi / inv_freq
    # wavelen < high_freq_wavelen: keep; > low_freq_wavelen: scale by 1/factor
    inv_freq_llama = jnp.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1 - smooth) * inv_freq_llama / factor + smooth * inv_freq_llama
    is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
    return jnp.where(is_medium, smoothed, inv_freq_llama)


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    theta: float = 10000.0,
    rope_scaling: Optional[dict] = None,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions.

    positions: (...,) int array. Returns cos, sin of shape (..., head_dim)
    where the half-frequencies are duplicated (HF convention:
    ``cat([freqs, freqs], -1)``).
    """
    inv_freq = default_inv_freq(head_dim, theta)
    if rope_scaling:
        rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
        if rope_type == "llama3":
            inv_freq = llama3_scaled_inv_freq(
                inv_freq,
                factor=rope_scaling.get("factor", 8.0),
                low_freq_factor=rope_scaling.get("low_freq_factor", 1.0),
                high_freq_factor=rope_scaling.get("high_freq_factor", 4.0),
                original_max_position=rope_scaling.get(
                    "original_max_position_embeddings", 8192
                ),
            )
        elif rope_type in ("default", "linear"):
            if rope_type == "linear":
                inv_freq = inv_freq / rope_scaling.get("factor", 1.0)
        else:
            raise NotImplementedError(f"rope_type {rope_type!r} not supported")
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE. x: (..., s, hd) or (b, nh, s, hd); cos/sin: (..., s, hd)
    broadcastable against x (a head axis is inserted automatically when
    x has one more leading dim than cos)."""
    if x.ndim == cos.ndim + 1:
        cos = cos[..., None, :, :]  # broadcast over the head axis at -3
        sin = sin[..., None, :, :]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos.astype(jnp.float32) + rotate_half(xf) * sin.astype(jnp.float32)
    return out.astype(orig_dtype)


# ----------------------------------------------------------------- MLA RoPE
def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """DeepSeek-V2 interleaved RoPE: reshape (..., hd) pairs (x0,x1,x2,x3,...)
    into even/odd halves before rotating (reference `deepseek_v2.py:39-49`)."""
    if x.ndim == cos.ndim + 1:
        cos = cos[..., None, :, :]
        sin = sin[..., None, :, :]
    orig_dtype = x.dtype
    b_shape = x.shape
    hd = b_shape[-1]
    xf = x.astype(jnp.float32).reshape(*b_shape[:-1], hd // 2, 2)
    x_even = xf[..., 0]
    x_odd = xf[..., 1]
    x_deint = jnp.concatenate([x_even, x_odd], axis=-1)  # (..., hd)
    out = x_deint * cos.astype(jnp.float32) + rotate_half(x_deint) * sin.astype(
        jnp.float32
    )
    return out.astype(orig_dtype)
