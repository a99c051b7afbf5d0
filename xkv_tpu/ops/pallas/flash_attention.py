"""GQA-native causal flash attention (prefill), Pallas TPU kernel.

Replaces the reference's torch SDPA / flash-attn-2 dependency
(`xKV/attn_patch/llama.py:55-58`, reference README.md:53) with a TPU-native
kernel. GQA is handled without materializing repeated KV heads: the grid
iterates KV heads and each step computes all ``q_per_kv`` query heads of
that group against one K/V tile.

Grid: (batch, kv_heads, q_blocks, kv_blocks); the kv_blocks axis is the
online-softmax reduction ("arbitrary"), the rest are parallel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(
    q_ref,  # (1, 1, q_per_kv, block_q, hd)
    k_ref,  # (1, 1, block_k, hd)
    v_ref,  # (1, 1, block_k, hd)
    o_ref,  # (1, 1, q_per_kv, block_q, hd)
    m_scratch,  # (q_per_kv, block_q, 128) fp32
    l_scratch,  # (q_per_kv, block_q, 128) fp32
    acc_scratch,  # (q_per_kv, block_q, hd) fp32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    causal: bool,
    window: Optional[int],
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Skip KV tiles entirely above the diagonal (causal) or entirely outside
    # the sliding window.
    q_start = qi * block_q
    k_start = ki * block_k
    should_run = True
    if causal:
        should_run = jnp.logical_and(
            should_run, q_start + block_q - 1 >= k_start
        )
    if window is not None:
        should_run = jnp.logical_and(
            should_run, k_start + block_k - 1 > q_start - window
        )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (q_per_kv, block_q, hd)
        k = k_ref[0, 0]  # (block_k, hd)
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q_per_kv, block_q, block_k)
        s = s * scale

        row = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape[1:], 0)
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape[1:], 1)
        mask = col < kv_len
        if causal:
            mask = jnp.logical_and(mask, col <= row)
        if window is not None:
            mask = jnp.logical_and(mask, col > row - window)
        s = jnp.where(mask[None], s, NEG_INF)

        m_prev = m_scratch[...][:, :, :1]  # (q_per_kv, block_q, 1)
        l_prev = l_scratch[...][:, :, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        v = v_ref[0, 0]  # (block_k, hd)
        o_curr = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q_per_kv, block_q, hd)
        acc_scratch[...] = acc_scratch[...] * alpha + o_curr

    @pl.when(ki == num_k - 1)
    def _store():
        l = l_scratch[...][:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "window", "block_q", "block_k", "interpret"),
)
def flash_attention_fwd(
    q: jax.Array,  # (b, hq, s_q, hd)
    k: jax.Array,  # (b, hkv, s_k, hd)
    v: jax.Array,  # (b, hkv, s_k, hd)
    *,
    scale: float,
    causal: bool = True,
    window: Optional[int] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (b, s_q, hq, hd) attention output (note: seq-major layout,
    ready for the (b, s, d) reshape that feeds wo)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, s_q, hd = q.shape
    _, hkv, s_k, _ = k.shape
    q_per_kv = hq // hkv

    block_q = min(block_q, s_q)
    block_k = min(block_k, s_k)
    # Zero-pad partial blocks: Pallas OOB regions are uninitialized and
    # 0 * NaN would poison the P @ V accumulation.
    s_q_pad = pl.cdiv(s_q, block_q) * block_q
    s_k_pad = pl.cdiv(s_k, block_k) * block_k
    if s_q_pad != s_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_q_pad - s_q), (0, 0)))
    if s_k_pad != s_k:
        pad = ((0, 0), (0, 0), (0, s_k_pad - s_k), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    grid_q = s_q_pad // block_q
    grid_k = s_k_pad // block_k

    # (b, hkv, q_per_kv, s_q, hd) view of q.
    q5 = q.reshape(b, hkv, q_per_kv, s_q_pad, hd)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        kv_len=s_k,
        causal=causal,
        window=window,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hkv, q_per_kv, s_q_pad, hd), q.dtype),
        grid=(b, hkv, grid_q, grid_k),
        in_specs=[
            pl.BlockSpec(
                (1, 1, q_per_kv, block_q, hd),
                lambda bi, hi, qi, ki: (bi, hi, 0, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, hd), lambda bi, hi, qi, ki: (bi, hi, ki, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, hd), lambda bi, hi, qi, ki: (bi, hi, ki, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, q_per_kv, block_q, hd),
            lambda bi, hi, qi, ki: (bi, hi, 0, qi, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_per_kv, block_q, 128), jnp.float32),
            pltpu.VMEM((q_per_kv, block_q, 128), jnp.float32),
            pltpu.VMEM((q_per_kv, block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q5, k, v)

    # (b, hkv, q_per_kv, s_q_pad, hd) -> (b, s_q, hq, hd)
    out = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, s_q_pad, hq, hd)
    return out[:, :s_q] if s_q_pad != s_q else out


def flash_attention_tp(
    mesh,
    q: jax.Array,  # (b, hq, s_q, hd)
    k: jax.Array,  # (b, hkv, s_k, hd)
    v: jax.Array,  # (b, hkv, s_k, hd)
    *,
    scale: float,
    causal: bool = True,
    window: Optional[int] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    model_axis: str = "model",
) -> jax.Array:
    """Tensor-parallel prefill flash attention: heads sharded over the
    mesh's model axis via an explicit shard_map (pallas_call has no GSPMD
    partitioning rules, so the kernel is wrapped rather than annotated).

    Collective-free: each shard holds whole KV heads plus their q_per_kv
    query heads (contiguous chunks of the kv-head-major q layout), so every
    head's softmax and output are complete on one shard. The downstream
    o_proj contraction gets the usual Megatron psum from GSPMD.

    Returns (b, s_q, hq, hd), sharded on the head axis (2).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[model_axis]
    hkv = k.shape[1]
    assert hkv % n == 0, "kv heads must divide the model axis"

    def local(q_l, k_l, v_l):
        return flash_attention_fwd(
            q_l, k_l, v_l, scale=scale, causal=causal, window=window,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, model_axis, None, None),
            P(None, model_axis, None, None),
            P(None, model_axis, None, None),
        ),
        out_specs=P(None, None, model_axis, None),
        check_vma=False,
    )(q, k, v)
