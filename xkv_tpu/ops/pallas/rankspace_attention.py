"""Rank-space decode attention for POST-RoPE factors (rope_mode="post").

With keys rotated at their prefill positions BEFORE the cross-layer SVD
(engine/compression.py:build_cache), the factors store the post-RoPE keys
directly and decode attention needs NO reconstruction and NO trig:

    scores = q . K^T = (q . vt_k^T) . k_us^T        (exact)
    out    = ((P . v_us) * v_scale) . v_vt          (V has no RoPE)

This is the same absorption DeepSeek MLA gets from its RoPE-free latent
(models/deepseek.py absorbed decode), unlocked for RoPE'd GQA models by
factorizing after rotation. Per layer the kernel does O(s*(rk + rv))
MXU work instead of the pre-RoPE kernel's O(s*rk*m) per-step
reconstruction (ops/pallas/lowrank_attention.py) — ~10x fewer FLOPs at
Llama-3.1-8B xKV-4 geometry, turning decode from MXU-bound to
HBM-bandwidth-bound on the factor stream.

Division of labour (minimizes in-kernel element passes):
  * OUTSIDE (XLA, tiny): q -> rank space through this layer's dequantized
    V^T columns with the attention scale and the int8 K column scale
    folded in; final projection of the rank-space accumulator through
    v_vt (+ per-rank int8 V scale); row layout (ql, hq) matches the
    lowrank kernel.
  * KERNEL (grid b x s_blocks, online softmax): one (R, rk) x (rk,
    block_s) score GEMM and one (R, block_s) x (block_s, rv) value GEMM
    per block; int8 us blocks are upcast to bf16 in VMEM (one VPU pass
    over rk+rv columns — 2.6x narrower than the pre-RoPE kernel's m-wide
    trig/downcast passes).

The kernel returns the segment-normalized rank-space value accumulator
plus logsumexp; after the outside v_vt projection the pair merges with
the dense decode tail (flash-decoding combine).

Parity with ops/attention.py:rankspace_decode_attention_xla is pinned by
tests/test_rankspace_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _rankspace_block_body(
    q_emb_ref,  # (1, R, rk)
    len_ref,  # (b, 1) int32 SMEM
    k_us_ref,  # (1, block_s, rk)
    v_us_ref,  # (1, block_s, rv)
    t_ref,  # (1, R, rv) out — segment-normalized rank-space values
    lse_ref,  # (1, 8, R) fp32 out (sublane-padded)
    m_scratch,  # (R, 128) fp32
    l_scratch,  # (R, 128) fp32
    t_scratch,  # (R, rv) fp32
    *,
    bi,
    si,
    num_s,
    col_offset,
    block_s: int,
):
    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    compute_dtype = q_emb_ref.dtype
    k_blk = k_us_ref[0]
    if k_blk.dtype != compute_dtype:
        k_blk = k_blk.astype(compute_dtype)  # int8 -> bf16 (VPU)

    s = jax.lax.dot_general(
        q_emb_ref[0], k_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, block_s); attention + int8 K scales folded into q_emb
    col_ids = col_offset + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_s), 1
    )
    col_mask = (col_ids < len_ref[bi, 0]) & (col_ids >= len_ref[bi, 1])
    s = jnp.where(col_mask, s, NEG_INF)

    m_prev = m_scratch[...][:, :1]
    l_prev = l_scratch[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    v_blk = v_us_ref[0]
    if v_blk.dtype != compute_dtype:
        v_blk = v_blk.astype(compute_dtype)
    t_curr = jnp.dot(
        p.astype(compute_dtype), v_blk, preferred_element_type=jnp.float32
    )  # (R, rv)
    t_scratch[...] = t_scratch[...] * alpha + t_curr

    @pl.when(si == num_s - 1)
    def _store():
        m_fin = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        t_ref[0] = (t_scratch[...] * l_inv).astype(t_ref.dtype)
        lse = (m_fin + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]  # (R,)
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _rankspace_kernel(
    q_emb_ref, len_ref, k_us_ref, v_us_ref, t_ref, lse_ref,
    m_scratch, l_scratch, t_scratch, *, block_s: int,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    _rankspace_block_body(
        q_emb_ref, len_ref, k_us_ref, v_us_ref, t_ref, lse_ref,
        m_scratch, l_scratch, t_scratch,
        bi=bi, si=si, num_s=pl.num_programs(1),
        col_offset=si * block_s, block_s=block_s,
    )


def _unpack_nibbles(packed_i8, compute_dtype):
    """(block_s, r_lo/2) int8 packed pairs -> (block_s, r_lo) in
    [evens | odds] rank order (compress/quant.py nibble layout)."""
    x = packed_i8.astype(jnp.int32)
    hi = x >> 4  # arithmetic shift sign-extends the high nibble
    lo = ((x & 0xF) ^ 8) - 8  # sign-extend the low nibble
    return jnp.concatenate([hi, lo], axis=1).astype(compute_dtype)


def _rankspace_mixed_kernel(
    q_emb_ref,  # (1, R, r_hi_k + r_lo_k) — [hi | lo-eo] columns, scales folded
    len_ref,  # (b, 1) int32 SMEM
    k_us8_ref,  # (1, block_s, r_hi_k) int8
    k_us4_ref,  # (1, block_s, r_lo_k/2) int8 packed nibbles
    v_us8_ref,  # (1, block_s, r_hi_v) int8
    v_us4_ref,  # (1, block_s, r_lo_v/2) int8 packed
    t_ref,  # (1, R, rv) out — rank order [hi | lo-eo]
    lse_ref,
    m_scratch,
    l_scratch,
    t_scratch,
    *,
    block_s: int,
):
    """Mixed int8+int4 variant: unpack the int4 tail nibbles in VMEM (two
    shifts + a lane concat), then the same two GEMMs as the int8 kernel —
    the HBM stream shrinks ~1.6x, which is what the bandwidth-bound decode
    pays for."""
    bi = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    compute_dtype = q_emb_ref.dtype
    k_all = jnp.concatenate(
        [
            k_us8_ref[0].astype(compute_dtype),
            _unpack_nibbles(k_us4_ref[0], compute_dtype),
        ],
        axis=1,
    )  # (block_s, r_hi_k + r_lo_k)
    s = jax.lax.dot_general(
        q_emb_ref[0], k_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_ids = si * block_s + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_s), 1
    )
    col_mask = (col_ids < len_ref[bi, 0]) & (col_ids >= len_ref[bi, 1])
    s = jnp.where(col_mask, s, NEG_INF)

    m_prev = m_scratch[...][:, :1]
    l_prev = l_scratch[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    v_all = jnp.concatenate(
        [
            v_us8_ref[0].astype(compute_dtype),
            _unpack_nibbles(v_us4_ref[0], compute_dtype),
        ],
        axis=1,
    )  # (block_s, rv) in [hi | lo-eo] order — matches stored vt/scale
    t_curr = jnp.dot(
        p.astype(compute_dtype), v_all, preferred_element_type=jnp.float32
    )
    t_scratch[...] = t_scratch[...] * alpha + t_curr

    @pl.when(si == pl.num_programs(1) - 1)
    def _store():
        m_fin = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        t_ref[0] = (t_scratch[...] * l_inv).astype(t_ref.dtype)
        lse = (m_fin + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _rankspace_sparse_kernel(
    ids_ref,  # (b, n_sel) int32 scalar-prefetch
    q_emb_ref, len_ref, k_us_ref, v_us_ref, t_ref, lse_ref,
    m_scratch, l_scratch, t_scratch, *, block_s: int,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    _rankspace_block_body(
        q_emb_ref, len_ref, k_us_ref, v_us_ref, t_ref, lse_ref,
        m_scratch, l_scratch, t_scratch,
        bi=bi, si=si, num_s=pl.num_programs(1),
        col_offset=ids_ref[bi, si] * block_s, block_s=block_s,
    )


def _project_q(
    q: jax.Array,  # (b, hq, ql, hd) POST-RoPE
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd)
    num_kv_heads: int,
    scale: float,
    k_scale_slice: Optional[jax.Array],
    compute_dtype,
) -> jax.Array:
    """q -> rank space: (b, R, rk), rows ordered (ql, hq); attention scale
    and the int8 K column scale folded in."""
    b, hq, ql, hd = q.shape
    hkv = num_kv_heads
    gsz = hq // hkv
    rk = k_vt_slice.shape[1]
    vt = k_vt_slice.astype(jnp.float32)
    if k_scale_slice is not None:
        vt = vt * k_scale_slice.astype(jnp.float32)
    vt = vt.reshape(b, rk, hkv, hd)
    qg = q.astype(jnp.float32).reshape(b, hkv, gsz, ql, hd) * scale
    emb = jnp.einsum("bgnqd,brgd->bqgnr", qg, vt)  # (b, ql, hkv, gsz, rk)
    return emb.reshape(b, ql * hq, rk).astype(compute_dtype)


def _project_out(
    t: jax.Array,  # (b, R, rv) segment-normalized rank-space values
    v_vt_slice: jax.Array,  # (b, rv, hkv*hd)
    v_rank_scale: Optional[jax.Array],
    num_kv_heads: int,
    ql: int,
    out_dtype,
) -> jax.Array:
    """Project through V^T, each row picking its own head's columns.
    Returns (b, hq, ql, hd)."""
    b, R, rv = t.shape
    hq = R // ql
    hkv = num_kv_heads
    gsz = hq // hkv
    hd = v_vt_slice.shape[2] // hkv
    tf = t.astype(jnp.float32)
    if v_rank_scale is not None:
        tf = tf * v_rank_scale.astype(jnp.float32)  # (b, 1, rv) broadcast
    tg = tf.reshape(b, ql, hkv, gsz, rv)
    vt = v_vt_slice.astype(jnp.float32).reshape(b, rv, hkv, hd)
    out = jnp.einsum("bqgnr,brgd->bgnqd", tg, vt)  # (b, hkv, gsz, ql, hd)
    return out.reshape(b, hq, ql, hd).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "num_kv_heads", "block_s", "interpret")
)
def rankspace_decode_attention(
    q: jax.Array,  # (b, hq, ql, hd) POST-RoPE decode queries
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd) — this layer's V^T columns
    v_us: jax.Array,  # (b, s_p, rv)
    v_vt_slice: jax.Array,  # (b, rv, hkv*hd)
    lengths: Optional[jax.Array] = None,  # (b,) valid prefill length
    k_scale_slice: Optional[jax.Array] = None,  # (b, 1, hkv*hd) int8 K scale
    v_rank_scale: Optional[jax.Array] = None,  # (b, 1, rv) int8 V scale
    k_us4: Optional[jax.Array] = None,  # (b, s_p, r_lo_k/2) packed int4 tail
    k_vt4_slice: Optional[jax.Array] = None,  # (b, r_lo_k, hkv*hd) eo rows
    k_scale4_slice: Optional[jax.Array] = None,  # (b, 1, hkv*hd)
    v_us4: Optional[jax.Array] = None,  # (b, s_p, r_lo_v/2) packed int4 tail
    win_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
    *,
    scale: float,
    num_kv_heads: int,
    block_s: int = 2048,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused rank-space decode attention over post-RoPE factors (module
    docstring). ql > 1 runs every (position, head) pair as an independent
    row (the speculative multi-token verify). With ``k_us4``/``v_us4`` the
    mixed int8+int4 kernel runs (packed tail nibbles unpacked in VMEM;
    v_vt_slice/v_rank_scale must be in the stored [hi | lo-eo] rank
    order — compress/quant.py). Returns (out (b, hq, ql, hd),
    lse (b, hq, ql)) — a PartialAttention pair mergeable with the tail."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, ql, hd = q.shape
    s_p = k_us.shape[1]
    rk = k_us.shape[2]
    rv = v_us.shape[2]
    R = ql * hq
    mixed = k_us4 is not None

    compute_dtype = (
        jnp.float32 if k_us.dtype == jnp.float32 and not mixed else jnp.bfloat16
    )
    q_emb = _project_q(
        q, k_vt_slice, num_kv_heads, scale, k_scale_slice, compute_dtype
    )
    if mixed:
        q_emb4 = _project_q(
            q, k_vt4_slice, num_kv_heads, scale, k_scale4_slice, compute_dtype
        )
        q_emb = jnp.concatenate([q_emb, q_emb4], axis=2)
        rk_tot = q_emb.shape[2]
        rv_tot = rv + 2 * v_us4.shape[2]
    else:
        rk_tot, rv_tot = rk, rv

    block_s = min(block_s, s_p)
    s_pad = pl.cdiv(s_p, block_s) * block_s
    if s_pad != s_p:
        pad = ((0, 0), (0, s_pad - s_p), (0, 0))
        k_us = jnp.pad(k_us, pad)
        v_us = jnp.pad(v_us, pad)
        if mixed:
            k_us4 = jnp.pad(k_us4, pad)
            v_us4 = jnp.pad(v_us4, pad)
    grid_s = s_pad // block_s

    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)
    lengths = jnp.stack(
        [lengths.reshape(b).astype(jnp.int32),
         win_lo.reshape(b).astype(jnp.int32)], axis=1
    )  # (b, 2): [valid_len, window_lo]

    out_shape = (
        jax.ShapeDtypeStruct((b, R, rv_tot), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, R), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, R, rv_tot), lambda bi, si: (bi, 0, 0)),
        pl.BlockSpec((1, 8, R), lambda bi, si: (bi, 0, 0)),
    )
    scratch_shapes = [
        pltpu.VMEM((R, 128), jnp.float32),
        pltpu.VMEM((R, 128), jnp.float32),
        pltpu.VMEM((R, rv_tot), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    if mixed:
        kernel = functools.partial(_rankspace_mixed_kernel, block_s=block_s)
        t, lse = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(b, grid_s),
            in_specs=[
                pl.BlockSpec((1, R, rk_tot), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((b, 2), lambda bi, si: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_s, rk), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, k_us4.shape[2]),
                             lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, rv), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, v_us4.shape[2]),
                             lambda bi, si: (bi, si, 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            interpret=interpret,
        )(q_emb, lengths, k_us, k_us4, v_us, v_us4)
    else:
        kernel = functools.partial(_rankspace_kernel, block_s=block_s)
        t, lse = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(b, grid_s),
            in_specs=[
                pl.BlockSpec((1, R, rk), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((b, 2), lambda bi, si: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_s, rk), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, rv), lambda bi, si: (bi, si, 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            interpret=interpret,
        )(q_emb, lengths, k_us, v_us)

    out = _project_out(t, v_vt_slice, v_rank_scale, num_kv_heads, ql, q.dtype)
    lse = jnp.transpose(lse[:, 0, :].reshape(b, ql, hq), (0, 2, 1))
    return out, lse


@functools.partial(
    jax.jit, static_argnames=("scale", "num_kv_heads", "block", "interpret")
)
def sparse_rankspace_decode_attention(
    q: jax.Array,  # (b, hq, 1, hd) POST-RoPE decode queries
    k_us: jax.Array,
    k_vt_slice: jax.Array,
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    chunk_ids: jax.Array,  # (b, n_sel) int32 from select_topk_chunks
    lengths: Optional[jax.Array] = None,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,
    win_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
    *,
    scale: float,
    num_kv_heads: int,
    block: int,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse top-k rank-space decode: the grid walks only the selected
    chunks, scalar-prefetch index maps streaming exactly those us blocks
    from HBM (same contract as ``rankspace_decode_attention``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, ql, hd = q.shape
    assert ql == 1, "sparse kernel is single-token (drafts/decode)"
    s_p = k_us.shape[1]
    rk = k_us.shape[2]
    rv = v_us.shape[2]
    n_sel = chunk_ids.shape[1]

    compute_dtype = (
        jnp.float32 if k_us.dtype == jnp.float32 else jnp.bfloat16
    )
    q_emb = _project_q(
        q, k_vt_slice, num_kv_heads, scale, k_scale_slice, compute_dtype
    )

    nc = -(-s_p // block)
    s_pad = nc * block
    if s_pad != s_p:
        k_us = jnp.pad(k_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        v_us = jnp.pad(v_us, ((0, 0), (0, s_pad - s_p), (0, 0)))

    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)
    lengths = jnp.stack(
        [lengths.reshape(b).astype(jnp.int32),
         win_lo.reshape(b).astype(jnp.int32)], axis=1
    )  # (b, 2): [valid_len, window_lo]

    kernel = functools.partial(_rankspace_sparse_kernel, block_s=block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_sel),
        in_specs=[
            pl.BlockSpec((1, hq, rk), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec(
                (b, 2), lambda bi, si, ids: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, block, rk), lambda bi, si, ids: (bi, ids[bi, si], 0)
            ),
            pl.BlockSpec(
                (1, block, rv), lambda bi, si, ids: (bi, ids[bi, si], 0)
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, hq, rv), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec((1, 8, hq), lambda bi, si, ids: (bi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, rv), jnp.float32),
        ],
    )
    t, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, rv), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, hq), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(chunk_ids.astype(jnp.int32), q_emb, lengths, k_us, v_us)

    out = _project_out(t, v_vt_slice, v_rank_scale, num_kv_heads, 1, q.dtype)
    return out, lse[:, 0, :, None]


def _mla_rankspace_kernel(
    q_emb_ref,  # (1, R, rk) — absorbed query in rank space, scale+w+int8
                # column scale folded (models/deepseek.py rank_space path)
    q_pe_ref,  # (1, R, rope) — rotated pe query, attention scale folded
    len_ref,  # (b, 1) int32 SMEM
    k_us_ref,  # (1, block_s, rk)
    k_pe_ref,  # (1, block_s, rope)
    r_ref,  # (1, 1, block_s) fp32 — per-row latent inverse rms (the
            # (b, 1, s) carry shape keeps the trailing block dims
            # Mosaic-tileable: (1, block_s) of a (b, s) array is not)
    t_ref,  # (1, R, rk) out — segment-normalized rank-space values
    lse_ref,  # (1, 8, R) fp32
    m_scratch,
    l_scratch,
    t_scratch,  # (R, rk) fp32
    *,
    block_s: int,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    compute_dtype = q_emb_ref.dtype
    us_blk = k_us_ref[0]
    if us_blk.dtype != compute_dtype:
        us_blk = us_blk.astype(compute_dtype)
    rr = r_ref[0].astype(jnp.float32)  # (1, block_s)

    # score = (q_emb . us^T) * r  +  q_pe . k_pe^T   — the r multiplier
    # applies only to the nope (latent) part; both q embeds carry the
    # softmax scale already.
    s_nope = jax.lax.dot_general(
        q_emb_ref[0], us_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, block_s)
    s_pe = jax.lax.dot_general(
        q_pe_ref[0], k_pe_ref[0].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s_nope * rr + s_pe
    col_mask = (
        si * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    ) < len_ref[bi, 0]
    s = jnp.where(col_mask, s, NEG_INF)

    m_prev = m_scratch[...][:, :1]
    l_prev = l_scratch[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    # value side: t += (P * r) @ us — the same rank-space absorption, with
    # the per-row norm applied to the probabilities.
    t_curr = jnp.dot(
        (p * rr).astype(compute_dtype), us_blk,
        preferred_element_type=jnp.float32,
    )  # (R, rk)
    t_scratch[...] = t_scratch[...] * alpha + t_curr

    @pl.when(si == pl.num_programs(1) - 1)
    def _store():
        m_fin = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        t_ref[0] = (t_scratch[...] * l_inv).astype(t_ref.dtype)
        lse = (m_fin + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _mla_rankspace_mixed_kernel(
    q_emb_ref,  # (1, R, rk_hi + r_lo) — [hi | lo-eo] columns, folds+scale
    q_pe_ref,  # (1, R, rope)
    len_ref,  # (b, 1) int32 SMEM
    k_us8_ref,  # (1, block_s, rk_hi) int8
    k_us4_ref,  # (1, block_s, r_lo/2) int8 packed nibbles
    k_pe_ref,  # (1, block_s, rope)
    r_ref,  # (1, 1, block_s) fp32
    t_ref,  # (1, R, rk_hi + r_lo) out — [hi | lo-eo] rank order
    lse_ref,
    m_scratch,
    l_scratch,
    t_scratch,
    *,
    block_s: int,
):
    """Mixed int8+int4 MLA variant (VERDICT r4 #4): unpack the packed int4
    tail nibbles in VMEM (two shifts + a lane concat, same as the llama
    mixed kernel), then ONE score GEMM over [hi | lo] rank columns and the
    pe GEMM — int4 x MLA stops paying the XLA fp32-upcast path (measured
    353 vs 1689 tok/s) and streams the latent factors 1.6x smaller."""
    bi = pl.program_id(0)
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    compute_dtype = q_emb_ref.dtype
    us_all = jnp.concatenate(
        [
            k_us8_ref[0].astype(compute_dtype),
            _unpack_nibbles(k_us4_ref[0], compute_dtype),
        ],
        axis=1,
    )  # (block_s, rk_hi + r_lo) — [hi | evens | odds], matching q_emb
    rr = r_ref[0].astype(jnp.float32)  # (1, block_s)

    s_nope = jax.lax.dot_general(
        q_emb_ref[0], us_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, block_s)
    s_pe = jax.lax.dot_general(
        q_pe_ref[0], k_pe_ref[0].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s_nope * rr + s_pe
    col_mask = (
        si * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    ) < len_ref[bi, 0]
    s = jnp.where(col_mask, s, NEG_INF)

    m_prev = m_scratch[...][:, :1]
    l_prev = l_scratch[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    t_curr = jnp.dot(
        (p * rr).astype(compute_dtype), us_all,
        preferred_element_type=jnp.float32,
    )  # (R, rk_hi + r_lo)
    t_scratch[...] = t_scratch[...] * alpha + t_curr

    @pl.when(si == pl.num_programs(1) - 1)
    def _store():
        m_fin = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        t_ref[0] = (t_scratch[...] * l_inv).astype(t_ref.dtype)
        lse = (m_fin + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def mla_rankspace_decode_attention(
    q_emb: jax.Array,  # (b, nh, ql, rk) absorbed rank-space query (folded);
                       # with k_us4: (b, nh, ql, rk_hi + r_lo), [hi | lo-eo]
    q_pe: jax.Array,  # (b, nh, ql, rope) rotated pe query (scale folded)
    k_us: jax.Array,  # (b, s_p, rk) latent factors (int8 hi ranks if mixed)
    k_pe: jax.Array,  # (b, s_p, rope) dense rotated pe keys
    r: jax.Array,  # (b, s_p) fp32 latent inverse rms
    lengths: Optional[jax.Array] = None,
    k_us4: Optional[jax.Array] = None,  # (b, s_p, r_lo/2) packed int4 tail
    *,
    block_s: int = 2048,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused MLA rank-space decode over the factored latent + dense pe
    keys (one online softmax; latent never reconstructed — the per-row
    norm r and per-column folds come precomputed, models/deepseek.py).

    With ``k_us4`` the mixed int8+int4 kernel runs: ``q_emb`` must carry
    the concatenated [hi | lo-eo] rank columns (each half folded through
    its own vt/scale) and the returned ``t`` is in the same rank order —
    the caller projects the hi/lo halves through k_vt / k_vt4 separately.

    Returns (t (b, nh, ql, rk_tot) — segment-normalized rank-space values —
    and lse (b, nh, ql)); the caller projects through vt/w and merges
    with the dense tail partial in latent space.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nh, ql, rk_q = q_emb.shape
    rope = q_pe.shape[3]
    s_p = k_us.shape[1]
    rk = k_us.shape[2]
    R = ql * nh
    mixed = k_us4 is not None
    if mixed:
        assert rk_q == rk + 2 * k_us4.shape[2], (
            "mixed MLA kernel: q_emb must carry [hi | lo-eo] rank columns"
        )

    compute_dtype = (
        jnp.float32 if k_us.dtype == jnp.float32 and not mixed
        else jnp.bfloat16
    )
    # rows ordered (ql, nh) like the llama kernel
    qe = jnp.transpose(q_emb, (0, 2, 1, 3)).reshape(b, R, rk_q)
    qp = jnp.transpose(q_pe, (0, 2, 1, 3)).reshape(b, R, rope)
    qe = qe.astype(compute_dtype)
    qp = qp.astype(compute_dtype)

    block_s = min(block_s, s_p)
    s_pad = pl.cdiv(s_p, block_s) * block_s
    if s_pad != s_p:
        k_us = jnp.pad(k_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        k_pe = jnp.pad(k_pe, ((0, 0), (0, s_pad - s_p), (0, 0)))
        r = jnp.pad(r, ((0, 0), (0, s_pad - s_p)))
        if mixed:
            k_us4 = jnp.pad(k_us4, ((0, 0), (0, s_pad - s_p), (0, 0)))
    r3 = r.astype(jnp.float32)[:, None, :]  # (b, 1, s_pad)
    grid_s = s_pad // block_s

    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)
    lengths = lengths.reshape(b, 1).astype(jnp.int32)

    out_shape = (
        jax.ShapeDtypeStruct((b, R, rk_q), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, R), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, R, rk_q), lambda bi, si: (bi, 0, 0)),
        pl.BlockSpec((1, 8, R), lambda bi, si: (bi, 0, 0)),
    )
    scratch_shapes = [
        pltpu.VMEM((R, 128), jnp.float32),
        pltpu.VMEM((R, 128), jnp.float32),
        pltpu.VMEM((R, rk_q), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    if mixed:
        kernel = functools.partial(
            _mla_rankspace_mixed_kernel, block_s=block_s
        )
        t, lse = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(b, grid_s),
            in_specs=[
                pl.BlockSpec((1, R, rk_q), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((1, R, rope), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((b, 1), lambda bi, si: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_s, rk), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, k_us4.shape[2]),
                             lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, rope), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, 1, block_s), lambda bi, si: (bi, 0, si)),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            interpret=interpret,
        )(qe, qp, lengths, k_us, k_us4, k_pe, r3)
    else:
        kernel = functools.partial(_mla_rankspace_kernel, block_s=block_s)
        t, lse = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(b, grid_s),
            in_specs=[
                pl.BlockSpec((1, R, rk_q), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((1, R, rope), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((b, 1), lambda bi, si: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_s, rk), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, block_s, rope), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, 1, block_s), lambda bi, si: (bi, 0, si)),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            interpret=interpret,
        )(qe, qp, lengths, k_us, k_pe, r3)

    t = jnp.transpose(t.reshape(b, ql, nh, rk_q), (0, 2, 1, 3))
    lse = jnp.transpose(lse[:, 0, :].reshape(b, ql, nh), (0, 2, 1))
    return t, lse


def rankspace_decode_attention_tp(
    mesh,
    q: jax.Array,  # (b, hq, ql, hd) POST-RoPE
    k_us: jax.Array,
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd) — already layer-sliced
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    lengths: Optional[jax.Array] = None,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,
    win_lo: Optional[jax.Array] = None,
    *,
    scale: float,
    num_kv_heads: int,
    block_s: int = 2048,
    interpret: Optional[bool] = None,
    model_axis: str = "model",
    data_axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Tensor-parallel rank-space decode: kv heads sharded on the model
    axis, collective-free (like ``lowrank_decode_attention_tp``): each
    shard projects its own query heads through its own V^T column block —
    the rank space itself is shared, so ``us`` stays replicated and every
    head's scores/outputs complete on one shard."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = mesh.shape[model_axis]
    hkv_local = num_kv_heads // n
    assert num_kv_heads % n == 0, "kv heads must divide the model axis"
    b = q.shape[0]
    s_p = k_us.shape[1]
    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)

    quantized = k_us.dtype == jnp.int8
    if not quantized:
        k_scale_slice = jnp.ones((b, 1, k_vt_slice.shape[2]), jnp.float32)
        v_rank_scale = jnp.ones((b, 1, v_us.shape[2]), jnp.float32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)

    def local(q_l, kus, kvt_l, vus, vvt_l, lens, ks_l, vs_l, lo_l):
        return rankspace_decode_attention(
            q_l, kus, kvt_l, vus, vvt_l, lens,
            k_scale_slice=ks_l if quantized else None,
            v_rank_scale=vs_l if quantized else None,
            win_lo=lo_l,
            scale=scale, num_kv_heads=hkv_local, block_s=block_s,
            interpret=interpret,
        )

    # Shard batch over the data axis when it divides: the cache factors
    # arrive batch-sharded, so replicated specs here would force a
    # per-step all-gather of the us panels plus an involuntary SPMD
    # rematerialization of the vt slices (VERDICT r2 #3).
    ba = (data_axis if data_axis in mesh.shape
          and b % mesh.shape[data_axis] == 0 else None)
    out, lse = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(ba, model_axis, None, None),  # q heads (kv-head-major)
            P(ba, None, None),  # k_us: shared rank space, batch on data
            P(ba, None, model_axis),  # k_vt columns by kv head
            P(ba, None, None),  # v_us
            P(ba, None, model_axis),  # v_vt columns by kv head
            P(ba),  # lengths
            P(ba, None, model_axis),  # k_scale columns by kv head
            P(ba, None, None),  # v_rank_scale (rank space, shared)
            P(ba),  # win_lo (sliding-window lower bound)
        ),
        out_specs=(P(ba, model_axis, None, None), P(ba, model_axis, None)),
        check_vma=False,
    )(q, k_us, k_vt_slice, v_us, v_vt_slice, lengths, k_scale_slice,
      v_rank_scale, win_lo)
    return out, lse


def sparse_rankspace_decode_attention_tp(
    mesh,
    q: jax.Array,  # (b, hq, 1, hd) POST-RoPE
    k_us: jax.Array,
    k_vt_slice: jax.Array,
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    k_cmin_slice: jax.Array,  # (b, nc, hkv*hd) layer-sliced Quest bounds
    k_cmax_slice: jax.Array,
    lengths: Optional[jax.Array] = None,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,
    win_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
    *,
    n_select: int,
    scale: float,
    num_kv_heads: int,
    block: int = 1024,
    interpret: Optional[bool] = None,
    model_axis: str = "model",
    data_axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Tensor-parallel sparse rank-space decode with per-shard Quest
    selection (finer selection granularity, collective-free — see
    ``sparse_lowrank_decode_attention_tp``)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from xkv_tpu.ops.attention import select_topk_chunks

    n = mesh.shape[model_axis]
    hkv_local = num_kv_heads // n
    assert num_kv_heads % n == 0, "kv heads must divide the model axis"
    b = q.shape[0]
    s_p = k_us.shape[1]
    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)

    quantized = k_us.dtype == jnp.int8
    if not quantized:
        k_scale_slice = jnp.ones((b, 1, k_vt_slice.shape[2]), jnp.float32)
        v_rank_scale = jnp.ones((b, 1, v_us.shape[2]), jnp.float32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)

    def local(q_l, kus, kvt_l, vus, vvt_l, cmin_l, cmax_l, lens, ks_l, vs_l,
              lo_l):
        ids = select_topk_chunks(
            q_l, cmin_l, cmax_l, n_select=n_select,
            num_kv_heads=hkv_local, valid_len=lens, block=block,
            win_lo=lo_l,
        )
        return sparse_rankspace_decode_attention(
            q_l, kus, kvt_l, vus, vvt_l, ids, lengths=lens,
            k_scale_slice=ks_l if quantized else None,
            v_rank_scale=vs_l if quantized else None,
            win_lo=lo_l,
            scale=scale, num_kv_heads=hkv_local, block=block,
            interpret=interpret,
        )

    # batch on data when it divides (see rankspace_decode_attention_tp)
    ba = (data_axis if data_axis in mesh.shape
          and b % mesh.shape[data_axis] == 0 else None)
    hs = P(ba, model_axis, None, None)
    cols = P(ba, None, model_axis)
    us = P(ba, None, None)
    out, lse = shard_map(
        local,
        mesh=mesh,
        in_specs=(hs, us, cols, us, cols, cols, cols, P(ba), cols, us,
                  P(ba)),
        out_specs=(hs, P(ba, model_axis, None)),
        check_vma=False,
    )(q, k_us, k_vt_slice, v_us, v_vt_slice, k_cmin_slice, k_cmax_slice,
      lengths, k_scale_slice, v_rank_scale, win_lo)
    return out, lse
