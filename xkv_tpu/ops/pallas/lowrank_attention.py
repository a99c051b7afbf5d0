"""Fused low-rank ("dequant") decode attention — the heart of the TPU build.

The reference reconstructs a full-size lossy K/V cache in HBM and runs SDPA
over it (`fake_layer_merge_dynamic_cache.py:202-213` + `attn_patch/llama.py:58`).
This kernel instead reads the cache *as factors*:

    K_layer = (k_us @ k_vt_layer)          (b, s_p, hkv*hd)   pre-RoPE
    V_layer = (v_us @ v_vt_layer)

and reconstructs each sequence block **in VMEM**. Full K/V never exist in
HBM.

RoPE is applied in RELATIVE-ANGLE form. With HF half-split RoPE,
``R_a^T R_b = R_{b-a}`` (per-frequency 2D rotations commute), so

    score_p = RoPE(q, t) . RoPE(k_p, p)
            = q . (k_p * cos((p-t)theta)) + [q2, -q1] . (k_p * sin((p-t)theta))

where ``[q1, q2]`` are the query's head-dim halves. The kernel therefore
never rotates K: it builds the two relative trig fields once per block from
the static position tables and the query position's cos/sin row
(angle-subtraction identity), multiplies the raw reconstructed block by
each field (two full-width bf16 element passes — the minimum possible), and
contracts against TWO query embeds. The int8 dequant scale and the 1/sqrt(hd)
attention scale are folded into the query embeds outside the kernel, so the
in-kernel element-wise work is exactly: one GEMM-output downcast + two
multiplies. (The previous absolute-rotation kernel spent ~6 VPU passes per
block on convert/scale/rotate/concat/cast and was 2x slower — measured via
scripts/kernel_ablation.py on v5e.)

HBM traffic per layer: s_p*(rk + rv) elements instead of s_p*2*hkv*hd —
e.g. Llama-3.1-8B xKV-4 (rk=512, rv=768 vs 2*1024): 1.6x less bandwidth,
8x less capacity (16x with int8 factors).

Other performance notes:
  * reconstruction runs on the MXU in the factors' dtype: bf16 x bf16 or
    int8 x int8 -> int32 (2x rate);
  * per-head score structure comes from block-diagonally embedded queries —
    one (hq, hkv*hd) x (hkv*hd, block_s) GEMM per trig field instead of hkv
    tiny 4-row matmuls;
  * the P @ V contraction runs in rank space: ``t += P @ v_us`` per block,
    one final ``t @ v_vt`` projection (V has no RoPE, so this is exact and
    cuts V FLOPs ~32x);
  * relative trig fields are expanded to full (block_s, hkv*hd) width with
    a lane-wise `pltpu.repeat` so every multiply is a packed 2D bf16 op
    (3D broadcasts over an 8-sublane head axis measured 3x slower).

Grid: (b, s_blocks); s_blocks is the online-softmax reduction. The small
vt factors have constant index maps, so Pallas keeps them resident in VMEM
across blocks.

Returns normalized output plus logsumexp so the caller can merge with the
dense decode-tail segment (flash-decoding combine).

The relative-angle identity requires position tables of the form
cos(p * theta_c) with per-channel constant theta — true for Llama / Mistral
/ Qwen2 rope (including Llama-3.1 frequency scaling, which rescales theta_c
but keeps it position-independent). Parity with the absolute-rotation XLA
path is pinned by tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _repeat_cols(x: jax.Array, reps: int, interpret: bool) -> jax.Array:
    if reps == 1:
        return x
    if interpret:
        return jnp.concatenate([x] * reps, axis=1)
    return pltpu.repeat(x, reps, axis=1)


def _lowrank_sparse_kernel(
    ids_ref,  # (b, n_sel) int32 scalar-prefetch — selected chunk ids
    qab_ref,  # (1, hq, 2*hkv*hd) — [qa | qb] along columns
    head_mask_ref,
    len_ref,  # (b, 2) int32 SMEM — [valid_len, window_lo]
    k_us_ref,  # (1, block_s, rk) — block si = chunk ids_ref[bi, si]
    k_vt_ref,
    v_us_ref,
    v_vt_ref,
    v_scale_ref,
    cos_ref,  # (block_s, hd/2) — rows of chunk ids_ref[bi, si]
    sin_ref,
    o_ref,
    lse_ref,
    m_scratch,
    l_scratch,
    t_scratch,
    *,
    block_s: int,
    hkv: int,
    hd: int,
    quantized: bool,
    interpret: bool,
):
    """Sparse top-k variant: identical math to ``_lowrank_kernel`` but the
    sequence grid walks the SELECTED chunks only — Pallas's scalar-prefetch
    index maps stream just those blocks from HBM (no gather copies, no
    reconstruction of unselected chunks). Column masking uses the chunk's
    absolute offset."""
    bi = pl.program_id(0)
    si = pl.program_id(1)
    _lowrank_block_body(
        qab_ref, head_mask_ref, len_ref, k_us_ref, k_vt_ref,
        v_us_ref, v_vt_ref, v_scale_ref, cos_ref, sin_ref,
        o_ref, lse_ref, m_scratch, l_scratch, t_scratch,
        bi=bi, si=si, num_s=pl.num_programs(1),
        col_offset=ids_ref[bi, si] * block_s,
        block_s=block_s, hkv=hkv, hd=hd,
        quantized=quantized, interpret=interpret,
    )


def _lowrank_kernel(
    qab_ref,  # (1, R, 2*hkv*hd)  query embeds, R = ql*hq rows: block-
              # diagonal q with the row's query-position trig AND scales
              # folded (see wrapper) — columns [:m] carry q*c_t - q~*s_t
              # (the cos-field partner), columns [m:] carry q*s_t + q~*c_t
              # (the sin-field partner)
    head_mask_ref,  # (R, hkv*hd)  1.0 on the row's own head's columns
    len_ref,  # (b, 2) int32 in SMEM — per-sequence [valid_len, window_lo]
              # (full array: Mosaic rejects tiny blocks of a small array)
    k_us_ref,  # (1, block_s, rk)
    k_vt_ref,  # (1, rk, hkv*hd)
    v_us_ref,  # (1, block_s, rv)
    v_vt_ref,  # (1, rv, hkv*hd)
    v_scale_ref,  # (1, 1, rv) fp32 — int8 per-rank scale (ones if bf16)
    cos_ref,  # (block_s, hd/2) — half position table (hd halves are equal);
              # bf16 in production dtypes, fp32 with fp32 factors
    sin_ref,  # (block_s, hd/2)
    o_ref,  # (1, R, hd)
    lse_ref,  # (1, 8, R) fp32  (sublane-padded)
    m_scratch,  # (R, 128) fp32
    l_scratch,  # (R, 128) fp32
    t_scratch,  # (R, rv) fp32 — rank-space value accumulator
    *,
    block_s: int,
    hkv: int,
    hd: int,
    quantized: bool,
    interpret: bool,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    _lowrank_block_body(
        qab_ref, head_mask_ref, len_ref, k_us_ref, k_vt_ref,
        v_us_ref, v_vt_ref, v_scale_ref, cos_ref, sin_ref,
        o_ref, lse_ref, m_scratch, l_scratch, t_scratch,
        bi=bi, si=si, num_s=pl.num_programs(1),
        col_offset=si * block_s,
        block_s=block_s, hkv=hkv, hd=hd,
        quantized=quantized, interpret=interpret,
    )


def _lowrank_block_body(
    qab_ref,
    head_mask_ref,
    len_ref,
    k_us_ref,
    k_vt_ref,
    v_us_ref,
    v_vt_ref,
    v_scale_ref,
    cos_ref,
    sin_ref,
    o_ref,
    lse_ref,
    m_scratch,
    l_scratch,
    t_scratch,
    *,
    bi,
    si,
    num_s,
    col_offset,
    block_s: int,
    hkv: int,
    hd: int,
    quantized: bool,
    interpret: bool,
):
    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    if quantized:
        compute_dtype = jnp.bfloat16
        # int8 x int8 -> int32 MXU GEMM (2x bf16 rate); downcast once. The
        # per-column dequant scale lives in the query embeds.
        k_pre = jnp.dot(
            k_us_ref[0], k_vt_ref[0], preferred_element_type=jnp.int32
        ).astype(compute_dtype)
    else:
        compute_dtype = k_us_ref.dtype
        # Mosaic matmul must emit fp32; downcast once (fused with the GEMM
        # epilogue where possible).
        k_pre = jnp.dot(
            k_us_ref[0], k_vt_ref[0], preferred_element_type=jnp.float32
        ).astype(compute_dtype)  # (block_s, hkv*hd) pre-RoPE

    # ---- PURE position trig fields. The query-position trig is folded
    # into the qa/qb embeds OUTSIDE the kernel (angle-subtraction identity
    # rearranged: score = (q*c_t - q~*s_t).(K*cos_p) + (q*s_t + q~*c_t)
    # .(K*sin_p)), so the fields are row-count independent — ONE pair of
    # multiplies serves every query row (multi-token verify passes run
    # ql*hq rows through the same two GEMMs).
    m = hkv * hd
    reps = m // cos_ref.shape[1]
    cos_w = _repeat_cols(
        cos_ref[...].astype(compute_dtype), reps, interpret
    )  # (block_s, hkv*hd)
    sin_w = _repeat_cols(sin_ref[...].astype(compute_dtype), reps, interpret)

    # ---- scores: two packed 2D multiplies + one K=2m GEMM over all rows
    # (the two trig-field products contract against the concatenated
    # [qa | qb] embed in a single matmul — one MXU dispatch instead of two;
    # the concat is value-producing, so Mosaic writes the products straight
    # into the combined buffer) ----
    ab = jnp.concatenate([k_pre * cos_w, k_pre * sin_w], axis=1)
    s = jax.lax.dot_general(
        qab_ref[0].astype(compute_dtype), ab,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (hq, block_s); attention scale + int8 scale folded into qa/qb
    col_ids = col_offset + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_s), 1
    )
    # len_ref rows are [valid_len, window_lo]: cols in [lo, hi) are live
    # (lo = 0 without a sliding window).
    col_mask = (col_ids < len_ref[bi, 0]) & (col_ids >= len_ref[bi, 1])
    s = jnp.where(col_mask, s, NEG_INF)

    # ---- online softmax over all hq rows at once ----
    m_prev = m_scratch[...][:, :1]
    l_prev = l_scratch[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    # Explicit zero for masked columns: in a fully-masked block
    # exp(NEG_INF - NEG_INF) would be 1, polluting l and t.
    p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    # ---- rank-space value accumulation: t += P @ v_us (V has no RoPE, so
    # P @ (v_us @ v_vt) = (P @ v_us) @ v_vt; the v_vt GEMM happens once at
    # the end — 32x fewer FLOPs than reconstructing V per block) ----
    v_us_blk = v_us_ref[0]
    if quantized:
        v_us_blk = v_us_blk.astype(compute_dtype)  # int8 -> bf16 (VPU)
    t_curr = jnp.dot(
        p.astype(compute_dtype), v_us_blk, preferred_element_type=jnp.float32
    )  # (hq, rv)
    t_scratch[...] = t_scratch[...] * alpha + t_curr

    @pl.when(si == num_s - 1)
    def _store():
        m_fin = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        # Final projection through the shared V^T basis; block-diagonal
        # extract picks each row's own kv-head columns.
        t_final = t_scratch[...] * l_inv
        if quantized:
            t_final = t_final * v_scale_ref[0]  # per-rank dequant of P @ us_q
        o_full = jnp.dot(
            t_final.astype(compute_dtype),
            v_vt_ref[0],
            preferred_element_type=jnp.float32,
        )  # (hq, hkv*hd)
        o_curr = jnp.sum(
            (o_full * head_mask_ref[...]).reshape(o_full.shape[0], hkv, hd), axis=1
        )
        o_ref[0] = o_curr.astype(o_ref.dtype)
        lse = (m_fin + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]  # (hq,)
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def _query_embeds(
    q_pre: jax.Array,  # (b, hq, ql, hd) PRE-RoPE queries
    cos_t: jax.Array,  # (b, hd) [ql==1] or (b, ql, hd) query-position trig
    sin_t: jax.Array,
    num_kv_heads: int,
    scale,
    k_scale_slice: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Build the kernel's two query embeds with the row's position trig,
    the attention scale, and the int8 per-column dequant scale folded in.

    Row layout: R = ql*hq rows ordered (ql, hq) — row qi*hq + h. Each row's
    RoPE rotation is folded via the rearranged relative-angle identity
        score = (q*c_t - q~*s_t).(K*cos_p) + (q*s_t + q~*c_t).(K*sin_p)
    (q~ = [q2, -q1]) so the in-kernel trig fields depend only on the KEY
    position — one field pair serves any number of query rows.

    Returns (qab_emb (b, R, 2m) — [qa | qb] along columns, matching the
    kernel's concatenated [K*cos | K*sin] trig fields — and
    head_mask (R, m)).
    """
    b, hq, ql, hd = q_pre.shape
    hkv = num_kv_heads
    half = hd // 2
    if cos_t.ndim == 2:
        cos_t = cos_t[:, None, :]
        sin_t = sin_t[:, None, :]
    q3 = jnp.transpose(q_pre, (0, 2, 1, 3)).astype(jnp.float32)  # (b,ql,hq,hd)
    qt3 = jnp.concatenate([q3[..., half:], -q3[..., :half]], axis=-1)
    c_t = cos_t[:, :, None, :].astype(jnp.float32)  # (b, ql, 1, hd)
    s_t = sin_t[:, :, None, :].astype(jnp.float32)
    qa = (q3 * c_t - qt3 * s_t).reshape(b, ql * hq, hd)
    qb = (q3 * s_t + qt3 * c_t).reshape(b, ql * hq, hd)

    head_ids = jnp.tile(jnp.repeat(jnp.arange(hkv), hq // hkv), ql)  # (R,)
    col_head = jnp.repeat(jnp.arange(hkv), hd)  # (m,)
    head_mask = (head_ids[:, None] == col_head[None, :]).astype(q_pre.dtype)
    fold = scale
    if k_scale_slice is not None:
        fold = fold * k_scale_slice.astype(jnp.float32)  # (b, 1, m)
    emb_dtype = q_pre.dtype if q_pre.dtype != jnp.float32 else jnp.float32
    qa_emb = (jnp.tile(qa, (1, 1, hkv)) * head_mask[None] * fold).astype(emb_dtype)
    qb_emb = (jnp.tile(qb, (1, 1, hkv)) * head_mask[None] * fold).astype(emb_dtype)
    return jnp.concatenate([qa_emb, qb_emb], axis=2), head_mask


@functools.partial(
    jax.jit, static_argnames=("scale", "num_kv_heads", "block_s", "interpret")
)
def lowrank_decode_attention(
    q_pre: jax.Array,  # (b, hq, ql, hd) PRE-RoPE decode queries
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd) — this layer's V^T columns
    v_us: jax.Array,  # (b, s_p, rv)
    v_vt_slice: jax.Array,  # (b, rv, hkv*hd)
    cos_p: jax.Array,  # (s_p, hd) prefill-position tables
    sin_p: jax.Array,  # (s_p, hd)
    cos_t: jax.Array,  # (b, hd) or (b, ql, hd): cos at the query position(s)
    sin_t: jax.Array,
    lengths: Optional[jax.Array] = None,  # (b,) valid prefill length per seq
    k_scale_slice: Optional[jax.Array] = None,  # (b, 1, hkv*hd) int8 K scale
    v_rank_scale: Optional[jax.Array] = None,  # (b, 1, rv) int8 V scale
    win_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
    *,
    scale: float,
    num_kv_heads: int,
    block_s: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused factored-cache decode attention for one layer.

    Takes PRE-RoPE queries plus their positions' cos/sin rows; rotation is
    folded into the query embeds (module docstring). ``ql > 1`` runs every
    (position, head) pair as an independent kernel row — the multi-token
    verify pass of speculative decoding shares one reconstruction across
    ql*hq score rows (and fills MXU row tiles the single-token path can't).
    Query rows attend to every valid prefill position (prefill < all new
    positions); causal masking among the new tokens is the tail's job.

    Returns (out (b, hq, ql, hd), lse (b, hq, ql)) — a PartialAttention
    pair mergeable with the dense tail segment.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, ql, hd = q_pre.shape
    hkv = num_kv_heads
    s_p = k_us.shape[1]
    rv = v_us.shape[2]
    half = hd // 2
    m = hkv * hd
    R = ql * hq

    block_s = min(block_s, s_p)
    # Half position tables (the hd halves are equal by construction); bf16
    # storage in production dtypes, fp32 when the factors are fp32 (tests).
    table_dtype = jnp.float32 if k_us.dtype == jnp.float32 else jnp.bfloat16
    cos_p = cos_p[:, :half].astype(table_dtype)
    sin_p = sin_p[:, :half].astype(table_dtype)
    # Zero-pad partial blocks (Pallas OOB reads are uninitialized memory).
    s_pad = pl.cdiv(s_p, block_s) * block_s
    if s_pad != s_p:
        k_us = jnp.pad(k_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        v_us = jnp.pad(v_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        cos_p = jnp.pad(cos_p, ((0, s_pad - s_p), (0, 0)))
        sin_p = jnp.pad(sin_p, ((0, s_pad - s_p), (0, 0)))
    grid_s = s_pad // block_s

    quantized = k_us.dtype == jnp.int8
    if quantized:
        assert k_scale_slice is not None and v_rank_scale is not None
        v_rank_scale = v_rank_scale.astype(jnp.float32)
    else:
        k_scale_slice = None
        v_rank_scale = jnp.ones((b, 1, rv), jnp.float32)
    qab_emb, head_mask = _query_embeds(
        q_pre, cos_t, sin_t, hkv, scale, k_scale_slice
    )

    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)
    lengths = jnp.stack(
        [lengths.reshape(b).astype(jnp.int32),
         win_lo.reshape(b).astype(jnp.int32)], axis=1
    )  # (b, 2): [valid_len, window_lo]

    kernel = functools.partial(
        _lowrank_kernel,
        block_s=block_s,
        hkv=hkv,
        hd=hd,
        quantized=quantized,
        interpret=interpret,
    )

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, R, hd), q_pre.dtype),
            jax.ShapeDtypeStruct((b, 8, R), jnp.float32),
        ),
        grid=(b, grid_s),
        in_specs=[
            pl.BlockSpec((1, R, 2 * m), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((R, m), lambda bi, si: (0, 0)),
            pl.BlockSpec((b, 2), lambda bi, si: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_s, k_us.shape[2]), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, k_us.shape[2], m), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, block_s, rv), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, rv, m), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, rv), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((block_s, half), lambda bi, si: (si, 0)),
            pl.BlockSpec((block_s, half), lambda bi, si: (si, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, R, hd), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 8, R), lambda bi, si: (bi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, rv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # v5e default scoped-vmem limit is 16MB; the resident vt factors
            # plus double-buffered us blocks need more at rank 512/768.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qab_emb, head_mask, lengths, k_us, k_vt_slice, v_us, v_vt_slice,
      v_rank_scale, cos_p, sin_p)

    # rows (ql, hq) -> (b, hq, ql, hd) / (b, hq, ql)
    out = jnp.transpose(out.reshape(b, ql, hq, hd), (0, 2, 1, 3))
    lse = jnp.transpose(lse[:, 0, :].reshape(b, ql, hq), (0, 2, 1))
    return out, lse


@functools.partial(
    jax.jit, static_argnames=("scale", "num_kv_heads", "block", "interpret")
)
def sparse_lowrank_decode_attention(
    q_pre: jax.Array,  # (b, hq, 1, hd) PRE-RoPE decode queries
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd)
    v_us: jax.Array,  # (b, s_p, rv)
    v_vt_slice: jax.Array,
    cos_p: jax.Array,  # (s_p, hd)
    sin_p: jax.Array,
    cos_t: jax.Array,  # (b, hd)
    sin_t: jax.Array,
    chunk_ids: jax.Array,  # (b, n_sel) int32 — selected chunks
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
    """Sparse top-k fused decode attention: the grid walks only the selected
    ``block``-row chunks per sequence, with Pallas scalar-prefetch index
    maps streaming exactly those blocks of k_us / v_us and the position
    tables from HBM. No gather copies exist anywhere; reconstruction FLOPs
    and factor traffic drop from s_p to n_sel*block rows per layer.

    Same contract as ``lowrank_decode_attention`` otherwise (module
    docstring): pre-RoPE query + relative-angle rotation in-kernel, returns
    a mergeable (out, lse) partial.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hq, ql, hd = q_pre.shape
    assert ql == 1, "sparse kernel is single-token (drafts/decode)"
    hkv = num_kv_heads
    s_p = k_us.shape[1]
    rv = v_us.shape[2]
    half = hd // 2
    m = hkv * hd
    n_sel = chunk_ids.shape[1]

    # Pad rows to whole chunks (selection never emits out-of-range ids; the
    # padded rows only exist so BlockSpec blocks are full-size).
    nc = -(-s_p // block)
    s_pad = nc * block
    table_dtype = jnp.float32 if k_us.dtype == jnp.float32 else jnp.bfloat16
    cos_h = cos_p[:, :half].astype(table_dtype)
    sin_h = sin_p[:, :half].astype(table_dtype)
    if s_pad != s_p:
        k_us = jnp.pad(k_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        v_us = jnp.pad(v_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        cos_h = jnp.pad(cos_h, ((0, s_pad - s_p), (0, 0)))
        sin_h = jnp.pad(sin_h, ((0, s_pad - s_p), (0, 0)))

    quantized = k_us.dtype == jnp.int8
    if quantized:
        assert k_scale_slice is not None and v_rank_scale is not None
        v_rank_scale = v_rank_scale.astype(jnp.float32)
    else:
        k_scale_slice = None
        v_rank_scale = jnp.ones((b, 1, rv), jnp.float32)
    qab_emb, head_mask = _query_embeds(
        q_pre, cos_t, sin_t, hkv, scale, k_scale_slice
    )

    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)
    lengths = jnp.stack(
        [lengths.reshape(b).astype(jnp.int32),
         win_lo.reshape(b).astype(jnp.int32)], axis=1
    )  # (b, 2): [valid_len, window_lo]

    kernel = functools.partial(
        _lowrank_sparse_kernel,
        block_s=block,
        hkv=hkv,
        hd=hd,
        quantized=quantized,
        interpret=interpret,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_sel),
        in_specs=[
            pl.BlockSpec((1, hq, 2 * m), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec((hq, m), lambda bi, si, ids: (0, 0)),
            pl.BlockSpec(
                (b, 2), lambda bi, si, ids: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, block, k_us.shape[2]),
                lambda bi, si, ids: (bi, ids[bi, si], 0),
            ),
            pl.BlockSpec((1, k_us.shape[2], m), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec(
                (1, block, rv), lambda bi, si, ids: (bi, ids[bi, si], 0)
            ),
            pl.BlockSpec((1, rv, m), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec((1, 1, rv), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec((block, half), lambda bi, si, ids: (ids[bi, si], 0)),
            pl.BlockSpec((block, half), lambda bi, si, ids: (ids[bi, si], 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, hq, hd), lambda bi, si, ids: (bi, 0, 0)),
            pl.BlockSpec((1, 8, hq), lambda bi, si, ids: (bi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, rv), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, hd), q_pre.dtype),
            jax.ShapeDtypeStruct((b, 8, hq), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(chunk_ids.astype(jnp.int32), qab_emb, head_mask, lengths,
      k_us, k_vt_slice, v_us, v_vt_slice, v_rank_scale, cos_h, sin_h)

    return out[:, :, None, :], lse[:, 0, :, None]


def lowrank_decode_attention_tp(
    mesh,
    q_pre: jax.Array,  # (b, hq, 1, hd) PRE-RoPE
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd) — already layer-sliced
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    cos_p: jax.Array,
    sin_p: jax.Array,
    cos_t: jax.Array,  # (b, hd)
    sin_t: jax.Array,  # (b, hd)
    lengths: Optional[jax.Array] = None,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,
    win_lo: Optional[jax.Array] = None,
    *,
    scale: float,
    num_kv_heads: int,
    block_s: int = 1024,
    interpret: Optional[bool] = None,
    model_axis: str = "model",
    data_axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Tensor-parallel kernel: kv heads sharded over the mesh's model axis.

    Head sharding is collective-free for attention itself: each shard holds
    its kv heads' V^T columns (a contiguous column block of the layer
    slice), the full ``us`` coordinates (replicated — they are the group's
    shared rank space), and its query heads. Every head's scores and output
    are complete on one shard; only the downstream o_proj needs the usual
    Megatron psum (inserted by GSPMD outside this call).

    Per-shard reconstruction FLOPs are divided by the mesh width — the
    multi-chip answer to the kernel's single-chip compute-bound profile
    (docs/DESIGN.md).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = mesh.shape[model_axis]
    hkv_local = num_kv_heads // n
    assert num_kv_heads % n == 0, "kv heads must divide the model axis"
    b = q_pre.shape[0]
    s_p = k_us.shape[1]
    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)

    quantized = k_us.dtype == jnp.int8
    if not quantized:
        rv = v_us.shape[2]
        k_scale_slice = jnp.ones((b, 1, k_vt_slice.shape[2]), jnp.float32)
        v_rank_scale = jnp.ones((b, 1, rv), jnp.float32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)

    def local(q_l, kus, kvt_l, vus, vvt_l, cosp, sinp, cost, sint, lens,
              ks_l, vs_l, lo_l):
        return lowrank_decode_attention(
            q_l, kus, kvt_l, vus, vvt_l, cosp, sinp, cost, sint, lens,
            k_scale_slice=ks_l if quantized else None,
            v_rank_scale=vs_l if quantized else None,
            win_lo=lo_l,
            scale=scale, num_kv_heads=hkv_local, block_s=block_s,
            interpret=interpret,
        )

    rep = P()
    # Shard batch over the data axis when it divides: the cache factors
    # arrive batch-sharded (engine cache shardings), so a replicated spec
    # here would force a per-step all-gather of the multi-GB us panels and
    # an involuntary SPMD rematerialization of the vt slices (VERDICT r2
    # #3). With ba set, every reshard is a local slice.
    ba = (data_axis if data_axis in mesh.shape
          and b % mesh.shape[data_axis] == 0 else None)
    # Query trig rows broadcast over batch in single-stream decode (their
    # leading dim is 1, not b) — shard them only when they carry real batch.
    tb_c = (P(ba, *([None] * (cos_t.ndim - 1)))
            if ba and cos_t.shape[0] == b else P(*([None] * cos_t.ndim)))
    tb_s = (P(ba, *([None] * (sin_t.ndim - 1)))
            if ba and sin_t.shape[0] == b else P(*([None] * sin_t.ndim)))
    out, lse = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(ba, model_axis, None, None),  # q: heads sharded (kv-head-major)
            P(ba, None, None),  # k_us: shared rank space (batch on data)
            P(ba, None, model_axis),  # k_vt columns by kv head
            P(ba, None, None),  # v_us
            P(ba, None, model_axis),  # v_vt columns by kv head
            rep,  # cos_p (shared positions table)
            rep,  # sin_p
            tb_c,  # cos_t
            tb_s,  # sin_t
            P(ba),  # lengths
            P(ba, None, model_axis),  # k_scale columns by kv head
            P(ba, None, None),  # v_rank_scale (rank space, shared)
            P(ba),  # win_lo (sliding-window lower bound)
        ),
        out_specs=(P(ba, model_axis, None, None), P(ba, model_axis, None)),
        check_vma=False,
    )(q_pre, k_us, k_vt_slice, v_us, v_vt_slice, cos_p, sin_p, cos_t, sin_t,
      lengths, k_scale_slice, v_rank_scale, win_lo)
    return out, lse


def sparse_lowrank_decode_attention_tp(
    mesh,
    q_pre: jax.Array,  # (b, hq, 1, hd) PRE-RoPE
    q_rot: jax.Array,  # (b, hq, 1, hd) POST-RoPE (for selection)
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd) — already layer-sliced
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    cos_p: jax.Array,
    sin_p: jax.Array,
    cos_t: jax.Array,  # (b, hd)
    sin_t: jax.Array,  # (b, hd)
    k_cmin_slice: jax.Array,  # (b, nc, hkv*hd) — layer-sliced Quest bounds
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
    """Tensor-parallel sparse top-k decode: kv heads sharded over the model
    axis, chunk selection PER SHARD.

    Each shard runs Quest-bound selection over its own heads' bound columns
    and streams only its selected chunks — selection granularity is finer
    than the single-device global max-over-heads (a shard never wastes its
    chunk budget on another shard's retrieval targets), and the whole path
    stays collective-free like ``lowrank_decode_attention_tp``.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from xkv_tpu.ops.attention import select_topk_chunks

    n = mesh.shape[model_axis]
    hkv_local = num_kv_heads // n
    assert num_kv_heads % n == 0, "kv heads must divide the model axis"
    b = q_pre.shape[0]
    s_p = k_us.shape[1]
    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)

    quantized = k_us.dtype == jnp.int8
    if not quantized:
        rv = v_us.shape[2]
        k_scale_slice = jnp.ones((b, 1, k_vt_slice.shape[2]), jnp.float32)
        v_rank_scale = jnp.ones((b, 1, rv), jnp.float32)
    if win_lo is None:
        win_lo = jnp.zeros((b,), jnp.int32)

    def local(qp_l, qr_l, kus, kvt_l, vus, vvt_l, cosp, sinp, cost, sint,
              cmin_l, cmax_l, lens, ks_l, vs_l, lo_l):
        ids = select_topk_chunks(
            qr_l, cmin_l, cmax_l, n_select=n_select,
            num_kv_heads=hkv_local, valid_len=lens, block=block,
            win_lo=lo_l,
        )
        return sparse_lowrank_decode_attention(
            qp_l, kus, kvt_l, vus, vvt_l, cosp, sinp, cost, sint, ids,
            lengths=lens,
            k_scale_slice=ks_l if quantized else None,
            v_rank_scale=vs_l if quantized else None,
            win_lo=lo_l,
            scale=scale, num_kv_heads=hkv_local, block=block,
            interpret=interpret,
        )

    rep = P()
    # batch on data when it divides (see lowrank_decode_attention_tp)
    ba = (data_axis if data_axis in mesh.shape
          and b % mesh.shape[data_axis] == 0 else None)
    hs = P(ba, model_axis, None, None)  # heads sharded (kv-head-major)
    cols = P(ba, None, model_axis)  # columns by kv head
    us = P(ba, None, None)  # shared rank space, batch on data
    # trig rows broadcast over batch (leading dim 1) in single-stream decode
    tb_c = (P(ba, *([None] * (cos_t.ndim - 1)))
            if ba and cos_t.shape[0] == b else P(*([None] * cos_t.ndim)))
    tb_s = (P(ba, *([None] * (sin_t.ndim - 1)))
            if ba and sin_t.shape[0] == b else P(*([None] * sin_t.ndim)))
    out, lse = shard_map(
        local,
        mesh=mesh,
        in_specs=(hs, hs, us, cols, us, cols, rep, rep, tb_c, tb_s,
                  cols, cols, P(ba), cols, us, P(ba)),
        out_specs=(hs, P(ba, model_axis, None)),
        check_vma=False,
    )(q_pre, q_rot, k_us, k_vt_slice, v_us, v_vt_slice, cos_p, sin_p,
      cos_t, sin_t, k_cmin_slice, k_cmax_slice, lengths, k_scale_slice,
      v_rank_scale, win_lo)
    return out, lse
