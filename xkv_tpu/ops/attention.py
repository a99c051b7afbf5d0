"""Attention ops: XLA reference paths and partial-softmax merging.

These are the numerically-authoritative implementations that the Pallas
kernels (ops/pallas/) are tested against, and the fallbacks used on CPU.

The decode path consumes the *factored* cache: prefill keys live as
``k_us @ k_vt`` low-rank factors of the stacked pre-RoPE group matrix
(reference stores the dense reconstruction instead,
`fake_layer_merge_dynamic_cache.py:202-213` — here the factors are the
cache). RoPE is applied after reconstruction, preserving the reference's
pre-RoPE-merge convention (`xKV/attn_patch/llama.py:38-53`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class PartialAttention(NamedTuple):
    """Result of attention over a subset of keys, mergeable via logsumexp.

    out: (..., q, hd) softmax-weighted values, already normalized within the
         subset.
    lse: (..., q) log-sum-exp of the subset's scores.
    """

    out: jax.Array
    lse: jax.Array


def merge_partials(*parts: PartialAttention) -> jax.Array:
    """Merge attention computed over disjoint key subsets (flash-decoding
    style combine): out = sum_i w_i out_i, w_i = exp(lse_i - lse_total)."""
    lses = jnp.stack([p.lse for p in parts], axis=0)  # (n, ..., q)
    lse_max = jnp.max(lses, axis=0)
    weights = jnp.exp(lses - lse_max[None])
    total = jnp.sum(weights, axis=0)
    out = sum(
        p.out * (w / total)[..., None] for p, w in zip(parts, weights)
    )
    return out


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: (b, hq, ql, hd), k: (b, hkv, s, hd) -> scores (b, hq, ql, s)."""
    b, hq, ql, hd = q.shape
    hkv = k.shape[1]
    qg = q.reshape(b, hkv, hq // hkv, ql, hd)
    scores = jnp.einsum("bgnqd,bgsd->bgnqs", qg, k, preferred_element_type=jnp.float32)
    return scores.reshape(b, hq, ql, -1)


def _gqa_values(p: jax.Array, v: jax.Array) -> jax.Array:
    """p: (b, hq, ql, s), v: (b, hkv, s, hd) -> (b, hq, ql, hd)."""
    b, hq, ql, s = p.shape
    hkv = v.shape[1]
    pg = p.reshape(b, hkv, hq // hkv, ql, s)
    out = jnp.einsum("bgnqs,bgsd->bgnqd", pg, v.astype(p.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, hq, ql, -1)


def attention_partial(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask: Optional[jax.Array] = None,
) -> PartialAttention:
    """Softmax attention over one key subset, returning mergeable partials.

    q: (b, hq, ql, hd); k, v: (b, hkv, s, hd); mask broadcastable to
    (b, 1|hq, ql, s), True = attend.
    """
    scores = _gqa_scores(q, k) * scale  # fp32
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    # Guard fully-masked rows (m == NEG_INF).
    m_safe = jnp.maximum(m, -1e29)
    e = jnp.exp(scores - m_safe)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    out = _gqa_values(e / jnp.maximum(l, 1e-30), v)
    lse = jnp.squeeze(m_safe, -1) + jnp.log(jnp.maximum(jnp.squeeze(l, -1), 1e-30))
    return PartialAttention(out=out, lse=lse)


def causal_mask(q_len: int, kv_len: int, q_offset: int = 0) -> jax.Array:
    """(q_len, kv_len) boolean causal mask; query i at absolute position
    q_offset + i attends to kv positions <= its own."""
    q_pos = q_offset + jnp.arange(q_len)[:, None]
    kv_pos = jnp.arange(kv_len)[None, :]
    return kv_pos <= q_pos


def sliding_window_mask(
    q_len: int, kv_len: int, window: int, q_offset: int = 0
) -> jax.Array:
    q_pos = q_offset + jnp.arange(q_len)[:, None]
    kv_pos = jnp.arange(kv_len)[None, :]
    return (kv_pos <= q_pos) & (kv_pos > q_pos - window)


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    causal: bool = True,
    window: Optional[int] = None,
) -> jax.Array:
    """Plain XLA attention (the prefill fallback / test oracle)."""
    ql, s = q.shape[2], k.shape[2]
    if window is not None:
        mask = sliding_window_mask(ql, s, window, q_offset=s - ql)
    elif causal:
        mask = causal_mask(ql, s, q_offset=s - ql)
    else:
        mask = None
    if mask is not None:
        mask = mask[None, None]
    out = attention_partial(q, k, v, scale, mask).out
    return out.astype(q.dtype)


# ------------------------------------------------------------------ factored
def reconstruct_group_heads(
    us: jax.Array,
    vt_slice: jax.Array,
    num_heads: int,
    out_scale: Optional[jax.Array] = None,
    rank_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Reconstruct one layer's pre-RoPE K (or V) from group factors.

    us: (b, s, r); vt_slice: (b, r, hkv*hd) — the layer's column block of the
    group's shared V^T. Returns (b, hkv, s, hd).

    Int8 factors (compress/quant.py): pass ``out_scale`` (b, 1, m) for the
    K scheme (int8 x int8 GEMM, post-scale) or ``rank_scale`` (b, 1, r) for
    the V scheme (dequantize us, bf16 vt).
    """
    b, s, r = us.shape
    m = vt_slice.shape[-1]
    if out_scale is not None:
        prod = jnp.einsum(
            "bsr,brm->bsm",
            us.astype(jnp.int32),
            vt_slice.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        mat = prod.astype(jnp.float32) * out_scale
    else:
        if rank_scale is not None:
            us = us.astype(jnp.float32) * rank_scale
        mat = jnp.einsum(
            "bsr,brm->bsm", us, vt_slice, preferred_element_type=jnp.float32
        )
    hd = m // num_heads
    return jnp.transpose(mat.reshape(b, s, num_heads, hd), (0, 2, 1, 3))


def factored_decode_attention_xla(
    q: jax.Array,
    k_us: jax.Array,
    k_vt_slice: jax.Array,
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    scale: float,
    num_kv_heads: int,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,
    valid_len: Optional[jax.Array] = None,
    pre_rotated: bool = False,
    valid_lo: Optional[jax.Array] = None,
) -> PartialAttention:
    """Decode attention over the factored prefill segment (XLA reference).

    q: (b, hq, ql, hd) post-RoPE queries.
    k_us/v_us: (b, s_p, r); k_vt_slice/v_vt_slice: (b, r, hkv*hd).
    cos/sin: (s_p, hd) RoPE tables for prefill positions (applied to the
    reconstructed keys — the merged cache holds pre-RoPE keys).
    ``pre_rotated``: the factors hold POST-RoPE keys (rope_mode="post");
    skip the rotation (see ``rankspace_decode_attention_xla`` for the
    production formulation that never reconstructs).
    """
    from xkv_tpu.ops.rope import apply_rope

    k_rec = reconstruct_group_heads(
        k_us, k_vt_slice, num_kv_heads, out_scale=k_scale_slice
    )  # (b, hkv, s, hd) fp32
    k = k_rec if pre_rotated else apply_rope(k_rec, cos[None], sin[None])
    v = reconstruct_group_heads(
        v_us, v_vt_slice, num_kv_heads, rank_scale=v_rank_scale
    )
    mask = None
    if valid_len is not None or valid_lo is not None:
        s = k.shape[2]
        cols = jnp.arange(s)[None, :]
        b_ = k.shape[0]
        mask = jnp.ones((b_, s), bool)
        if valid_len is not None:
            mask &= cols < valid_len[:, None]
        if valid_lo is not None:  # sliding window: cols >= lo are live
            mask &= cols >= valid_lo[:, None]
        mask = mask[:, None, None, :]
    return attention_partial(q, k.astype(q.dtype), v.astype(q.dtype), scale, mask)


def rankspace_decode_attention_xla(
    q: jax.Array,  # (b, hq, ql, hd) POST-RoPE decode queries
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd) — this layer's V^T columns
    v_us: jax.Array,  # (b, s_p, rv)
    v_vt_slice: jax.Array,  # (b, rv, hkv*hd)
    scale: float,
    num_kv_heads: int,
    k_scale_slice: Optional[jax.Array] = None,  # (b, 1, hkv*hd) int8 K scale
    v_rank_scale: Optional[jax.Array] = None,  # (b, 1, rv) int8 V scale
    valid_len: Optional[jax.Array] = None,
    k_us4: Optional[jax.Array] = None,  # packed int4 tail (mixed storage)
    k_vt4_slice: Optional[jax.Array] = None,
    k_scale4_slice: Optional[jax.Array] = None,
    v_us4: Optional[jax.Array] = None,
    valid_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
) -> PartialAttention:
    """Decode attention over POST-RoPE factors (rope_mode="post") entirely
    in rank space — K is never reconstructed.

    With ``k_us4``/``v_us4`` (mixed int8+int4 packed storage,
    compress/quant.py) the int4 tail is unpacked and contracted alongside
    the int8 top ranks; v_vt_slice/v_rank_scale are expected in the
    stored [hi | lo-evens | lo-odds] rank order.

    The factors store the rotated keys, so
        scores = q . K^T = (q . vt^T) . us^T
    exactly (the same absorption MLA gets from its RoPE-free latent,
    `models/deepseek.py` absorbed decode — here unlocked for RoPE'd GQA by
    factorizing after rotation). Per layer this is O(s*(rk+rv)) FLOPs
    instead of the pre-RoPE path's O(s*rk*m) reconstruction.

    Int8: the K column scale folds into the q->rank projection; the V rank
    scale applies to the rank-space accumulator before the final vt GEMM.
    """
    b, hq, ql, hd = q.shape
    hkv = num_kv_heads
    gsz = hq // hkv
    rk = k_us.shape[2]
    rv = v_us.shape[2]
    s_p = k_us.shape[1]

    def q_to_rank(vt_slice, col_scale):
        vt_f = vt_slice.astype(jnp.float32)
        if col_scale is not None:
            vt_f = vt_f * col_scale.astype(jnp.float32)
        vt_f = vt_f.reshape(b, vt_slice.shape[1], hkv, hd)
        qg = q.astype(jnp.float32).reshape(b, hkv, gsz, ql, hd)
        return jnp.einsum("bgnqd,brgd->bgnqr", qg, vt_f) * scale

    q_emb = q_to_rank(k_vt_slice, k_scale_slice)
    scores = jnp.einsum(
        "bgnqr,bsr->bgnqs", q_emb, k_us.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    mixed = k_us4 is not None
    if mixed:
        from xkv_tpu.compress.quant import unpack_int4_pairs

        q_emb4 = q_to_rank(k_vt4_slice, k_scale4_slice)
        ev, od = unpack_int4_pairs(k_us4)
        us_lo = jnp.concatenate([ev, od], axis=-1).astype(jnp.float32)
        scores = scores + jnp.einsum(
            "bgnqr,bsr->bgnqs", q_emb4, us_lo,
            preferred_element_type=jnp.float32,
        )
    scores = scores.reshape(b, hq, ql, s_p)

    mask = None
    if valid_len is not None or valid_lo is not None:
        cols = jnp.arange(s_p)[None, :]
        mask = jnp.ones((b, s_p), bool)
        if valid_len is not None:
            mask &= cols < valid_len[:, None]
        if valid_lo is not None:  # sliding window: cols >= lo are live
            mask &= cols >= valid_lo[:, None]
        mask = mask[:, None, None, :]
        scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m_safe = jnp.maximum(m, -1e29)
    e = jnp.exp(scores - m_safe)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(l, 1e-30)

    # Value side in rank space: (P @ v_us) @ v_vt  (V has no RoPE).
    v_us_f = v_us.astype(jnp.float32)
    if mixed:
        ev, od = unpack_int4_pairs(v_us4)
        v_us_f = jnp.concatenate(
            [v_us_f, ev.astype(jnp.float32), od.astype(jnp.float32)],
            axis=-1,
        )  # [hi | lo-eo] — matches stored v_vt/v_rank_scale order
    rv_tot = v_us_f.shape[2]
    t = jnp.einsum(
        "bhqs,bsr->bhqr", p, v_us_f,
        preferred_element_type=jnp.float32,
    )  # (b, hq, ql, rv_tot)
    if v_rank_scale is not None:
        t = t * v_rank_scale.astype(jnp.float32)[:, None]  # (b,1,rv)->(b,1,1,rv)
    vt_v = v_vt_slice.astype(jnp.float32).reshape(b, rv_tot, hkv, hd)
    tg = t.reshape(b, hkv, gsz, ql, rv_tot)
    out = jnp.einsum("bgnqr,brgd->bgnqd", tg, vt_v).reshape(b, hq, ql, hd)
    lse = jnp.squeeze(m_safe, -1) + jnp.log(jnp.maximum(jnp.squeeze(l, -1), 1e-30))
    return PartialAttention(out=out, lse=lse)


def select_topk_chunks(
    q: jax.Array,  # (b, hq, ql, hd) post-RoPE decode queries
    k_cmin: jax.Array,  # (b, nc, hkv*hd) per-chunk elementwise min of
    k_cmax: jax.Array,  # (b, nc, hkv*hd)  ... and max of POST-RoPE keys
    n_select: int,
    num_kv_heads: int,
    valid_len: Optional[jax.Array] = None,  # (b,)
    block: int = 512,
    win_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
) -> jax.Array:
    """Quest-style upper-bound chunk selection for sparse factored decode
    (selection criterion from Quest, arXiv:2406.10774, applied to the
    factored xKV cache; bounds are precomputed per chunk at compression /
    refactorization time — `engine/compression.py:chunk_bounds`).

    For chunk c with elementwise key bounds [kmin, kmax]:
        U_c = qpos . kmax + qneg . kmin  >=  max_{p in c} q . k_p
    so the chunk holding the best-matching key is never underrated (the
    previous chunk-mean landmark washed single keys out and lost 36% recall
    on the induction retrieval gate). The oldest live chunk (the attention
    sink — or, under a sliding window, the chunk containing ``win_lo``)
    and the last valid chunk (recency) are force-included. With ``win_lo``
    set, chunks wholly below the window never spend selection budget (the
    kernels additionally column-mask partial chunks).
    Returns ids (b, n_select) int32.
    """
    sc, _, _ = chunk_bound_scores(
        q, k_cmin, k_cmax, num_kv_heads,
        valid_len=valid_len, block=block, win_lo=win_lo,
    )
    _, ids = jax.lax.top_k(sc, n_select)
    return ids.astype(jnp.int32)


def chunk_bound_scores(
    q: jax.Array,
    k_cmin: jax.Array,
    k_cmax: jax.Array,
    num_kv_heads: int,
    valid_len: Optional[jax.Array] = None,
    block: int = 512,
    win_lo: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quest upper-bound scores per chunk (the body of
    ``select_topk_chunks``, exposed for adaptive budgeting).

    Returns (sc (b, nc) — selection scores with the sink/recency
    force-include sentinels applied, live (b, nc) bool — chunks holding
    any live rows, sc_raw (b, nc) — the plain bounds with dead chunks at
    -inf and no sentinels)."""
    b, hq, ql, hd = q.shape
    nc = k_cmin.shape[1]

    def to_heads(x):  # (b, nc, hkv*hd) -> (b, hkv, nc, hd)
        return jnp.transpose(
            x.astype(jnp.float32).reshape(b, nc, num_kv_heads, hd),
            (0, 2, 1, 3),
        )

    qf = q.astype(jnp.float32)
    qpos = jnp.maximum(qf, 0.0)
    qneg = jnp.minimum(qf, 0.0)
    sc = _gqa_scores(qpos, to_heads(k_cmax)) + _gqa_scores(
        qneg, to_heads(k_cmin)
    )  # (b, hq, ql, nc) upper bounds
    sc = jnp.max(sc, axis=(1, 2))  # (b, nc) — max over heads/positions
    cidx = jnp.arange(nc)[None, :]
    if valid_len is not None:
        n_valid = -(-valid_len[:, None] // block)  # ceil: chunks with rows
        sc = jnp.where(cidx < n_valid, sc, -jnp.inf)
        last_valid = jnp.maximum(n_valid - 1, 0)
    else:
        last_valid = jnp.full((b, 1), nc - 1)
    if win_lo is not None:
        first_live = win_lo[:, None] // block  # oldest chunk with live rows
        sc = jnp.where(cidx < first_live, -jnp.inf, sc)
    else:
        first_live = jnp.zeros((b, 1), jnp.int32)
    live = jnp.isfinite(sc)
    sc_raw = sc
    big = jnp.float32(3e38)
    sc = jnp.where(cidx == first_live, big, sc)  # sink / window start
    sc = jnp.where(cidx == last_valid, big, sc)  # recency boundary
    return sc, live, sc_raw


def adaptive_hot_chunks(sc_raw: jax.Array, live: jax.Array,
                        band: float = 0.5) -> jax.Array:
    """(b,) count of 'hot' chunks: live chunks whose Quest bound sits in
    the top ``band`` fraction of the (max - mean) spread. Multi-answer
    prompts put MANY chunks near the max bound (several needles compete
    for the budget — docs/RULER_OFFLINE.md); a single-needle prompt has
    one dominant chunk. Drives the adaptive sparse budget
    (``sparse_topk_max``): spend the high budget only on steps whose hot
    count exceeds the low budget."""
    neg = jnp.float32(-3e38)
    scm = jnp.where(live, sc_raw, neg)
    sc_max = jnp.max(scm, axis=1)  # (b,)
    cnt = jnp.maximum(jnp.sum(live, axis=1), 1)
    mean = jnp.sum(jnp.where(live, sc_raw, 0.0), axis=1) / cnt
    spread = jnp.maximum(sc_max - mean, 1e-6)
    thr = sc_max - band * spread
    return jnp.sum(live & (sc_raw >= thr[:, None]), axis=1)


def sparse_factored_decode_attention_xla(
    q: jax.Array,  # (b, hq, ql, hd) post-RoPE
    k_us: jax.Array,  # (b, s_p, rk)
    k_vt_slice: jax.Array,
    v_us: jax.Array,
    v_vt_slice: jax.Array,
    cos: jax.Array,  # (s_p, hd)
    sin: jax.Array,
    ids: jax.Array,  # (b, n_select) chunk ids from select_topk_chunks
    scale: float,
    num_kv_heads: int,
    block: int,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,
    valid_len: Optional[jax.Array] = None,
    pre_rotated: bool = False,
    valid_lo: Optional[jax.Array] = None,
) -> PartialAttention:
    """Sparse factored decode attention (XLA reference): gather the selected
    chunks' us rows + position tables, reconstruct ONLY those rows, attend.
    ``pre_rotated``: post-RoPE factors (rope_mode="post") — no rotation.

    Compute/traffic drop from s_p to n_select*block per step; the returned
    partial merges with the dense tail (exact recent tokens) as usual.
    """
    b, s_p, rk = k_us.shape
    n_sel = ids.shape[1]
    nc = -(-s_p // block)
    s_pad = nc * block

    def gather_rows(x):  # (b, s_p, r) -> (b, n_sel*block, r)
        if s_pad != s_p:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s_p), (0, 0)))
        xc = x.reshape(b, nc, block, x.shape[-1])
        g = jnp.take_along_axis(xc, ids[:, :, None, None], axis=1)
        return g.reshape(b, n_sel * block, x.shape[-1])

    k_us_g = gather_rows(k_us)
    v_us_g = gather_rows(v_us)
    # Per-batch gathered position tables (b, n_sel*block, hd). Rows past
    # s_p are masked below, so the clamped table gather is harmless.
    pos = (ids[:, :, None] * block + jnp.arange(block)[None, None, :]).reshape(
        b, n_sel * block
    )
    # Chunk-granular gather from the SHARED (s_p, hd) table — broadcasting
    # the table to the batch first would materialize b copies (hundreds of
    # MB at 32K x batch 48) before gathering, and row-granular gathers are
    # n_sel*block tiny DMAs instead of n_sel block transfers.
    def gather_table(t):
        if s_pad != s_p:
            t = jnp.pad(t, ((0, s_pad - s_p), (0, 0)))
        tc = t.reshape(nc, block, t.shape[-1])
        return jnp.take(tc, ids, axis=0).reshape(b, n_sel * block, t.shape[-1])

    k_rec = reconstruct_group_heads(
        k_us_g, k_vt_slice, num_kv_heads, out_scale=k_scale_slice
    )
    if pre_rotated:
        k = k_rec
    else:
        from xkv_tpu.ops.rope import apply_rope

        k = apply_rope(k_rec, gather_table(cos), gather_table(sin))
    v = reconstruct_group_heads(
        v_us_g, v_vt_slice, num_kv_heads, rank_scale=v_rank_scale
    )
    vlen = valid_len[:, None] if valid_len is not None else s_p
    live = pos < vlen
    if valid_lo is not None:  # sliding-window lower bound (ADVICE r3 #1)
        live &= pos >= valid_lo[:, None]
    mask = live[:, None, None, :]  # (b, 1, 1, n_sel*block)
    return attention_partial(q, k.astype(q.dtype), v.astype(q.dtype), scale, mask)


def dense_decode_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    valid_len: Optional[jax.Array] = None,
    valid_lo: Optional[jax.Array] = None,
) -> PartialAttention:
    """Decode attention over a dense segment (prefill dense layers or the
    decode tail). ``valid_len`` masks a preallocated ring/tail buffer:
    (b,) or (b, 1) for one shared length, (b, ql) for per-query lengths
    (multi-token verify steps — query i sees tail rows < valid_len[:, i]).
    ``valid_lo`` ((b,)) additionally masks rows below a sliding-window
    lower bound."""
    mask = None
    if valid_len is not None:
        s = k.shape[2]
        ql = q.shape[2]
        if valid_len.ndim == 1:
            valid_len = valid_len[:, None]
        if valid_len.shape[1] == ql:
            mask = (
                jnp.arange(s)[None, None, None, :]
                < valid_len[:, None, :, None]
            )  # (b, 1, ql, s)
        else:
            mask = (jnp.arange(s)[None, :] < valid_len)[:, None, None, :]
    if valid_lo is not None:
        s = k.shape[2]
        lo_mask = (jnp.arange(s)[None, :] >= valid_lo[:, None])[:, None, None, :]
        mask = lo_mask if mask is None else (mask & lo_mask)
    return attention_partial(q, k, v, scale, mask)


# ----------------------------------------------------------------- blockwise
def blockwise_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    q_chunk: int = 512,
    k_chunk: int = 1024,
    window: Optional[int] = None,
    q_offset=0,
    kv_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Memory-bounded causal attention in pure XLA (lax.scan online softmax).

    The (s, s) score matrix is never materialized — peak is
    (q_chunk, k_chunk) per head. Used for long prefill where the Pallas
    kernel is unavailable (CPU, MLA's 192-dim heads) — the XLA analog of
    flash attention. GQA supported (hq a multiple of hkv).

    q: (b, hq, s_q, hd); k: (b, hkv, s_k, hd); v: (b, hkv, s_k, hd_v) — the
    value head dim may differ (MLA). Returns (b, hq, s_q, hd_v).

    ``q_offset`` (static or traced scalar): absolute position of q row 0 in
    the kv index space — chunked prefill passes the chunk's start so each
    chunk attends causally over the whole scratch. ``kv_valid`` (traced
    scalar, default s_k): number of valid kv rows (the scratch is a padded
    buffer during chunked admission).
    """
    b, hq, s_q, hd = q.shape
    hkv = k.shape[1]
    s_k = k.shape[2]
    hd_v = v.shape[-1]
    q_chunk = min(q_chunk, s_q)
    k_chunk = min(k_chunk, s_k)
    if kv_valid is None:
        kv_valid = s_k
    # pad to multiples
    import math as _math

    nq = _math.ceil(s_q / q_chunk)
    nk = _math.ceil(s_k / k_chunk)
    s_q_pad, s_k_pad = nq * q_chunk, nk * k_chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, s_q_pad - s_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_k_pad - s_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_k_pad - s_k), (0, 0)))

    qg = qp.reshape(b, hkv, hq // hkv, s_q_pad, hd)
    q_blocks = jnp.stack(jnp.split(qg, nq, axis=3), 0)  # (nq, b, hkv, qpk, qc, hd)
    k_blocks = jnp.stack(jnp.split(kp, nk, axis=2), 0)  # (nk, b, hkv, kc, hd)
    v_blocks = jnp.stack(jnp.split(vp, nk, axis=2), 0)

    def one_q_block(carry, inputs):
        qi, qb = inputs  # qb: (b, hkv, qpk, qc, hd)
        q_start = q_offset + qi * q_chunk

        def kv_step(state, kv_inputs):
            m_prev, l_prev, acc = state
            ki, kb, vb = kv_inputs
            k_start = ki * k_chunk
            sc = jnp.einsum(
                "bgnqd,bgkd->bgnqk", qb, kb, preferred_element_type=jnp.float32
            ) * scale
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (q_chunk, k_chunk), 0
            )
            cols = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (q_chunk, k_chunk), 1
            )
            mask = (cols <= rows) & (cols < kv_valid)
            if window is not None:
                mask &= cols > rows - window
            sc = jnp.where(mask[None, None, None], sc, NEG_INF)
            m_curr = jnp.max(sc, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.where(mask[None, None, None], jnp.exp(sc - m_next), 0.0)
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bgnqk,bgkd->bgnqd", p.astype(vb.dtype), vb,
                preferred_element_type=jnp.float32,
            )
            return (m_next, l_next, acc), None

        init = (
            jnp.full((b, hkv, hq // hkv, q_chunk, 1), -jnp.inf, jnp.float32),
            jnp.zeros((b, hkv, hq // hkv, q_chunk, 1), jnp.float32),
            jnp.zeros((b, hkv, hq // hkv, q_chunk, hd_v), jnp.float32),
        )
        # remat the per-chunk body: under grad, the scan would otherwise
        # save every chunk's (qc, kc) score/probability residuals — a
        # (nq*nk, qc, kc)-sized footprint that OOMs long-context training
        # (flash-attention-style recomputation; free for inference).
        (m, l, acc), _ = jax.lax.scan(
            jax.checkpoint(kv_step), init, (jnp.arange(nk), k_blocks, v_blocks)
        )
        out = acc / jnp.maximum(l, 1e-30)
        return carry, out.astype(q.dtype)

    _, outs = jax.lax.scan(one_q_block, None, (jnp.arange(nq), q_blocks))
    # (nq, b, hkv, qpk, qc, hd_v) -> (b, hq, s, hd_v)
    out = jnp.moveaxis(outs, 0, 3).reshape(b, hkv, hq // hkv, s_q_pad, hd_v)
    out = out.reshape(b, hq, s_q_pad, hd_v)
    return out[:, :, :s_q]


def sparse_rankspace_decode_attention_xla(
    q: jax.Array,  # (b, hq, ql, hd) POST-RoPE decode queries
    k_us: jax.Array,  # (b, s_p, rk) int8 top ranks (or full bf16/fp32)
    k_vt_slice: jax.Array,  # (b, rk, hkv*hd)
    v_us: jax.Array,
    v_vt_slice: jax.Array,  # (b, rv_tot, hkv*hd) — [hi | lo-eo] if mixed
    ids: jax.Array,  # (b, n_select) chunk ids from select_topk_chunks
    scale: float,
    num_kv_heads: int,
    block: int,
    k_scale_slice: Optional[jax.Array] = None,
    v_rank_scale: Optional[jax.Array] = None,  # (b, 1, rv_tot)
    valid_len: Optional[jax.Array] = None,
    k_us4: Optional[jax.Array] = None,  # packed int4 tails (mixed storage)
    k_vt4_slice: Optional[jax.Array] = None,
    k_scale4_slice: Optional[jax.Array] = None,
    v_us4: Optional[jax.Array] = None,
    valid_lo: Optional[jax.Array] = None,
) -> PartialAttention:
    """Sparse top-k decode over POST-RoPE factors in rank space, incl.
    mixed int8+int4 packed storage (the sparse x int4 composition,
    VERDICT r3 #4 follow-through): gather ONLY the selected chunks' us
    rows (int8 and packed-int4 streams alike — packing is along the rank
    axis, so row gathers are layout-preserving), then run the exact
    rank-space math of ``rankspace_decode_attention_xla`` on the gathered
    sub-cache with per-row position masks. K is never reconstructed.
    """
    b, hq, ql, hd = q.shape
    hkv = num_kv_heads
    gsz = hq // hkv
    s_p = k_us.shape[1]
    n_sel = ids.shape[1]
    nc = -(-s_p // block)
    s_pad = nc * block

    def gather_rows(x):  # (b, s_p, r) -> (b, n_sel*block, r)
        if x is None:
            return None
        if s_pad != s_p:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s_p), (0, 0)))
        xc = x.reshape(b, nc, block, x.shape[-1])
        g = jnp.take_along_axis(xc, ids[:, :, None, None], axis=1)
        return g.reshape(b, n_sel * block, x.shape[-1])

    k_us_g = gather_rows(k_us)
    v_us_g = gather_rows(v_us)
    k_us4_g = gather_rows(k_us4)
    v_us4_g = gather_rows(v_us4)
    pos = (
        ids[:, :, None] * block + jnp.arange(block)[None, None, :]
    ).reshape(b, n_sel * block)

    def q_to_rank(vt_slice, col_scale):
        vt_f = vt_slice.astype(jnp.float32)
        if col_scale is not None:
            vt_f = vt_f * col_scale.astype(jnp.float32)
        vt_f = vt_f.reshape(b, vt_slice.shape[1], hkv, hd)
        qg = q.astype(jnp.float32).reshape(b, hkv, gsz, ql, hd)
        return jnp.einsum("bgnqd,brgd->bgnqr", qg, vt_f) * scale

    scores = jnp.einsum(
        "bgnqr,bsr->bgnqs", q_to_rank(k_vt_slice, k_scale_slice),
        k_us_g.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    if k_us4_g is not None:
        from xkv_tpu.compress.quant import unpack_int4_pairs

        ev, od = unpack_int4_pairs(k_us4_g)
        us_lo = jnp.concatenate([ev, od], axis=-1).astype(jnp.float32)
        scores = scores + jnp.einsum(
            "bgnqr,bsr->bgnqs", q_to_rank(k_vt4_slice, k_scale4_slice),
            us_lo, preferred_element_type=jnp.float32,
        )
    scores = scores.reshape(b, hq, ql, n_sel * block)

    mask = jnp.ones((b, n_sel * block), bool)
    mask &= pos < (valid_len[:, None] if valid_len is not None
                   else jnp.full((b, 1), s_p))
    if valid_lo is not None:
        mask &= pos >= valid_lo[:, None]
    mask = mask[:, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m_safe = jnp.maximum(m, -1e29)
    e = jnp.where(mask, jnp.exp(scores - m_safe), 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(l, 1e-30)

    v_us_f = v_us_g.astype(jnp.float32)
    if v_us4_g is not None:
        from xkv_tpu.compress.quant import unpack_int4_pairs

        ev, od = unpack_int4_pairs(v_us4_g)
        v_us_f = jnp.concatenate(
            [v_us_f, ev.astype(jnp.float32), od.astype(jnp.float32)],
            axis=-1,
        )
    rv_tot = v_us_f.shape[2]
    t = jnp.einsum(
        "bhqs,bsr->bhqr", p, v_us_f, preferred_element_type=jnp.float32
    )
    if v_rank_scale is not None:
        t = t * v_rank_scale.astype(jnp.float32)[:, None]
    vt_v = v_vt_slice.astype(jnp.float32).reshape(b, rv_tot, hkv, hd)
    tg = t.reshape(b, hkv, gsz, ql, rv_tot)
    out = jnp.einsum("bgnqr,brgd->bgnqd", tg, vt_v).reshape(b, hq, ql, hd)
    lse = jnp.squeeze(m_safe, -1) + jnp.log(
        jnp.maximum(jnp.squeeze(l, -1), 1e-30)
    )
    return PartialAttention(out=out, lse=lse)
