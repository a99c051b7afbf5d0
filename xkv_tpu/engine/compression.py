"""Build the compressed XKVCache from prefill K/V — the merge step.

Equivalent of the reference's ``grouped_layer_merging``
(`fake_layer_merge_dynamic_cache.py:155-208`) but producing *factors*
instead of a dense reconstruction (svd scheme), and supporting the same
three schemes:

  * svd with layer_group_size >= 2  — grouped xKV (cross-layer SVD)
  * svd with layer_group_size == 1  — per-layer single SVD
  * slerp (group size 2)            — MiniCache merge (dense output)

A ``fake=True`` mode reproduces the reference exactly: factors are
immediately multiplied back and stored densely. Used for parity tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from xkv_tpu.cache import GroupFactors, XKVCache, init_tail
from xkv_tpu.compress.slerp import compact_pair, minicache_merge_heads
from xkv_tpu.compress.svd import (
    LowRankFactors,
    factorize,
    heads_to_matrix,
    matrix_to_heads,
    reconstruct,
)
from xkv_tpu.configs import XKVConfig
from xkv_tpu.models.config import ModelConfig
from xkv_tpu.ops.rope import apply_rope


def _stack_group_matrix(kvs: List[jax.Array]) -> jax.Array:
    """[(b, hkv, s, hd)] per layer -> (b, s, g*hkv*hd).

    Column order = (layer, head, dim), matching the reference's concat of
    layers along the head axis before flattening
    (`fake_layer_merge_dynamic_cache.py:170-171` + `:14`).
    """
    return heads_to_matrix(jnp.concatenate(kvs, axis=1))


def _split_group_matrix(mat: jax.Array, g: int, hkv: int) -> List[jax.Array]:
    """(b, s, g*hkv*hd) -> g tensors (b, hkv, s, hd)."""
    stacked = matrix_to_heads(mat, g * hkv)  # (b, g*hkv, s, hd)
    return [
        jax.lax.slice_in_dim(stacked, i * hkv, (i + 1) * hkv, axis=1) for i in range(g)
    ]


_BOUND_BIG = 3e38  # padding sentinel; makes padded-only chunks unselectable


def latent_rnorm(k_rec_mat: jax.Array, g: int) -> jax.Array:
    """Per-layer inverse rms of the reconstructed MLA latent.

    k_rec_mat: (b, s, g*lora) — the (lossy, dequantized) group
    reconstruction. Returns (b, g, s) fp32: rsqrt(mean(z^2) + 1e-6) per
    row, matching models/deepseek.py norm_latent's rms_norm(·, w, 1e-6).
    The per-row scalar is the only nonlinear part of the latent norm, so
    storing it lets absorbed decode stay in rank space (the per-column
    weight w folds into the absorbed query instead)."""
    b, s, gm = k_rec_mat.shape
    width = gm // g
    z = k_rec_mat.astype(jnp.float32).reshape(b, s, g, width)
    r = jax.lax.rsqrt(jnp.mean(z * z, axis=-1) + 1e-6)  # (b, s, g)
    return jnp.transpose(r, (0, 2, 1))


def int4_rank_hi(rank: int, frac: float) -> int:
    """Rank split for mixed int8+int4 factors: top ``r_hi`` ranks stay
    int8, the tail drops to packed int4.

    Lane alignment: the PACKED width (lo/2) must tile the 128-lane
    registers exactly at production ranks, or XLA stores the array in a
    padded layout and inserts a per-decode-step uncompress copy of the
    whole us4 stream (measured: +3.8 GB HBM temps at 64K x batch 48 ->
    OOM). The tail rounds DOWN to a 256-rank multiple (packed 128) —
    toward more int8, conservative for accuracy; tiny test ranks just keep
    an even tail. A requested tail below one 256-rank tile cannot be
    realized; forcing it up would silently move ranks the user asked to
    keep in int8 down to int4, so refuse instead (ADVICE r2).
    """
    hi = max(2, int(rank * frac))
    lo = rank - hi
    if rank >= 512:
        lo = (lo // 256) * 256
        if lo == 0:
            raise ValueError(
                f"int4_rank_frac={frac} leaves an int4 tail of "
                f"{rank - hi} ranks at rank {rank}, below the 256-rank "
                "lane-alignment tile; use factor_dtype='int8' or "
                f"int4_rank_frac <= {(rank - 256) / rank:.3f}"
            )
    else:
        lo -= lo % 2
    return rank - lo


def chunk_bounds(
    k_mat: jax.Array,  # (b, s, n_heads*hd) PRE-RoPE group/layer key matrix
    cos: jax.Array,  # (s, hd) RoPE tables (None -> no rotation)
    sin: jax.Array,
    block: int,
    n_heads: int,
) -> Tuple[jax.Array, jax.Array]:
    """Quest-style per-chunk elementwise (min, max) of the POST-RoPE keys,
    each (b, nc, n_heads*hd) fp32.

    ``U_c = qpos.kmax + qneg.kmin`` then upper-bounds every q.k in chunk c
    (Quest, arXiv:2406.10774 — selection criterion only; realized here over
    the factored xKV cache). Padding rows are excluded by +/-BIG sentinels,
    so an all-padding chunk scores -inf-like and is never selected.

    Memory: a lax.map over chunks rotates/reduces one (b, block, m) block
    at a time — a full-size rotated fp32 copy of the group matrix at 64K
    context is ~1 GB per group and OOM'd prefill compression.
    """
    b, s, m = k_mat.shape
    hd = m // n_heads
    nc = -(-s // block)
    pad = nc * block - s
    if pad:
        k_mat = jnp.pad(k_mat, ((0, 0), (0, pad), (0, 0)))
        if cos is not None:
            cos = jnp.pad(cos, ((0, pad), (0, 0)))
            sin = jnp.pad(sin, ((0, pad), (0, 0)))
    # (nc, b, block, m) so lax.map walks chunks.
    kc = jnp.moveaxis(k_mat.reshape(b, nc, block, m), 1, 0)
    valid = (jnp.arange(nc * block) < s).reshape(nc, 1, block, 1)

    if cos is not None:
        cos_c = cos.reshape(nc, block, hd)
        sin_c = sin.reshape(nc, block, hd)
    else:
        cos_c = sin_c = jnp.zeros((nc, 0, 0), k_mat.dtype)

    def one_chunk(args):
        blk, cosb, sinb, vld = args  # (b, block, m), (block, hd), ...
        x = blk.astype(jnp.float32)
        if cos is not None:
            heads = jnp.transpose(
                x.reshape(b, block, n_heads, hd), (0, 2, 1, 3)
            )
            heads = apply_rope(heads, cosb[None], sinb[None])
            x = jnp.transpose(heads, (0, 2, 1, 3)).reshape(b, block, m)
        lo = jnp.min(jnp.where(vld, x, _BOUND_BIG), axis=1)  # (b, m)
        hi = jnp.max(jnp.where(vld, x, -_BOUND_BIG), axis=1)
        return lo, hi

    kmin, kmax = jax.lax.map(one_chunk, (kc, cos_c, sin_c, valid))
    return jnp.moveaxis(kmin, 0, 1), jnp.moveaxis(kmax, 0, 1)


def compress_svd_group(
    ks: List[jax.Array],
    vs: List[jax.Array],
    grp,
    xkv: XKVConfig,
    cfg: ModelConfig,
    cos_p: jax.Array,
    sin_p: jax.Array,
    fake: bool = False,
    factor_dtype=jnp.bfloat16,
    cache_dtype=jnp.bfloat16,
    rope_dense_keys: bool = True,
    sparse_block: Optional[int] = None,
) -> Tuple[GroupFactors, Dict[int, jax.Array], Dict[int, jax.Array]]:
    """Compress ONE svd layer group's K/V into its GroupFactors.

    The per-group body of ``build_cache`` (same semantics, reference
    `fake_layer_merge_dynamic_cache.py:155-208`), exposed so the staged
    prefill can compress each group as its layers complete — one jit per
    group shape instead of one mega-graph holding every layer's dense K/V
    (the 12-layer 64K monolith OOMs a 16 GB chip at compile).

    ks/vs: per layer of the group, each (b, hkv, s, hd), keys PRE-RoPE.
    Returns (GroupFactors, dense_k, dense_v) — the dense dicts (keyed by
    ``grp.layers``) carry the unmerged side(s).
    """
    svd_kw = dict(
        method=xkv.svd_method,
        oversample=xkv.svd_oversample,
        n_iter=xkv.svd_iters,
        seed=xkv.svd_seed,
    )
    hkv = cfg.num_kv_heads
    layers = grp.layers
    dense_k: Dict[int, jax.Array] = {}
    dense_v: Dict[int, jax.Array] = {}

    def rope_dense_k(k_pre):
        if not rope_dense_keys:
            return k_pre.astype(cache_dtype)
        return apply_rope(k_pre, cos_p[None], sin_p[None]).astype(cache_dtype)

    rope_post = xkv.rope_mode == "post" and rope_dense_keys
    quantize = factor_dtype in ("int8", jnp.int8)
    mixed4 = factor_dtype == "int4"
    if mixed4 and not rope_post and rope_dense_keys:
        raise ValueError(
            "factor_dtype='int4' (mixed int8+int4) requires "
            "rope_mode='post' (the rank-space decode path); MLA "
            "latents are RoPE-free and compose directly"
        )

    def _r_hi(rank):
        return int4_rank_hi(rank, xkv.int4_rank_frac)

    gf_kwargs = {}
    if xkv.merge_key:
        if rope_post:
            ks = [apply_rope(k, cos_p[None], sin_p[None]) for k in ks]
        k_mat = _stack_group_matrix(ks)  # (b, s, g*hkv*hd) — fp32 in factorize
        fac_k = factorize(k_mat, grp.rank_k, **svd_kw)
        if fake:
            k_rec = _split_group_matrix(
                reconstruct(fac_k).astype(k_mat.dtype), len(layers), hkv
            )
            for l, kr in zip(layers, k_rec):
                # Post mode: the reconstruction is already rotated.
                dense_k[l] = (
                    kr.astype(cache_dtype) if rope_post
                    else rope_dense_k(kr)
                )
        elif mixed4:
            from xkv_tpu.compress.quant import quantize_k_factors_mixed4

            qk4 = quantize_k_factors_mixed4(
                fac_k.us, fac_k.vt, _r_hi(grp.rank_k)
            )
            gf_kwargs.update(
                k_us=qk4.us8, k_us4=qk4.us4p, k_vt=qk4.vt8,
                k_vt4=qk4.vt4, k_scale=qk4.out_scale,
                k_scale4=qk4.scale4,
            )
            if not rope_dense_keys:
                # MLA: per-row inv-rms of the DEQUANTIZED latent
                # the absorbed decode will contract against.
                from xkv_tpu.compress.quant import dequantize_k_mixed4

                gf_kwargs["k_rnorm"] = latent_rnorm(
                    dequantize_k_mixed4(qk4), len(layers)
                )
        elif quantize:
            from xkv_tpu.compress.quant import (
                dequantize_k,
                quantize_k_factors,
            )

            qk = quantize_k_factors(fac_k.us, fac_k.vt)
            gf_kwargs["k_us"] = qk.us_q
            gf_kwargs["k_vt"] = qk.vt_q
            gf_kwargs["k_scale"] = qk.out_scale
            if not rope_dense_keys:
                # MLA: rank-space decode needs the per-row inv-rms
                # of the latent decode will reconstruct — i.e. the
                # DEQUANTIZED one.
                gf_kwargs["k_rnorm"] = latent_rnorm(
                    dequantize_k(qk), len(layers)
                )
        else:
            gf_kwargs["k_us"] = fac_k.us.astype(factor_dtype)
            gf_kwargs["k_vt"] = fac_k.vt.astype(factor_dtype)
            if not rope_dense_keys:
                rec = reconstruct(
                    LowRankFactors(
                        gf_kwargs["k_us"].astype(jnp.float32),
                        gf_kwargs["k_vt"].astype(jnp.float32),
                    )
                )
                gf_kwargs["k_rnorm"] = latent_rnorm(rec, len(layers))
        if sparse_block is not None and not fake:
            # Bounds from the EXACT prefill keys (tighter than from
            # the lossy reconstruction; selection is approximate
            # either way). Cast to cache_dtype: K-domain data.
            cmin, cmax = chunk_bounds(
                k_mat,
                cos_p if rope_dense_keys and not rope_post else None,
                sin_p,
                sparse_block, len(layers) * hkv,
            )
            gf_kwargs["k_cmin"] = cmin.astype(cache_dtype)
            gf_kwargs["k_cmax"] = cmax.astype(cache_dtype)
    else:
        for l, k in zip(layers, ks):
            dense_k[l] = rope_dense_k(k)
    if xkv.merge_value:
        v_mat = _stack_group_matrix(vs)
        fac_v = factorize(v_mat, grp.rank_v, **svd_kw)
        if fake:
            v_rec = _split_group_matrix(
                reconstruct(fac_v).astype(v_mat.dtype), len(layers), hkv
            )
            for l, vr in zip(layers, v_rec):
                dense_v[l] = vr.astype(cache_dtype)
        elif mixed4:
            from xkv_tpu.compress.quant import quantize_v_factors_mixed4

            qv4 = quantize_v_factors_mixed4(
                fac_v.us, fac_v.vt, _r_hi(grp.rank_v)
            )
            gf_kwargs.update(
                v_us=qv4.us8, v_us4=qv4.us4p,
                v_scale=qv4.rank_scale, v_vt=qv4.vt,
            )
        elif quantize:
            from xkv_tpu.compress.quant import quantize_v_factors

            qv = quantize_v_factors(fac_v.us, fac_v.vt)
            gf_kwargs["v_us"] = qv.us_q
            gf_kwargs["v_vt"] = qv.vt
            gf_kwargs["v_scale"] = qv.rank_scale
        else:
            gf_kwargs["v_us"] = fac_v.us.astype(factor_dtype)
            gf_kwargs["v_vt"] = fac_v.vt.astype(factor_dtype)
    else:
        for l, v in zip(layers, vs):
            dense_v[l] = v.astype(cache_dtype)
    return GroupFactors(**gf_kwargs), dense_k, dense_v


def build_cache(
    kvs: List[Tuple[jax.Array, jax.Array]],
    xkv: XKVConfig,
    cfg: ModelConfig,
    cos_p: jax.Array,
    sin_p: jax.Array,
    tail_max: int,
    fake: bool = False,
    factor_dtype=jnp.bfloat16,
    cache_dtype=jnp.bfloat16,
    rope_dense_keys: bool = True,
    sparse_block: Optional[int] = None,
    valid_len: Optional[jax.Array] = None,
) -> XKVCache:
    """Compress prefill K/V into the hybrid cache.

    kvs: per layer (k_pre_rope, v), each (b, hkv, s, hd).
    cos_p/sin_p: (s, hd) RoPE tables for prefill positions; applied to the
    keys of dense-stored layers (the factored groups stay pre-RoPE and get
    rotated at read time).
    fake: store dense reconstructions instead of factors (reference parity
    mode — `fake_layer_merge_dynamic_cache.py:202-213`).
    sparse_block: when set, also store Quest-style per-chunk (min, max)
    bounds of the post-RoPE keys (``chunk_bounds``) for sparse top-k decode.
    valid_len: true row count(s) when kvs carry right-padded zero rows
    (bucketed batched admission) — keeps the SLERP divergence threshold on
    real rows; the SVD path is padding-invariant (zero rows of U).
    """
    svd_kw = dict(
        method=xkv.svd_method,
        oversample=xkv.svd_oversample,
        n_iter=xkv.svd_iters,
        seed=xkv.svd_seed,
    )
    hkv = cfg.num_kv_heads
    batch = kvs[0][0].shape[0]

    groups: List[GroupFactors] = []
    dense_k: Dict[int, jax.Array] = {}
    dense_v: Dict[int, jax.Array] = {}
    covered = set()

    def rope_dense_k(k_pre):
        # MLA passes rope_dense_keys=False: its K slot is the RoPE-free
        # latent (reference `deepseek_v2.py:224-227`, re_apply_rope=False).
        if not rope_dense_keys:
            return k_pre.astype(cache_dtype)
        return apply_rope(k_pre, cos_p[None], sin_p[None]).astype(cache_dtype)

    # rope_mode="post": rotate keys at their prefill positions BEFORE the
    # group SVD — the factors then store post-RoPE keys and decode runs in
    # rank space with no reconstruction (configs.py:rope_mode). Only
    # meaningful for RoPE'd caches (MLA latents pass rope_dense_keys=False).
    rope_post = xkv.rope_mode == "post" and rope_dense_keys

    for grp in xkv.layer_groups:
        layers = grp.layers
        covered.update(layers)
        ks = [kvs[l][0] for l in layers]
        vs = [kvs[l][1] for l in layers]

        if xkv.layer_merge_impl == "svd":
            gf, dk, dv = compress_svd_group(
                ks, vs, grp, xkv, cfg, cos_p, sin_p,
                fake=fake, factor_dtype=factor_dtype,
                cache_dtype=cache_dtype, rope_dense_keys=rope_dense_keys,
                sparse_block=sparse_block,
            )
            dense_k.update(dk)
            dense_v.update(dv)
            groups.append(gf)

        elif xkv.layer_merge_impl == "slerp":
            # MiniCache merge (reference semantics). Storage: dense by
            # default / fake mode; with slerp_compact the merged pair is
            # stored as shared direction + norms + exception rows
            # (compress/slerp.py:compact_pair) — divergent rows are exactly
            # parallel after the merge, so only the preserved non-divergent
            # originals consume exception budget.
            compact = xkv.slerp_compact and not fake
            s_rows = ks[0].shape[2]
            keep = max(1, int(xkv.slerp_keep_frac * s_rows))
            gf_kwargs = {}
            if xkv.merge_key:
                k1, k2 = minicache_merge_heads(
                    ks[0], ks[1], t=grp.slerp_t, gamma=grp.slerp_gamma,
                    valid_len=valid_len,
                )
                if compact:
                    gf_kwargs["slerp_k"] = compact_pair(
                        rope_dense_k(k1), rope_dense_k(k2), keep
                    )
                else:
                    dense_k[layers[0]] = rope_dense_k(k1)
                    dense_k[layers[1]] = rope_dense_k(k2)
            else:
                for l, k in zip(layers, ks):
                    dense_k[l] = rope_dense_k(k)
            if xkv.merge_value:
                v1, v2 = minicache_merge_heads(
                    vs[0], vs[1], t=grp.slerp_t, gamma=grp.slerp_gamma,
                    valid_len=valid_len,
                )
                if compact:
                    gf_kwargs["slerp_v"] = compact_pair(
                        v1.astype(cache_dtype), v2.astype(cache_dtype), keep
                    )
                else:
                    dense_v[layers[0]] = v1.astype(cache_dtype)
                    dense_v[layers[1]] = v2.astype(cache_dtype)
            else:
                for l, v in zip(layers, vs):
                    dense_v[l] = v.astype(cache_dtype)
            groups.append(GroupFactors(**gf_kwargs))

    # Ungrouped layers: plain dense cache, post-RoPE K (reference
    # `fake_layer_merge_dynamic_cache.py:149-152`).
    for l in range(len(kvs)):
        if l not in covered:
            dense_k[l] = rope_dense_k(kvs[l][0])
            dense_v[l] = kvs[l][1].astype(cache_dtype)

    tail_k, tail_v = init_tail(cfg, batch, tail_max, cache_dtype)
    return XKVCache(
        groups=tuple(groups),
        dense_k=dense_k,
        dense_v=dense_v,
        tail_k=tail_k,
        tail_v=tail_v,
        tail_len=jnp.zeros((), jnp.int32),
    )


def build_uncompressed_cache(
    kvs: List[Tuple[jax.Array, jax.Array]],
    cfg: ModelConfig,
    cos_p: jax.Array,
    sin_p: jax.Array,
    tail_max: int,
    cache_dtype=jnp.bfloat16,
    rope_dense_keys: bool = True,
) -> XKVCache:
    """Baseline: dense post-RoPE cache for every layer (no compression)."""
    if rope_dense_keys:
        dense_k = {
            l: apply_rope(k, cos_p[None], sin_p[None]).astype(cache_dtype)
            for l, (k, _) in enumerate(kvs)
        }
    else:
        dense_k = {l: k.astype(cache_dtype) for l, (k, _) in enumerate(kvs)}
    dense_v = {l: v.astype(cache_dtype) for l, (_, v) in enumerate(kvs)}
    batch = kvs[0][0].shape[0]
    tail_k, tail_v = init_tail(cfg, batch, tail_max, cache_dtype)
    return XKVCache(
        groups=(),
        dense_k=dense_k,
        dense_v=dense_v,
        tail_k=tail_k,
        tail_v=tail_v,
        tail_len=jnp.zeros((), jnp.int32),
    )


def refactorize_cache(
    cache: XKVCache,
    xkv: XKVConfig,
    cfg: ModelConfig,
    factor_dtype=jnp.bfloat16,
    cache_dtype=jnp.bfloat16,
) -> XKVCache:
    """Fold a FULL decode tail back into the compressed cache.

    The hybrid design appends decode-time K/V to a dense tail (new tokens
    can't cheaply join a frozen factorization). When the tail fills, this
    re-runs the merge over [reconstructed prefill ; tail] per group —
    realizing the periodic-refactorization policy the reference fork only
    sketched (`src/patch_model.py:62-120`, windowed compression).

    Caller contract: ``tail_len == tail_max`` (every tail row valid). The
    tail stores post-RoPE keys; they are un-rotated (RoPE by -θ is exact)
    before joining the pre-RoPE factors. For MLA the K slot holds the
    RoPE-free latent (reference `deepseek_v2.py:224-227`), so no
    un-rotation happens.
    """
    from xkv_tpu.compress.quant import dequantize_k, dequantize_v
    from xkv_tpu.compress.quant import QuantizedKFactors, QuantizedVFactors
    from xkv_tpu.ops.rope import rope_cos_sin

    s_p = cache.prefill_len
    t = cache.tail_max
    rope_keys = cfg.model_type != "deepseek_v2"
    # Post mode: factors already hold post-RoPE keys — the tail (also
    # post-RoPE) joins them directly, with no un-rotation.
    rope_post = xkv.rope_mode == "post" and rope_keys

    if rope_keys:
        cos_t, sin_t = rope_cos_sin(
            s_p + jnp.arange(t), cfg.head_dim, cfg.rope_theta, cfg.rope_scaling
        )

    svd_kw = dict(
        method=xkv.svd_method,
        oversample=xkv.svd_oversample,
        n_iter=xkv.svd_iters,
        seed=xkv.svd_seed,
    )
    quantized = any(g.k_scale is not None or g.v_scale is not None
                    for g in cache.groups)

    def unrope(k):  # (b, hkv, t, hd) post-RoPE -> the factors' key domain
        if not rope_keys or rope_post:
            return k  # MLA latent slot / post-RoPE factors: keep as stored
        return apply_rope(k, cos_t[None], -sin_t[None])

    new_groups = []
    for grp, gf in zip(xkv.layer_groups, cache.groups):
        layers = grp.layers
        kw = {}
        if gf.k_us is not None:
            if gf.k_us4 is not None:
                from xkv_tpu.compress.quant import (
                    QuantizedKFactorsMixed4,
                    dequantize_k_mixed4,
                )

                k_mat = dequantize_k_mixed4(QuantizedKFactorsMixed4(
                    gf.k_us, gf.k_us4, gf.k_vt, gf.k_vt4,
                    gf.k_scale, gf.k_scale4,
                ))
            elif gf.k_scale is not None:
                k_mat = dequantize_k(
                    QuantizedKFactors(gf.k_us, gf.k_vt, gf.k_scale)
                )
            else:
                k_mat = reconstruct(
                    LowRankFactors(gf.k_us.astype(jnp.float32),
                                   gf.k_vt.astype(jnp.float32))
                )
            tail_pre = _stack_group_matrix(
                [unrope(cache.tail_k[l].astype(jnp.float32)) for l in layers]
            )
            k_ext = jnp.concatenate([k_mat, tail_pre], axis=1)
            fac_k = factorize(k_ext, grp.rank_k, **svd_kw)
            if gf.k_us4 is not None:
                from xkv_tpu.compress.quant import (
                    quantize_k_factors_mixed4,
                )

                qk4 = quantize_k_factors_mixed4(
                    fac_k.us, fac_k.vt, gf.k_us.shape[2]
                )
                kw.update(
                    k_us=qk4.us8, k_us4=qk4.us4p, k_vt=qk4.vt8,
                    k_vt4=qk4.vt4, k_scale=qk4.out_scale,
                    k_scale4=qk4.scale4,
                )
                if gf.k_rnorm is not None:
                    from xkv_tpu.compress.quant import dequantize_k_mixed4

                    kw["k_rnorm"] = latent_rnorm(
                        dequantize_k_mixed4(qk4), len(layers)
                    )
            elif quantized:
                from xkv_tpu.compress.quant import quantize_k_factors

                qk = quantize_k_factors(fac_k.us, fac_k.vt)
                kw.update(k_us=qk.us_q, k_vt=qk.vt_q, k_scale=qk.out_scale)
                if gf.k_rnorm is not None:
                    from xkv_tpu.compress.quant import dequantize_k

                    kw["k_rnorm"] = latent_rnorm(
                        dequantize_k(qk), len(layers)
                    )
            else:
                kw.update(
                    k_us=fac_k.us.astype(factor_dtype),
                    k_vt=fac_k.vt.astype(factor_dtype),
                )
                if gf.k_rnorm is not None:
                    kw["k_rnorm"] = latent_rnorm(
                        reconstruct(LowRankFactors(
                            kw["k_us"].astype(jnp.float32),
                            kw["k_vt"].astype(jnp.float32),
                        )),
                        len(layers),
                    )
            if gf.k_cmin is not None:
                block = -(-s_p // gf.k_cmin.shape[1])
                cos_f, sin_f = (
                    rope_cos_sin(jnp.arange(s_p + t), cfg.head_dim,
                                 cfg.rope_theta, cfg.rope_scaling)
                    if rope_keys and not rope_post else (None, None)
                )
                cmin, cmax = chunk_bounds(
                    k_ext, cos_f, sin_f, block, len(layers) * cfg.num_kv_heads
                )
                kw["k_cmin"] = cmin.astype(gf.k_cmin.dtype)
                kw["k_cmax"] = cmax.astype(gf.k_cmax.dtype)
        if gf.v_us is not None:
            if gf.v_us4 is not None:
                from xkv_tpu.compress.quant import (
                    QuantizedVFactorsMixed4,
                    dequantize_v_mixed4,
                )

                v_mat = dequantize_v_mixed4(QuantizedVFactorsMixed4(
                    gf.v_us, gf.v_us4, gf.v_scale, gf.v_vt
                ))
            elif gf.v_scale is not None:
                v_mat = dequantize_v(
                    QuantizedVFactors(gf.v_us, gf.v_scale, gf.v_vt)
                )
            else:
                v_mat = reconstruct(
                    LowRankFactors(gf.v_us.astype(jnp.float32),
                                   gf.v_vt.astype(jnp.float32))
                )
            tail_v = _stack_group_matrix(
                [cache.tail_v[l].astype(jnp.float32) for l in layers]
            )
            v_ext = jnp.concatenate([v_mat, tail_v], axis=1)
            fac_v = factorize(v_ext, grp.rank_v, **svd_kw)
            if gf.v_us4 is not None:
                from xkv_tpu.compress.quant import (
                    quantize_v_factors_mixed4,
                )

                qv4 = quantize_v_factors_mixed4(
                    fac_v.us, fac_v.vt, gf.v_us.shape[2]
                )
                kw.update(
                    v_us=qv4.us8, v_us4=qv4.us4p,
                    v_scale=qv4.rank_scale, v_vt=qv4.vt,
                )
            elif quantized:
                from xkv_tpu.compress.quant import quantize_v_factors

                qv = quantize_v_factors(fac_v.us, fac_v.vt)
                kw.update(v_us=qv.us_q, v_vt=qv.vt, v_scale=qv.rank_scale)
            else:
                kw.update(
                    v_us=fac_v.us.astype(factor_dtype),
                    v_vt=fac_v.vt.astype(factor_dtype),
                )
        if gf.slerp_k is not None or gf.slerp_v is not None:
            # Compact MiniCache groups: reconstruct both layers, append the
            # tail (rows are stored post-RoPE / V-plain — same domain the
            # compacter works in), re-compact. Budget grows by the tail
            # rows so previously-kept originals AND every tail row stay
            # exact across the fold.
            from xkv_tpu.compress.slerp import compact_reconstruct

            def refold(sc, tails):
                keep_new = sc.keep_idx.shape[2] + t
                x1 = jnp.concatenate(
                    [compact_reconstruct(sc, 0, jnp.float32),
                     tails[0].astype(jnp.float32)], axis=2
                )
                x2 = jnp.concatenate(
                    [compact_reconstruct(sc, 1, jnp.float32),
                     tails[1].astype(jnp.float32)], axis=2
                )
                new = compact_pair(x1, x2, keep_new)
                return new.replace(
                    base=new.base.astype(sc.base.dtype),
                    keep_rows=new.keep_rows.astype(sc.keep_rows.dtype),
                )

            if gf.slerp_k is not None:
                kw["slerp_k"] = refold(
                    gf.slerp_k, [cache.tail_k[l] for l in layers]
                )
            if gf.slerp_v is not None:
                kw["slerp_v"] = refold(
                    gf.slerp_v, [cache.tail_v[l] for l in layers]
                )
        new_groups.append(GroupFactors(**kw))

    # Dense segments: concat the (already post-RoPE) tail.
    new_dense_k = {
        l: jnp.concatenate(
            [cache.dense_k[l], cache.tail_k[l].astype(cache.dense_k[l].dtype)],
            axis=2,
        )
        for l in cache.dense_k
    }
    new_dense_v = {
        l: jnp.concatenate(
            [cache.dense_v[l], cache.tail_v[l].astype(cache.dense_v[l].dtype)],
            axis=2,
        )
        for l in cache.dense_v
    }

    batch = cache.tail_k.shape[1]
    tail_k, tail_v = init_tail(cfg, batch, t, cache.tail_k.dtype)
    return XKVCache(
        groups=tuple(new_groups),
        dense_k=new_dense_k,
        dense_v=new_dense_v,
        tail_k=tail_k,
        tail_v=tail_v,
        tail_len=jnp.zeros((), jnp.int32),
    )


def refactorize_slot_cache(
    cache: XKVCache,
    xkv: XKVConfig,
    cfg: ModelConfig,
    slot: jax.Array,
    plen: jax.Array,
) -> XKVCache:
    """Fold ONE slot's full decode tail back into its factors, IN PLACE
    within the slot's static row capacity (continuous batching).

    Unlike ``refactorize_cache``, factor shapes don't grow: the tail tokens
    take rows [plen, plen + tail_max) of the slot's (s_max-padded) factor
    row space — padding rows are exactly zero (zero rows of U), so they are
    free to occupy. The slot keeps generating until plen reaches s_max.

    Caller contract: the slot's tail is FULL (tail_len == tail_max) and
    ``plen + tail_max <= s_max`` (the dynamic_update_slice would otherwise
    clamp and corrupt rows). ``slot``/``plen`` are traced scalars — one
    compile serves every slot and length.
    """
    from xkv_tpu.compress.quant import (
        QuantizedKFactors,
        QuantizedVFactors,
        dequantize_k,
        dequantize_v,
        quantize_k_factors,
        quantize_v_factors,
    )
    from xkv_tpu.ops.rope import rope_cos_sin

    t = cache.tail_max
    rope_keys = cfg.model_type != "deepseek_v2"
    rope_post = xkv.rope_mode == "post" and rope_keys
    svd_kw = dict(
        method=xkv.svd_method,
        oversample=xkv.svd_oversample,
        n_iter=xkv.svd_iters,
        seed=xkv.svd_seed,
    )

    if rope_keys:
        cos_t, sin_t = rope_cos_sin(
            plen + jnp.arange(t), cfg.head_dim, cfg.rope_theta, cfg.rope_scaling
        )

    def unrope(k):  # (1, hkv, t, hd) post-RoPE -> the factors' key domain
        if not rope_keys or rope_post:
            return k
        return apply_rope(k, cos_t[None], -sin_t[None])

    def take(x, axis):
        return jax.lax.dynamic_slice_in_dim(x, slot, 1, axis)

    def put(dst, src, axis):
        return jax.lax.dynamic_update_slice_in_dim(
            dst, src.astype(dst.dtype), slot, axis
        )

    new_groups = []
    for grp, gf in zip(xkv.layer_groups, cache.groups):
        layers = grp.layers
        kw = dict(
            k_us=gf.k_us, k_vt=gf.k_vt, k_scale=gf.k_scale,
            v_us=gf.v_us, v_vt=gf.v_vt, v_scale=gf.v_scale,
            k_us4=gf.k_us4, k_vt4=gf.k_vt4, k_scale4=gf.k_scale4,
            v_us4=gf.v_us4,
            k_rnorm=gf.k_rnorm,
            k_cmin=gf.k_cmin, k_cmax=gf.k_cmax,
            slerp_k=gf.slerp_k, slerp_v=gf.slerp_v,
        )
        if gf.k_us is not None:
            if gf.k_us4 is not None:
                from xkv_tpu.compress.quant import (
                    QuantizedKFactorsMixed4,
                    dequantize_k_mixed4,
                )

                k_mat = dequantize_k_mixed4(QuantizedKFactorsMixed4(
                    take(gf.k_us, 0), take(gf.k_us4, 0), take(gf.k_vt, 0),
                    take(gf.k_vt4, 0), take(gf.k_scale, 0),
                    take(gf.k_scale4, 0),
                ))
            elif gf.k_scale is not None:
                k_mat = dequantize_k(QuantizedKFactors(
                    take(gf.k_us, 0), take(gf.k_vt, 0), take(gf.k_scale, 0)
                ))
            else:
                k_mat = reconstruct(LowRankFactors(
                    take(gf.k_us, 0).astype(jnp.float32),
                    take(gf.k_vt, 0).astype(jnp.float32),
                ))
            tail_pre = _stack_group_matrix(
                [unrope(take(cache.tail_k[l], 0).astype(jnp.float32))
                 for l in layers]
            )  # (1, t, g*hkv*hd)
            k_ext = jax.lax.dynamic_update_slice(k_mat, tail_pre, (0, plen, 0))
            fac_k = factorize(k_ext, grp.rank_k, **svd_kw)
            if gf.k_us4 is not None:
                from xkv_tpu.compress.quant import (
                    quantize_k_factors_mixed4,
                )

                qk4 = quantize_k_factors_mixed4(
                    fac_k.us, fac_k.vt, gf.k_us.shape[2]
                )
                kw.update(
                    k_us=put(gf.k_us, qk4.us8, 0),
                    k_us4=put(gf.k_us4, qk4.us4p, 0),
                    k_vt=put(gf.k_vt, qk4.vt8, 0),
                    k_vt4=put(gf.k_vt4, qk4.vt4, 0),
                    k_scale=put(gf.k_scale, qk4.out_scale, 0),
                    k_scale4=put(gf.k_scale4, qk4.scale4, 0),
                )
                if gf.k_rnorm is not None:
                    from xkv_tpu.compress.quant import dequantize_k_mixed4

                    kw["k_rnorm"] = put(
                        gf.k_rnorm,
                        latent_rnorm(dequantize_k_mixed4(qk4), len(layers)),
                        0,
                    )
            elif gf.k_scale is not None:
                qk = quantize_k_factors(fac_k.us, fac_k.vt)
                kw.update(
                    k_us=put(gf.k_us, qk.us_q, 0),
                    k_vt=put(gf.k_vt, qk.vt_q, 0),
                    k_scale=put(gf.k_scale, qk.out_scale, 0),
                )
                if gf.k_rnorm is not None:
                    kw["k_rnorm"] = put(
                        gf.k_rnorm,
                        latent_rnorm(dequantize_k(qk), len(layers)), 0,
                    )
            else:
                kw.update(
                    k_us=put(gf.k_us, fac_k.us, 0),
                    k_vt=put(gf.k_vt, fac_k.vt, 0),
                )
                if gf.k_rnorm is not None:
                    kw["k_rnorm"] = put(
                        gf.k_rnorm,
                        latent_rnorm(
                            reconstruct(LowRankFactors(
                                fac_k.us.astype(jnp.float32),
                                fac_k.vt.astype(jnp.float32),
                            )),
                            len(layers),
                        ), 0,
                    )
            if gf.k_cmin is not None:
                s_rows = gf.k_us.shape[1]
                block = -(-s_rows // gf.k_cmin.shape[1])
                cos_f, sin_f = (
                    rope_cos_sin(jnp.arange(s_rows), cfg.head_dim,
                                 cfg.rope_theta, cfg.rope_scaling)
                    if rope_keys and not rope_post else (None, None)
                )
                cmin, cmax = chunk_bounds(
                    k_ext, cos_f, sin_f, block,
                    len(layers) * cfg.num_kv_heads,
                )
                kw["k_cmin"] = put(gf.k_cmin, cmin, 0)
                kw["k_cmax"] = put(gf.k_cmax, cmax, 0)
        if gf.v_us is not None:
            if gf.v_us4 is not None:
                from xkv_tpu.compress.quant import (
                    QuantizedVFactorsMixed4,
                    dequantize_v_mixed4,
                )

                v_mat = dequantize_v_mixed4(QuantizedVFactorsMixed4(
                    take(gf.v_us, 0), take(gf.v_us4, 0),
                    take(gf.v_scale, 0), take(gf.v_vt, 0),
                ))
            elif gf.v_scale is not None:
                v_mat = dequantize_v(QuantizedVFactors(
                    take(gf.v_us, 0), take(gf.v_scale, 0), take(gf.v_vt, 0)
                ))
            else:
                v_mat = reconstruct(LowRankFactors(
                    take(gf.v_us, 0).astype(jnp.float32),
                    take(gf.v_vt, 0).astype(jnp.float32),
                ))
            tail_v = _stack_group_matrix(
                [take(cache.tail_v[l], 0).astype(jnp.float32) for l in layers]
            )
            v_ext = jax.lax.dynamic_update_slice(v_mat, tail_v, (0, plen, 0))
            fac_v = factorize(v_ext, grp.rank_v, **svd_kw)
            if gf.v_us4 is not None:
                from xkv_tpu.compress.quant import (
                    quantize_v_factors_mixed4,
                )

                qv4 = quantize_v_factors_mixed4(
                    fac_v.us, fac_v.vt, gf.v_us.shape[2]
                )
                kw.update(
                    v_us=put(gf.v_us, qv4.us8, 0),
                    v_us4=put(gf.v_us4, qv4.us4p, 0),
                    v_scale=put(gf.v_scale, qv4.rank_scale, 0),
                    v_vt=put(gf.v_vt, qv4.vt, 0),
                )
            elif gf.v_scale is not None:
                qv = quantize_v_factors(fac_v.us, fac_v.vt)
                kw.update(
                    v_us=put(gf.v_us, qv.us_q, 0),
                    v_vt=put(gf.v_vt, qv.vt, 0),
                    v_scale=put(gf.v_scale, qv.rank_scale, 0),
                )
            else:
                kw.update(
                    v_us=put(gf.v_us, fac_v.us, 0),
                    v_vt=put(gf.v_vt, fac_v.vt, 0),
                )
        if gf.slerp_k is not None or gf.slerp_v is not None:
            # Compact MiniCache slot: reconstruct both layers, write the
            # tail rows into [plen, plen+t) of the slot's row space (K is
            # stored post-RoPE — same domain as the tail), re-compact at
            # the slot's FIXED exception budget. Unlike the growing
            # single-stream refold, rows past the budget may be
            # re-approximated (BatchedEngine._empty_batch_cache sizes the
            # budget for keep_frac * s_max + one fold).
            from xkv_tpu.compress.slerp import (
                compact_pair,
                compact_reconstruct,
            )

            def take_sc(sc):
                from xkv_tpu.cache import SlerpCompact

                return SlerpCompact(
                    base=take(sc.base, 0), norms=take(sc.norms, 0),
                    keep_idx=take(sc.keep_idx, 0),
                    keep_rows=take(sc.keep_rows, 0),
                )

            def refold_slot(sc_full, tails):
                sc = take_sc(sc_full)
                D = sc_full.keep_idx.shape[2]
                x1 = compact_reconstruct(sc, 0, jnp.float32)
                x2 = compact_reconstruct(sc, 1, jnp.float32)
                x1 = jax.lax.dynamic_update_slice(
                    x1, tails[0].astype(jnp.float32), (0, 0, plen, 0))
                x2 = jax.lax.dynamic_update_slice(
                    x2, tails[1].astype(jnp.float32), (0, 0, plen, 0))
                new = compact_pair(x1, x2, D)
                return SlerpCompact(
                    base=put(sc_full.base, new.base, 0),
                    norms=put(sc_full.norms, new.norms, 0),
                    keep_idx=put(sc_full.keep_idx, new.keep_idx, 0),
                    keep_rows=put(sc_full.keep_rows, new.keep_rows, 0),
                )

            from xkv_tpu.cache import SlerpCompact

            if gf.slerp_k is not None:
                kw["slerp_k"] = refold_slot(
                    gf.slerp_k,
                    [take(cache.tail_k[l], 0) for l in layers],
                )
            if gf.slerp_v is not None:
                kw["slerp_v"] = refold_slot(
                    gf.slerp_v,
                    [take(cache.tail_v[l], 0) for l in layers],
                )
        new_groups.append(GroupFactors(**kw))

    # Dense segments (ungrouped / slerp / MLA k_pe): the tail is already in
    # storage form (post-RoPE keys); copy rows into [plen, plen + t).
    new_dense_k = {}
    for l, dst in cache.dense_k.items():
        src = take(cache.tail_k[l], 0).astype(dst.dtype)  # (1, hkv, t, hd)
        new_dense_k[l] = jax.lax.dynamic_update_slice(
            dst, src, (slot, 0, plen, 0)
        )
    new_dense_v = {}
    for l, dst in cache.dense_v.items():
        src = take(cache.tail_v[l], 0).astype(dst.dtype)
        new_dense_v[l] = jax.lax.dynamic_update_slice(
            dst, src, (slot, 0, plen, 0)
        )

    # Zero the slot's tail (preserves the zero-rows-beyond-tail_len
    # invariant the next fold relies on).
    L = cache.tail_k.shape[0]
    tail_k = jax.lax.dynamic_update_slice(
        cache.tail_k,
        jnp.zeros((L, 1) + cache.tail_k.shape[2:], cache.tail_k.dtype),
        (0, slot, 0, 0, 0),
    )
    tail_v = jax.lax.dynamic_update_slice(
        cache.tail_v,
        jnp.zeros((L, 1) + cache.tail_v.shape[2:], cache.tail_v.dtype),
        (0, slot, 0, 0, 0),
    )
    return cache.replace(
        groups=tuple(new_groups),
        dense_k=new_dense_k,
        dense_v=new_dense_v,
        tail_k=tail_k,
        tail_v=tail_v,
    )
