"""Pure-JAX Llama-family decoder (covers Llama 2/3, Mistral, Qwen2).

Functional-style: parameters are a nested dict pytree; forward functions are
pure and jit/pjit-friendly. This replaces the reference's approach of
monkey-patching HF PyTorch modules (`xKV/attn_patch/llama.py:77-88`) with a
native model whose attention reads the compressed cache directly.

xKV numerical contract implemented here (reference `xKV/attn_patch/llama.py:19-73`):
  * Prefill attention uses the *fresh*, locally-RoPE'd K — compression never
    affects prefill outputs.
  * The cache stores pre-RoPE keys for merged groups (RoPE applied after
    reconstruction at decode) and post-RoPE keys for dense layers.
  * Decode attention reads the merged (factored) cache + the dense tail.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from xkv_tpu.cache import XKVCache, layer_group_index, vt_layer_slice
from xkv_tpu.configs import XKVConfig
from xkv_tpu.models.config import ModelConfig
from xkv_tpu.ops.attention import (
    PartialAttention,
    blockwise_causal_attention,
    dense_decode_attention_xla,
    factored_decode_attention_xla,
    merge_partials,
    mha_reference,
    rankspace_decode_attention_xla,
    select_topk_chunks,
    sparse_factored_decode_attention_xla,
    sparse_rankspace_decode_attention_xla,
)
from xkv_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]


# ----------------------------------------------------------------- init/load
def init_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16, scale: float = 0.02
) -> Params:
    """Random-init parameters (tests / synthetic benchmarks)."""
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 8))

    def dense(shape):
        return (scale * jax.random.normal(next(keys), shape, jnp.float32)).astype(dtype)

    d, f = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, hd = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "attn": {
                "wq": dense((d, hq * hd)),
                "wk": dense((d, hkv * hd)),
                "wv": dense((d, hkv * hd)),
                "wo": dense((hq * hd, d)),
            },
            "mlp": {
                "w_gate": dense((d, f)),
                "w_up": dense((d, f)),
                "w_down": dense((f, d)),
            },
            "input_norm": jnp.ones((d,), dtype),
            "post_norm": jnp.ones((d,), dtype),
        }
        if cfg.attention_bias:
            layer["attn"]["bq"] = jnp.zeros((hq * hd,), dtype)
            layer["attn"]["bk"] = jnp.zeros((hkv * hd,), dtype)
            layer["attn"]["bv"] = jnp.zeros((hkv * hd,), dtype)
        layers.append(layer)
    params: Params = {
        "embed": dense((cfg.vocab_size, d)),
        "layers": layers,
        "final_norm": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense((d, cfg.vocab_size))
    return params


# ----------------------------------------------------------------- building blocks
def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def mlp(p: Params, x: jax.Array) -> jax.Array:
    gate = jax.nn.silu(x @ p["w_gate"])
    return (gate * (x @ p["w_up"])) @ p["w_down"]


def qkv_proj(
    p: Params, cfg: ModelConfig, x: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: (b, s, d) -> q (b, hq, s, hd), k/v (b, hkv, s, hd)."""
    b, s, _ = x.shape
    q = x @ p["wq"]
    k = x @ p["wk"]
    v = x @ p["wv"]
    if "bq" in p:
        q = q + p["bq"]
        k = k + p["bk"]
        v = v + p["bv"]
    q = jnp.transpose(q.reshape(b, s, cfg.num_q_heads, cfg.head_dim), (0, 2, 1, 3))
    k = jnp.transpose(k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim), (0, 2, 1, 3))
    v = jnp.transpose(v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim), (0, 2, 1, 3))
    return q, k, v


def unembed(params: Params, cfg: ModelConfig, h: jax.Array) -> jax.Array:
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    w = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return (h @ w).astype(jnp.float32)


# ----------------------------------------------------------------- prefill
def _prefill_layer(
    layer: Params,
    cfg: ModelConfig,
    h: jax.Array,  # (b, s, d)
    cos: jax.Array,
    sin: jax.Array,
    scale: float,
    attention_impl: str,
    mesh=None,
    sequence_parallel: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decoder layer of the causal prefill forward.

    Returns (h', k_pre_rope, v). Shared by the monolithic ``prefill`` and
    the staged per-group path (``prefill_layer_span``) so both are
    numerics-identical by construction.
    """
    b, s = h.shape[0], h.shape[1]
    resid = h
    x = rms_norm(h, layer["input_norm"], cfg.rms_norm_eps)
    q, k_pre, v = qkv_proj(layer["attn"], cfg, x)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k_pre, cos, sin)
    if sequence_parallel:
        from xkv_tpu.ops.ring_attention import ring_attention

        attn = ring_attention(
            q, k, v, mesh=mesh, axis_name="data", scale=scale,
            causal=True, window=cfg.sliding_window,
        )
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, s, -1)
    elif attention_impl == "pallas":
        if mesh is not None:
            from xkv_tpu.ops.pallas.flash_attention import flash_attention_tp

            attn = flash_attention_tp(
                mesh, q, k, v, scale=scale, causal=True,
                window=cfg.sliding_window,
            )  # (b, s, hq, hd), head-sharded
        else:
            from xkv_tpu.ops.pallas.flash_attention import flash_attention_fwd

            attn = flash_attention_fwd(
                q, k, v, scale=scale, causal=True, window=cfg.sliding_window
            )  # (b, s, hq, hd)
        attn = attn.reshape(b, s, -1)
    elif s > 2048:
        # Blockwise XLA attention: never materializes (s, s) scores.
        from xkv_tpu.ops.attention import blockwise_causal_attention

        attn = blockwise_causal_attention(
            q, k, v, scale, window=cfg.sliding_window
        )
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, s, -1)
    else:
        attn = mha_reference(q, k, v, scale, causal=True, window=cfg.sliding_window)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, s, -1)
    h = resid + attn @ layer["attn"]["wo"]
    h = h + mlp(layer["mlp"], rms_norm(h, layer["post_norm"], cfg.rms_norm_eps))
    return h, k_pre, v


def prefill_layer_span(
    layers: List[Params],
    cfg: ModelConfig,
    h: jax.Array,  # (b, s, d) activations entering the span
    cos: jax.Array,
    sin: jax.Array,
    attention_impl: str = "xla",
) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
    """A contiguous span of decoder layers of the prefill forward.

    The staged prefill (engine ``staged_prefill=True``) runs the model one
    SVD group at a time — each span's dense K/V is compressed and freed
    before the next span runs, so peak HBM holds ONE group's K/V instead
    of every layer's (the monolithic 12-layer graph at 64K carries 10.6 GB
    of K/V temps and OOMs a 16 GB chip at compile; see docs/DESIGN.md).
    One compiled span serves every group of the same size.

    Returns (h', [(k_pre_rope, v)] per layer).
    """
    scale = 1.0 / math.sqrt(cfg.head_dim)
    kvs = []
    for layer in layers:
        h, k_pre, v = _prefill_layer(
            layer, cfg, h, cos, sin, scale, attention_impl
        )
        kvs.append((k_pre, v))
    return h, kvs


def prefill(
    params: Params,
    cfg: ModelConfig,
    tokens: jax.Array,
    attention_impl: str = "xla",
    logits_position: Optional[jax.Array] = None,
    mesh=None,
    sequence_parallel: bool = False,
) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
    """Full causal forward over a prompt.

    tokens: (b, s) int32. Returns (logits (b, s, vocab) fp32,
    [(k_pre_rope, v)] per layer, each (b, hkv, s, hd)).

    ``logits_position`` (scalar, static or traced): compute logits only at
    that sequence position — returns (b, 1, vocab). Generation needs only
    the last valid position; the full (b, s, vocab) fp32 unembed is an
    s/1-times larger HBM spike (4.2 GB at 32K x 32000) and dominates
    prefill memory at long context.

    Attention uses the locally-RoPE'd fresh K (reference
    `xKV/attn_patch/llama.py:50`), so prefill is identical with or without
    compression; the pre-RoPE K is what gets cached/merged.
    """
    b, s = tokens.shape
    positions = jnp.arange(s)[None, :]
    cos, sin = rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling
    )
    scale = 1.0 / math.sqrt(cfg.head_dim)

    if sequence_parallel:
        # SP prefill (>chip-context): activations/K/V sharded along the
        # sequence over the mesh data axis; attention runs the ring
        # (ops/ring_attention.py). Elementwise/matmul ops shard trivially;
        # RoPE tables are global-position so sharded rows rotate correctly.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from xkv_tpu.ops.ring_attention import ring_attention

        if mesh is None or "data" not in mesh.shape:
            raise ValueError("sequence_parallel prefill needs a mesh with "
                             "a 'data' axis")
        if s % mesh.shape["data"]:
            raise ValueError(
                f"data axis size {mesh.shape['data']} must divide seq {s}"
            )
        seq_sharded = jax.lax.with_sharding_constraint
        sp_spec = NamedSharding(mesh, P(None, "data", None))

    h = params["embed"][tokens]
    if sequence_parallel:
        h = seq_sharded(h, sp_spec)
    kvs: List[Tuple[jax.Array, jax.Array]] = []
    for layer in params["layers"]:
        h, k_pre, v = _prefill_layer(
            layer, cfg, h, cos, sin, scale, attention_impl,
            mesh=mesh, sequence_parallel=sequence_parallel,
        )
        kvs.append((k_pre, v))
    if logits_position is not None:
        h = jax.lax.dynamic_slice_in_dim(h, logits_position, 1, axis=1)
    logits = unembed(params, cfg, h)
    return logits, kvs


def prefill_chunk(
    params: Params,
    cfg: ModelConfig,
    chunk_tokens: jax.Array,  # (b, C) — one admission chunk
    scratch_k: jax.Array,  # (L, b, hkv, S, hd) pre-RoPE K scratch
    scratch_v: jax.Array,  # (L, b, hkv, S, hd)
    pos0: jax.Array,  # () int32 — absolute position of chunk row 0
    cos_s: jax.Array,  # (S, hd) RoPE tables for the scratch positions
    sin_s: jax.Array,
    last_idx: jax.Array,  # () int32 — chunk row whose logits to return
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One chunk of a chunked (incremental) prefill.

    Runs the forward over ``chunk_tokens`` at absolute positions
    [pos0, pos0+C), writes the chunk's pre-RoPE K and V into the scratch
    buffers at pos0, and attends causally over the scratch's valid region
    [0, pos0+C) — so a long admission can interleave with decode steps in
    the batched scheduler instead of monopolizing the chip. ``pos0`` and
    ``last_idx`` are traced: ONE compile serves every chunk of a bucket.

    Numerics match the monolithic ``prefill`` exactly (same fresh-K local
    RoPE convention); cost is ~2x its attention FLOPs (each chunk scans the
    whole padded scratch with masking — the price of static shapes).

    Returns (logits (b, 1, vocab) at chunk row ``last_idx``, scratch_k,
    scratch_v). Donate the scratches for in-place updates.
    """
    b, C = chunk_tokens.shape
    hd = cfg.head_dim
    cos_c = jax.lax.dynamic_slice(cos_s, (pos0, 0), (C, hd))[None]
    sin_c = jax.lax.dynamic_slice(sin_s, (pos0, 0), (C, hd))[None]
    scale = 1.0 / math.sqrt(hd)
    kv_valid = pos0 + C

    h = params["embed"][chunk_tokens]
    for li, layer in enumerate(params["layers"]):
        resid = h
        x = rms_norm(h, layer["input_norm"], cfg.rms_norm_eps)
        q, k_pre, v = qkv_proj(layer["attn"], cfg, x)
        q = apply_rope(q, cos_c, sin_c)
        scratch_k = jax.lax.dynamic_update_slice(
            scratch_k, k_pre[None].astype(scratch_k.dtype), (li, 0, 0, pos0, 0)
        )
        scratch_v = jax.lax.dynamic_update_slice(
            scratch_v, v[None].astype(scratch_v.dtype), (li, 0, 0, pos0, 0)
        )
        k_all = apply_rope(
            scratch_k[li].astype(k_pre.dtype), cos_s[None], sin_s[None]
        )
        attn = blockwise_causal_attention(
            q, k_all, scratch_v[li].astype(v.dtype), scale,
            window=cfg.sliding_window, q_offset=pos0, kv_valid=kv_valid,
        )
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, C, -1)
        h = resid + attn @ layer["attn"]["wo"]
        h = h + mlp(layer["mlp"], rms_norm(h, layer["post_norm"], cfg.rms_norm_eps))
    h_last = jax.lax.dynamic_slice_in_dim(h, last_idx, 1, axis=1)
    logits = unembed(params, cfg, h_last)
    return logits, scratch_k, scratch_v


# ----------------------------------------------------------------- decode
def _post_rope_factored_part(
    q: jax.Array,  # (b, hq, ql, hd) POST-RoPE queries
    gf,
    gpos: int,
    cfg: ModelConfig,
    scale: float,
    k_scale_slice: Optional[jax.Array],
    sparse_ok: bool,
    sparse_select: Optional[int],
    sparse_block: int,
    attention_impl: str,
    pallas_ok: bool,
    tp_ok: bool,
    mesh,
    lengths: Optional[jax.Array] = None,  # (b,) valid prefill lengths
    win_lo: Optional[jax.Array] = None,  # (b,) sliding-window lower bound
    sparse_select_max: Optional[int] = None,  # adaptive budget ceiling
    sparse_adaptive_band: float = 0.5,  # hot-chunk band (adaptive_hot_chunks)
) -> PartialAttention:
    """Attention over a POST-RoPE factored group (rope_mode="post").

    The factors store rotated keys, so decode runs entirely in rank space —
    scores = (q . vt^T) . us^T, values = ((P . v_us) * scale) . v_vt — with
    no per-step reconstruction and no trig (configs.py:rope_mode). Pallas
    fast path: ops/pallas/rankspace_attention.py; sparse top-k restricts
    the walk to Quest-selected chunks.
    """
    hkv = cfg.num_kv_heads
    hd = cfg.head_dim
    vt_k = vt_layer_slice(gf.k_vt, gpos, hkv, hd)
    vt_v = vt_layer_slice(gf.v_vt, gpos, hkv, hd)

    if gf.k_us4 is not None:
        # Mixed int8+int4 factors (factor_dtype='int4'): packed-nibble
        # kernel or the XLA mixed path. TP combos are engine-gated.
        kw4 = dict(
            k_us4=gf.k_us4,
            k_vt4_slice=vt_layer_slice(gf.k_vt4, gpos, hkv, hd),
            k_scale4_slice=vt_layer_slice(gf.k_scale4, gpos, hkv, hd),
            v_us4=gf.v_us4,
        )
        if sparse_ok:
            # sparse x int4 (round 4): Quest selection, then rank-space
            # attention over the gathered int8+packed-int4 rows (XLA —
            # the packed-nibble Pallas kernel has no sparse variant yet).
            nc = gf.k_cmin.shape[1]
            blk = sparse_block
            assert nc == -(-gf.k_us.shape[1] // blk), (
                "k_cmin chunk count does not match sparse_block")
            ids = select_topk_chunks(
                q, vt_layer_slice(gf.k_cmin, gpos, hkv, hd),
                vt_layer_slice(gf.k_cmax, gpos, hkv, hd),
                n_select=min(sparse_select, nc), num_kv_heads=hkv,
                valid_len=lengths, block=blk, win_lo=win_lo,
            )
            return sparse_rankspace_decode_attention_xla(
                q, gf.k_us, vt_k, gf.v_us, vt_v, ids, scale, hkv,
                block=blk, k_scale_slice=k_scale_slice,
                v_rank_scale=gf.v_scale, valid_len=lengths,
                valid_lo=win_lo, **kw4,
            )
        if attention_impl == "pallas" and pallas_ok and mesh is None:
            from xkv_tpu.ops.pallas.rankspace_attention import (
                rankspace_decode_attention,
            )

            out, lse = rankspace_decode_attention(
                q, gf.k_us, vt_k, gf.v_us, vt_v, lengths,
                k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
                win_lo=win_lo,
                scale=scale, num_kv_heads=hkv, **kw4,
            )
            return PartialAttention(out=out, lse=lse)
        return rankspace_decode_attention_xla(
            q, gf.k_us, vt_k, gf.v_us, vt_v, scale, hkv,
            k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
            valid_len=lengths, valid_lo=win_lo, **kw4,
        )

    if sparse_ok:
        nc = gf.k_cmin.shape[1]
        blk = sparse_block
        assert nc == -(-gf.k_us.shape[1] // blk), (
            "k_cmin chunk count does not match sparse_block")
        cmin_sl = vt_layer_slice(gf.k_cmin, gpos, hkv, hd)
        cmax_sl = vt_layer_slice(gf.k_cmax, gpos, hkv, hd)
        n_sel = min(sparse_select, nc)
        if attention_impl == "pallas" and pallas_ok and tp_ok:
            from xkv_tpu.ops.pallas.rankspace_attention import (
                sparse_rankspace_decode_attention_tp,
            )

            out, lse = sparse_rankspace_decode_attention_tp(
                mesh, q, gf.k_us, vt_k, gf.v_us, vt_v, cmin_sl, cmax_sl,
                lengths=lengths,
                k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
                win_lo=win_lo,
                n_select=n_sel, scale=scale, num_kv_heads=hkv, block=blk,
            )
            return PartialAttention(out=out, lse=lse)

        from xkv_tpu.ops.attention import (
            adaptive_hot_chunks,
            chunk_bound_scores,
        )

        sc, live, sc_raw = chunk_bound_scores(
            q, cmin_sl, cmax_sl, hkv,
            valid_len=lengths, block=blk, win_lo=win_lo,
        )

        def attend_with_budget(n: int) -> PartialAttention:
            _, ids = jax.lax.top_k(sc, n)
            ids = ids.astype(jnp.int32)
            if attention_impl == "pallas" and pallas_ok and mesh is None:
                from xkv_tpu.ops.pallas.rankspace_attention import (
                    sparse_rankspace_decode_attention,
                )

                out, lse = sparse_rankspace_decode_attention(
                    q, gf.k_us, vt_k, gf.v_us, vt_v, ids,
                    lengths=lengths,
                    k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
                    win_lo=win_lo,
                    scale=scale, num_kv_heads=hkv, block=blk,
                )
                return PartialAttention(out=out, lse=lse)
            # XLA fallback: gather selected chunks, reconstruct only those
            # rows (already rotated — pre_rotated skips the re-rope).
            cos_d = jnp.zeros((gf.k_us.shape[1], hd), jnp.float32)
            return sparse_factored_decode_attention_xla(
                q, gf.k_us, vt_k, gf.v_us, vt_v, cos_d, cos_d, ids, scale,
                hkv, block=blk, k_scale_slice=k_scale_slice,
                v_rank_scale=gf.v_scale,
                valid_len=lengths, pre_rotated=True, valid_lo=win_lo,
            )

        n_hi = min(sparse_select_max, nc) if sparse_select_max else n_sel
        if n_hi > n_sel:
            # Adaptive budget (VERDICT r4 #10): multi-answer steps put MANY
            # chunks near the max Quest bound (several needles competing
            # for the budget); single-needle steps have one dominant chunk.
            # Spend the high budget only when the hot-chunk count exceeds
            # the low budget — both budgets compile once (lax.cond), the
            # step's bound statistics pick per decode step.
            hot = adaptive_hot_chunks(sc_raw, live, band=sparse_adaptive_band)
            use_hi = jnp.any(hot > n_sel)
            return jax.lax.cond(
                use_hi,
                lambda: attend_with_budget(n_hi),
                lambda: attend_with_budget(n_sel),
            )
        return attend_with_budget(n_sel)

    if attention_impl == "pallas" and pallas_ok and tp_ok:
        from xkv_tpu.ops.pallas.rankspace_attention import (
            rankspace_decode_attention_tp,
        )

        out, lse = rankspace_decode_attention_tp(
            mesh, q, gf.k_us, vt_k, gf.v_us, vt_v, lengths=lengths,
            k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
            win_lo=win_lo,
            scale=scale, num_kv_heads=hkv,
        )
        return PartialAttention(out=out, lse=lse)
    if attention_impl == "pallas" and pallas_ok and mesh is None:
        from xkv_tpu.ops.pallas.rankspace_attention import (
            rankspace_decode_attention,
        )

        out, lse = rankspace_decode_attention(
            q, gf.k_us, vt_k, gf.v_us, vt_v, lengths=lengths,
            k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
            win_lo=win_lo,
            scale=scale, num_kv_heads=hkv,
        )
        return PartialAttention(out=out, lse=lse)
    return rankspace_decode_attention_xla(
        q, gf.k_us, vt_k, gf.v_us, vt_v, scale, hkv,
        k_scale_slice=k_scale_slice, v_rank_scale=gf.v_scale,
        valid_len=lengths, valid_lo=win_lo,
    )


def decode_step(
    params: Params,
    cfg: ModelConfig,
    xkv: Optional[XKVConfig],
    cache: XKVCache,
    tokens: jax.Array,
    pos: jax.Array,
    prefill_cos_sin: Tuple[jax.Array, jax.Array],
    attention_impl: str = "xla",
    mesh=None,
    sparse_select: Optional[int] = None,
    sparse_block: int = 512,
    sparse_layers: Optional[frozenset] = None,
    sparse_select_max: Optional[int] = None,
    sparse_adaptive_band: float = 0.5,
) -> Tuple[jax.Array, XKVCache]:
    """One decode step with the hybrid factored cache.

    ``sparse_layers``: restrict sparse top-k to these layer indices (other
    layers read the factored cache exactly). Per-layer mixing exists
    because Quest-bound informativeness is LAYER-dependent — measured on
    the offline RULER suite: the retrieval layer's box bounds can rank
    the needle chunk at the sink while other layers' bounds are sharp
    (docs/RULER_OFFLINE.md).

    tokens: (b, ql) next token(s); pos: () int32 absolute position of
    tokens[:, 0]. prefill_cos_sin: RoPE tables (s_p, hd) for prefill
    positions (used to rotate reconstructed factored keys).

    Reference decode semantics: `xKV/attn_patch/llama.py:52-53` — RoPE'd new
    K appended, attention over the merged cache + appended tokens.
    """
    b, ql = tokens.shape
    scale = 1.0 / math.sqrt(cfg.head_dim)
    positions = pos + jnp.arange(ql)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos_p, sin_p = prefill_cos_sin

    grp_index = layer_group_index(xkv) if xkv is not None else {}
    # rope_mode="post": factors hold POST-RoPE keys; decode attention runs
    # in rank space with no reconstruction (configs.py:rope_mode).
    rope_post = xkv is not None and xkv.rope_mode == "post"

    # Sliding window (Mistral semantics, reference `mistral.py:69`): the
    # query attends only to keys at positions > pos - window. The factored
    # / dense prefill segments get a column lower bound; tail rows sit at
    # absolute positions prefill_len + j.
    win_lo = tail_lo = None
    if cfg.sliding_window is not None:
        if ql > 1:
            raise ValueError(
                "multi-token decode (speculative verify) with "
                "sliding_window is not supported"
            )
        lo = jnp.maximum(pos - (cfg.sliding_window - 1), 0).astype(jnp.int32)
        win_lo = jnp.broadcast_to(lo, (b,))
        tail_lo = jnp.maximum(win_lo - cache.prefill_len, 0)

    h = params["embed"][tokens]
    for li, layer in enumerate(params["layers"]):
        resid = h
        x = rms_norm(h, layer["input_norm"], cfg.rms_norm_eps)
        q_pre, k_new_pre, v_new = qkv_proj(layer["attn"], cfg, x)
        q = apply_rope(q_pre, cos, sin)
        k_new = apply_rope(k_new_pre, cos, sin)

        cache = cache.append_tail(li, k_new, v_new)

        parts: List[PartialAttention] = []
        # --- prefill segment
        grp_info = grp_index.get(li)
        use_factored_k = False
        use_factored_v = False
        if grp_info is not None:
            gi, gpos = grp_info
            gf = cache.groups[gi]
            use_factored_k = gf.k_us is not None
            use_factored_v = gf.v_us is not None
        if use_factored_k and use_factored_v:
            k_scale_slice = (
                None if gf.k_scale is None
                else vt_layer_slice(gf.k_scale, gpos, cfg.num_kv_heads, cfg.head_dim)
            )
            factored_args = (
                q,
                gf.k_us,
                vt_layer_slice(gf.k_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                gf.v_us,
                vt_layer_slice(gf.v_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                cos_p,
                sin_p,
            )
            # Pallas kernel takes PRE-RoPE queries + their positions' trig
            # rows (b, ql, hd); rotation folds into the query embeds.
            kernel_args = factored_args[1:] + (cos, sin)
            # Mosaic requires lane-aligned head_dim for the in-kernel
            # (block_s, hkv*hd) -> (block_s, hkv, hd) reshape; interpret
            # mode (non-TPU backends) has no such constraint.
            pallas_ok = cfg.head_dim % 128 == 0 or jax.default_backend() != "tpu"
            tp_ok = (
                mesh is not None
                and "model" in mesh.shape
                and cfg.num_kv_heads % mesh.shape["model"] == 0
            )
            sparse_ok = (
                sparse_select is not None
                and gf.k_cmin is not None
                and ql == 1
                and (sparse_layers is None or li in sparse_layers)
            )
            if rope_post:
                parts.append(
                    _post_rope_factored_part(
                        q, gf, gpos, cfg, scale, k_scale_slice,
                        sparse_ok, sparse_select, sparse_block,
                        attention_impl, pallas_ok, tp_ok, mesh,
                        win_lo=win_lo,
                        sparse_select_max=sparse_select_max,
                        sparse_adaptive_band=sparse_adaptive_band,
                    )
                )
            elif sparse_ok:
                nc = gf.k_cmin.shape[1]
                blk = sparse_block
                assert nc == -(-gf.k_us.shape[1] // blk), (
                    "k_cmin chunk count does not match sparse_block")
                cmin_sl = vt_layer_slice(gf.k_cmin, gpos, cfg.num_kv_heads,
                                         cfg.head_dim)
                cmax_sl = vt_layer_slice(gf.k_cmax, gpos, cfg.num_kv_heads,
                                         cfg.head_dim)
                n_sel = min(sparse_select, nc)
                if attention_impl == "pallas" and pallas_ok and tp_ok:
                    from xkv_tpu.ops.pallas.lowrank_attention import (
                        sparse_lowrank_decode_attention_tp,
                    )

                    out_f, lse_f = sparse_lowrank_decode_attention_tp(
                        mesh, q_pre, q, *kernel_args, cmin_sl, cmax_sl,
                        k_scale_slice=k_scale_slice,
                        v_rank_scale=gf.v_scale,
                        win_lo=win_lo,
                        n_select=n_sel, scale=scale,
                        num_kv_heads=cfg.num_kv_heads, block=blk,
                    )
                    parts.append(PartialAttention(out=out_f, lse=lse_f))
                elif attention_impl == "pallas" and pallas_ok and mesh is None:
                    from xkv_tpu.ops.pallas.lowrank_attention import (
                        sparse_lowrank_decode_attention,
                    )

                    ids = select_topk_chunks(
                        q, cmin_sl, cmax_sl, n_select=n_sel,
                        num_kv_heads=cfg.num_kv_heads, block=blk,
                        win_lo=win_lo,
                    )
                    out_f, lse_f = sparse_lowrank_decode_attention(
                        q_pre, *kernel_args, ids,
                        k_scale_slice=k_scale_slice,
                        v_rank_scale=gf.v_scale,
                        win_lo=win_lo,
                        scale=scale, num_kv_heads=cfg.num_kv_heads,
                        block=blk,
                    )
                    parts.append(PartialAttention(out=out_f, lse=lse_f))
                else:
                    ids = select_topk_chunks(
                        q, cmin_sl, cmax_sl, n_select=n_sel,
                        num_kv_heads=cfg.num_kv_heads, block=blk,
                        win_lo=win_lo,
                    )
                    parts.append(
                        sparse_factored_decode_attention_xla(
                            *factored_args, ids, scale, cfg.num_kv_heads,
                            block=blk,
                            k_scale_slice=k_scale_slice,
                            v_rank_scale=gf.v_scale,
                            valid_lo=win_lo,
                        )
                    )
            elif attention_impl == "pallas" and pallas_ok and tp_ok:
                from xkv_tpu.ops.pallas.lowrank_attention import (
                    lowrank_decode_attention_tp,
                )

                out_f, lse_f = lowrank_decode_attention_tp(
                    mesh,
                    q_pre,
                    *kernel_args,
                    k_scale_slice=k_scale_slice,
                    v_rank_scale=gf.v_scale,
                    win_lo=win_lo,
                    scale=scale,
                    num_kv_heads=cfg.num_kv_heads,
                )
                parts.append(PartialAttention(out=out_f, lse=lse_f))
            elif attention_impl == "pallas" and pallas_ok and mesh is None:
                from xkv_tpu.ops.pallas.lowrank_attention import (
                    lowrank_decode_attention,
                )

                out_f, lse_f = lowrank_decode_attention(
                    q_pre,
                    *kernel_args,
                    k_scale_slice=k_scale_slice,
                    v_rank_scale=gf.v_scale,
                    win_lo=win_lo,
                    scale=scale,
                    num_kv_heads=cfg.num_kv_heads,
                )
                parts.append(PartialAttention(out=out_f, lse=lse_f))
            else:
                parts.append(
                    factored_decode_attention_xla(
                        *factored_args, scale, cfg.num_kv_heads,
                        k_scale_slice=k_scale_slice,
                        v_rank_scale=gf.v_scale,
                        valid_lo=win_lo,
                    )
                )
        else:
            # Mixed or fully-dense prefill segment.
            if use_factored_k:
                from xkv_tpu.ops.attention import reconstruct_group_heads

                k_scale_slice = (
                    None if gf.k_scale is None
                    else vt_layer_slice(
                        gf.k_scale, gpos, cfg.num_kv_heads, cfg.head_dim
                    )
                )
                if gf.k_us4 is not None:
                    # Mixed int8 + packed-int4 factors: include the int4
                    # tail ranks (merge-one-side int4, VERDICT r3 #4).
                    from xkv_tpu.compress.quant import (
                        QuantizedKFactorsMixed4,
                        dequantize_k_mixed4,
                    )

                    mat = dequantize_k_mixed4(QuantizedKFactorsMixed4(
                        us8=gf.k_us, us4p=gf.k_us4,
                        vt8=vt_layer_slice(
                            gf.k_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                        vt4=vt_layer_slice(
                            gf.k_vt4, gpos, cfg.num_kv_heads, cfg.head_dim),
                        out_scale=k_scale_slice,
                        scale4=vt_layer_slice(
                            gf.k_scale4, gpos, cfg.num_kv_heads,
                            cfg.head_dim),
                    ))
                    bsz, s_p_ = mat.shape[:2]
                    k_rec = jnp.transpose(
                        mat.reshape(bsz, s_p_, cfg.num_kv_heads,
                                    cfg.head_dim),
                        (0, 2, 1, 3),
                    )
                else:
                    k_rec = reconstruct_group_heads(
                        gf.k_us,
                        vt_layer_slice(gf.k_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                        cfg.num_kv_heads,
                        out_scale=k_scale_slice,
                    )
                if not rope_post:  # post-RoPE factors are already rotated
                    k_rec = apply_rope(k_rec, cos_p[None], sin_p[None])
                k_prefill = k_rec.astype(q.dtype)
            elif grp_info is not None and gf.slerp_k is not None:
                from xkv_tpu.compress.slerp import compact_reconstruct

                k_prefill = compact_reconstruct(gf.slerp_k, gpos, q.dtype)
            else:
                k_prefill = cache.dense_k[li]
            if use_factored_v:
                from xkv_tpu.ops.attention import reconstruct_group_heads

                if gf.v_us4 is not None:
                    from xkv_tpu.compress.quant import (
                        QuantizedVFactorsMixed4,
                        dequantize_v_mixed4,
                    )

                    mat = dequantize_v_mixed4(QuantizedVFactorsMixed4(
                        us8=gf.v_us, us4p=gf.v_us4, rank_scale=gf.v_scale,
                        vt=vt_layer_slice(
                            gf.v_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                    ))
                    bsz, s_p_ = mat.shape[:2]
                    v_prefill = jnp.transpose(
                        mat.reshape(bsz, s_p_, cfg.num_kv_heads,
                                    cfg.head_dim),
                        (0, 2, 1, 3),
                    ).astype(q.dtype)
                else:
                    v_prefill = reconstruct_group_heads(
                        gf.v_us,
                        vt_layer_slice(gf.v_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                        cfg.num_kv_heads,
                        rank_scale=gf.v_scale,
                    ).astype(q.dtype)
            elif grp_info is not None and gf.slerp_v is not None:
                from xkv_tpu.compress.slerp import compact_reconstruct

                v_prefill = compact_reconstruct(gf.slerp_v, gpos, q.dtype)
            else:
                v_prefill = cache.dense_v[li]
            parts.append(dense_decode_attention_xla(
                q, k_prefill, v_prefill, scale, valid_lo=win_lo))

        # --- decode tail (includes this step's token(s)); causal within the
        # window: query i sees tail rows < tail_len + i + 1 (for ql == 1
        # this is the old tail_len + ql).
        valid = jnp.broadcast_to(
            cache.tail_len + 1 + jnp.arange(ql, dtype=jnp.int32)[None, :],
            (b, ql),
        )
        parts.append(
            dense_decode_attention_xla(
                q, cache.tail_k[li], cache.tail_v[li], scale, valid_len=valid,
                valid_lo=tail_lo,
            )
        )

        attn = merge_partials(*parts).astype(h.dtype)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, ql, -1)
        h = resid + attn @ layer["attn"]["wo"]
        h = h + mlp(layer["mlp"], rms_norm(h, layer["post_norm"], cfg.rms_norm_eps))

    logits = unembed(params, cfg, h)
    return logits, cache.advance(ql)


# ----------------------------------------------------------- batched decode
def decode_step_batched(
    params: Params,
    cfg: ModelConfig,
    xkv: Optional[XKVConfig],
    cache: XKVCache,
    tokens: jax.Array,       # (B,) one token per slot, or (B, ql) multi-token
    pos: jax.Array,          # (B,) absolute position per slot (of tokens[:, 0])
    prefill_len: jax.Array,  # (B,) valid prefill length per slot
    tail_len: jax.Array,     # (B,) tail fill per slot
    prefill_cos_sin: Tuple[jax.Array, jax.Array],
    attention_impl: str = "xla",
    mesh=None,
    sparse_select: Optional[int] = None,
    sparse_block: int = 512,
    sparse_layers: Optional[frozenset] = None,
) -> Tuple[jax.Array, XKVCache]:
    """One decode step across B independent slots (continuous batching).

    Unlike ``decode_step``, every slot has its own position, prefill length
    (factors are padded to a common s_max), and tail fill level. Inactive
    slots simply produce garbage logits the scheduler ignores. With a mesh,
    the pallas path goes through the shard_map TP kernels (kv heads on the
    model axis); everything else is GSPMD-propagated.

    2-D ``tokens`` runs a multi-token pass per slot (the batched
    speculative-decoding verify), appending ``ql`` exact K/V rows at each
    slot's ``tail_len`` and masking causally among the new rows. Logits are
    then (B, ql, V); 1-D tokens keep the (B, V) contract.
    """
    multi = tokens.ndim == 2
    tokens2 = tokens if multi else tokens[:, None]
    b, ql = tokens2.shape
    # sparse top-k decode is single-token (drafts); multi-token passes
    # (speculative verify) fall back to exact attention below (sparse_ok_b
    # carries the ql == 1 guard), so sparse_topk composes with verify.
    win_lo = tail_lo = None
    if cfg.sliding_window is not None:
        if ql > 1:
            raise ValueError(
                "multi-token decode (speculative verify) with "
                "sliding_window is not supported"
            )
        win_lo = jnp.maximum(
            pos - (cfg.sliding_window - 1), 0
        ).astype(jnp.int32)  # (B,) per-slot lower bound
        tail_lo = jnp.maximum(win_lo - prefill_len, 0)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    positions = pos[:, None] + jnp.arange(ql, dtype=pos.dtype)[None, :]  # (B, ql)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos_t_arg = cos[:, 0, :] if ql == 1 else cos
    sin_t_arg = sin[:, 0, :] if ql == 1 else sin
    cos_p, sin_p = prefill_cos_sin

    grp_index = layer_group_index(xkv) if xkv is not None else {}
    rope_post = xkv is not None and xkv.rope_mode == "post"

    h = params["embed"][tokens2]
    for li, layer in enumerate(params["layers"]):
        resid = h
        x = rms_norm(h, layer["input_norm"], cfg.rms_norm_eps)
        q_pre, k_new_pre, v_new = qkv_proj(layer["attn"], cfg, x)
        q = apply_rope(q_pre, cos, sin)
        k_new = apply_rope(k_new_pre, cos, sin)

        # per-slot tail write at tail_len[b] (k_new/v_new: (B, hkv, 1, hd))
        tk = jax.vmap(
            lambda t, n, i: jax.lax.dynamic_update_slice(t, n.astype(t.dtype), (0, i, 0))
        )(cache.tail_k[li], k_new, tail_len)
        tv = jax.vmap(
            lambda t, n, i: jax.lax.dynamic_update_slice(t, n.astype(t.dtype), (0, i, 0))
        )(cache.tail_v[li], v_new, tail_len)
        cache = cache.replace(
            tail_k=cache.tail_k.at[li].set(tk), tail_v=cache.tail_v.at[li].set(tv)
        )

        parts: List[PartialAttention] = []
        grp_info = grp_index.get(li)
        gf = cache.groups[grp_info[0]] if grp_info is not None else None
        use_f = gf is not None and gf.k_us is not None and gf.v_us is not None
        if use_f:
            gi, gpos = grp_info
            fargs = (
                q,
                gf.k_us,
                vt_layer_slice(gf.k_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                gf.v_us,
                vt_layer_slice(gf.v_vt, gpos, cfg.num_kv_heads, cfg.head_dim),
                cos_p,
                sin_p,
            )
            k_scale_slice = (
                None if gf.k_scale is None
                else vt_layer_slice(gf.k_scale, gpos, cfg.num_kv_heads, cfg.head_dim)
            )
            pallas_ok_b = cfg.head_dim % 128 == 0 or jax.default_backend() != "tpu"
            tp_ok_b = (
                mesh is not None
                and "model" in mesh.shape
                and cfg.num_kv_heads % mesh.shape["model"] == 0
            )
            sparse_ok_b = (
                sparse_select is not None
                and (sparse_layers is None or li in sparse_layers)
                and gf.k_cmin is not None
                and ql == 1
            )
            if rope_post:
                parts.append(
                    _post_rope_factored_part(
                        q, gf, gpos, cfg, scale, k_scale_slice,
                        sparse_ok_b, sparse_select, sparse_block,
                        attention_impl, pallas_ok_b, tp_ok_b, mesh,
                        lengths=prefill_len, win_lo=win_lo,
                    )
                )
            elif sparse_ok_b:
                nc = gf.k_cmin.shape[1]
                blk = sparse_block
                assert nc == -(-gf.k_us.shape[1] // blk), (
                    "k_cmin chunk count does not match sparse_block")
                cmin_sl = vt_layer_slice(gf.k_cmin, gpos, cfg.num_kv_heads,
                                         cfg.head_dim)
                cmax_sl = vt_layer_slice(gf.k_cmax, gpos, cfg.num_kv_heads,
                                         cfg.head_dim)
                n_sel = min(sparse_select, nc)
                if attention_impl == "pallas" and pallas_ok_b and tp_ok_b:
                    from xkv_tpu.ops.pallas.lowrank_attention import (
                        sparse_lowrank_decode_attention_tp,
                    )

                    out_f, lse_f = sparse_lowrank_decode_attention_tp(
                        mesh, q_pre, q, *fargs[1:], cos_t_arg,
                        sin_t_arg, cmin_sl, cmax_sl,
                        lengths=prefill_len,
                        k_scale_slice=k_scale_slice,
                        v_rank_scale=gf.v_scale,
                        win_lo=win_lo,
                        n_select=n_sel, scale=scale,
                        num_kv_heads=cfg.num_kv_heads, block=blk,
                    )
                    parts.append(PartialAttention(out=out_f, lse=lse_f))
                else:
                    ids = select_topk_chunks(
                        q, cmin_sl, cmax_sl,
                        n_select=n_sel,
                        num_kv_heads=cfg.num_kv_heads,
                        valid_len=prefill_len,
                        block=blk,
                        win_lo=win_lo,
                    )
                    if (
                        attention_impl == "pallas" and pallas_ok_b
                        and mesh is None
                    ):
                        from xkv_tpu.ops.pallas.lowrank_attention import (
                            sparse_lowrank_decode_attention,
                        )

                        out_f, lse_f = sparse_lowrank_decode_attention(
                            q_pre, *fargs[1:], cos_t_arg, sin_t_arg,
                            ids,
                            lengths=prefill_len,
                            k_scale_slice=k_scale_slice,
                            v_rank_scale=gf.v_scale,
                            win_lo=win_lo,
                            scale=scale, num_kv_heads=cfg.num_kv_heads,
                            block=blk,
                        )
                        parts.append(
                            PartialAttention(out=out_f, lse=lse_f)
                        )
                    else:
                        parts.append(
                            sparse_factored_decode_attention_xla(
                                *fargs, ids, scale, cfg.num_kv_heads,
                                block=blk,
                                k_scale_slice=k_scale_slice,
                                v_rank_scale=gf.v_scale,
                                valid_len=prefill_len,
                                valid_lo=win_lo,
                            )
                        )
            elif attention_impl == "pallas" and pallas_ok_b and tp_ok_b:
                from xkv_tpu.ops.pallas.lowrank_attention import (
                    lowrank_decode_attention_tp,
                )

                out_f, lse_f = lowrank_decode_attention_tp(
                    mesh, q_pre, *fargs[1:], cos_t_arg, sin_t_arg,
                    lengths=prefill_len,
                    k_scale_slice=k_scale_slice,
                    v_rank_scale=gf.v_scale,
                    win_lo=win_lo,
                    scale=scale, num_kv_heads=cfg.num_kv_heads,
                )
                parts.append(PartialAttention(out=out_f, lse=lse_f))
            elif attention_impl == "pallas" and pallas_ok_b and mesh is None:
                from xkv_tpu.ops.pallas.lowrank_attention import (
                    lowrank_decode_attention,
                )

                out_f, lse_f = lowrank_decode_attention(
                    q_pre, *fargs[1:], cos_t_arg, sin_t_arg, prefill_len,
                    k_scale_slice=k_scale_slice,
                    v_rank_scale=gf.v_scale,
                    win_lo=win_lo,
                    scale=scale, num_kv_heads=cfg.num_kv_heads,
                )
                parts.append(PartialAttention(out=out_f, lse=lse_f))
            else:
                from xkv_tpu.ops.attention import (
                    attention_partial,
                    reconstruct_group_heads,
                )

                k_pre = reconstruct_group_heads(
                    gf.k_us, fargs[2], cfg.num_kv_heads, out_scale=k_scale_slice
                )
                k_f = apply_rope(k_pre, cos_p[None], sin_p[None]).astype(q.dtype)
                v_f = reconstruct_group_heads(
                    gf.v_us, fargs[4], cfg.num_kv_heads, rank_scale=gf.v_scale
                ).astype(q.dtype)
                mask = (
                    jnp.arange(k_f.shape[2])[None, :] < prefill_len[:, None]
                )[:, None, None, :]
                if win_lo is not None:
                    mask &= (
                        jnp.arange(k_f.shape[2])[None, :] >= win_lo[:, None]
                    )[:, None, None, :]
                parts.append(attention_partial(q, k_f, v_f, scale, mask))
        else:
            from xkv_tpu.ops.attention import attention_partial

            if grp_info is not None and gf is not None and (
                    gf.slerp_k is not None or gf.slerp_v is not None):
                # Compact MiniCache slot: reconstruct this layer's rows
                # (K stored post-RoPE, V plain) and mask padded rows.
                from xkv_tpu.compress.slerp import compact_reconstruct

                gpos_s = grp_info[1]
                k_pf = (compact_reconstruct(gf.slerp_k, gpos_s, q.dtype)
                        if gf.slerp_k is not None else cache.dense_k[li])
                v_pf = (compact_reconstruct(gf.slerp_v, gpos_s, q.dtype)
                        if gf.slerp_v is not None else cache.dense_v[li])
            else:
                k_pf = cache.dense_k[li]
                v_pf = cache.dense_v[li]
            mask = (
                jnp.arange(k_pf.shape[2])[None, :] < prefill_len[:, None]
            )[:, None, None, :]
            if win_lo is not None:
                mask &= (
                    jnp.arange(k_pf.shape[2])[None, :] >= win_lo[:, None]
                )[:, None, None, :]
            parts.append(attention_partial(q, k_pf, v_pf, scale, mask))

        # Causal within the new rows: query i sees tail rows < tail_len+i+1.
        valid = tail_len[:, None] + 1 + jnp.arange(ql, dtype=jnp.int32)[None, :]
        parts.append(
            dense_decode_attention_xla(
                q, cache.tail_k[li], cache.tail_v[li], scale, valid_len=valid,
                valid_lo=tail_lo,
            )
        )

        attn = merge_partials(*parts).astype(h.dtype)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, ql, -1)
        h = resid + attn @ layer["attn"]["wo"]
        h = h + mlp(layer["mlp"], rms_norm(h, layer["post_norm"], cfg.rms_norm_eps))

    logits = unembed(params, cfg, h)
    return (logits if multi else logits[:, 0]), cache
