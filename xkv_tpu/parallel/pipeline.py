"""Pipeline parallelism: stage-sharded layers with microbatched prefill.

The reference has no PP (SURVEY.md §2.5). This implements the GPipe-style
schedule for the Llama forward as a shard_map program:

  * layers are stacked into (L, ...) arrays and sharded into P contiguous
    stages over the ``pipe`` mesh axis (each stage scans its L/P layers);
  * the batch is split into M microbatches; at step t, stage p works on
    microbatch t - p (bubble steps compute garbage that is never read);
  * activations flow stage -> stage+1 through ``ppermute`` each step;
    after P + M - 1 steps the last stage has produced every microbatch.

Embedding/unembedding run replicated outside the pipelined region (they are
cheap); the pipeline covers the decoder stack.

Decode-time PP (round 4): ``pipelined_decode_step`` runs ONE decode step of
the rope_mode="post" factored cache through the same GPipe schedule — the
cache (group factors + dense tail) is STAGE-LOCAL: each device holds only
its layers' factor panels and tail rows, activations ride ``ppermute``, and
microbatches keep every stage busy after warmup. Bit-parity with
``models/llama.decode_step`` is pinned by tests/test_sharding.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from xkv_tpu.models import llama
from xkv_tpu.models.config import ModelConfig
from xkv_tpu.ops.attention import blockwise_causal_attention, mha_reference
from xkv_tpu.ops.rope import apply_rope, rope_cos_sin


def stack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """[per-layer dict] -> dict of stacked (L, ...) arrays."""
    layers = params["layers"]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def _layer_forward(layer_p, cfg: ModelConfig, h, cos, sin, scale):
    resid = h
    x = llama.rms_norm(h, layer_p["input_norm"], cfg.rms_norm_eps)
    q, k, v = llama.qkv_proj(layer_p["attn"], cfg, x)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    s = q.shape[2]
    if s > 2048:
        attn = blockwise_causal_attention(q, k, v, scale, window=cfg.sliding_window)
    else:
        attn = mha_reference(q, k, v, scale, causal=True, window=cfg.sliding_window)
    attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(h.shape[0], s, -1)
    h = resid + attn @ layer_p["attn"]["wo"]
    h = h + llama.mlp(
        layer_p["mlp"], llama.rms_norm(h, layer_p["post_norm"], cfg.rms_norm_eps)
    )
    return h


def pipelined_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # (b, s)
    mesh: Mesh,
    axis_name: str = "pipe",
    num_microbatches: int = 2,
) -> jax.Array:
    """Pipelined decoder forward -> logits (b, s, vocab) fp32.

    Requires num_layers % P == 0 and b % num_microbatches == 0.
    """
    n_stages = mesh.shape[axis_name]
    b, s = tokens.shape
    M = num_microbatches
    if cfg.num_layers % n_stages:
        raise ValueError(f"{cfg.num_layers} layers must divide {n_stages} stages")
    if b % M:
        raise ValueError(f"batch {b} must divide microbatches {M}")
    mb = b // M
    scale = 1.0 / math.sqrt(cfg.head_dim)
    positions = jnp.arange(s)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)

    h0 = params["embed"][tokens].reshape(M, mb, s, cfg.hidden_size)
    stacked = stack_layer_params(params)

    def stage_fn(stage_layers, h_all):
        # stage_layers: (L/P, ...) local layers; h_all: (M, mb, s, d) inputs
        # (replicated — only stage 0 reads them).
        p_idx = jax.lax.axis_index(axis_name)

        def run_stage(h):
            def body(h, layer_p):
                return _layer_forward(layer_p, cfg, h, cos, sin, scale), None

            out, _ = jax.lax.scan(body, h, stage_layers)
            return out

        def step(carry, t):
            current, outputs = carry
            # Stage 0 injects microbatch t (when t < M).
            inject = h_all[jnp.clip(t, 0, M - 1)]
            current = jnp.where(p_idx == 0, inject, current)
            worked = run_stage(current)
            # Last stage records microbatch t - (P - 1) when valid.
            out_idx = jnp.clip(t - (n_stages - 1), 0, M - 1)
            record = (t - (n_stages - 1) >= 0) & (t - (n_stages - 1) < M)
            outputs = jnp.where(
                record & (p_idx == n_stages - 1),
                jax.lax.dynamic_update_index_in_dim(
                    outputs, worked, out_idx, axis=0
                ),
                outputs,
            )
            # Send to the next stage (ring permute; the wraparound value into
            # stage 0 is ignored — stage 0 always injects).
            perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]
            nxt = jax.lax.ppermute(worked, axis_name, perm)
            return (nxt, outputs), None

        init = (
            jnp.zeros((mb, s, cfg.hidden_size), h_all.dtype),
            jnp.zeros((M, mb, s, cfg.hidden_size), h_all.dtype),
        )
        (_, outputs), _ = jax.lax.scan(
            step, init, jnp.arange(n_stages + M - 1)
        )
        # Only the last stage's buffer is real; psum after zeroing others.
        outputs = jnp.where(p_idx == n_stages - 1, outputs, 0.0)
        return jax.lax.psum(outputs, axis_name)

    from jax import shard_map

    out = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked, h0)

    h = out.reshape(b, s, cfg.hidden_size)
    return llama.unembed(params, cfg, h)


# ------------------------------------------------------------- decode PP
def _check_uniform_groups(xkv, cfg: ModelConfig, n_stages: int, cache=None):
    """Decode PP requires the flagship layout: consecutive equal SVD groups
    with both sides merged, rope_mode='post' (rank-space decode — no trig
    in the stage body), and group boundaries aligned to stage boundaries.

    This is a direct-call API (not engine-routed), so the support matrix is
    enforced HERE (ADVICE r4): a cache carrying mixed-int4 panels, Quest
    bounds, or compact-slerp storage — or a sliding-window model config —
    would silently decode with wrong logits (dropped int4 tail ranks /
    missing window mask) if allowed through.
    """
    if xkv is None or xkv.rope_mode != "post":
        raise ValueError("pipelined_decode_step requires rope_mode='post'")
    if cfg.sliding_window is not None:
        raise ValueError(
            "pipelined_decode_step does not apply the sliding-window mask; "
            "sliding_window configs are unsupported"
        )
    for gi, gf in enumerate(getattr(cache, "groups", ()) or ()):
        for f in ("k_us4", "v_us4", "k_cmin", "slerp_k", "slerp_v"):
            if getattr(gf, f, None) is not None:
                raise ValueError(
                    f"pipelined_decode_step: cache group {gi} has {f} set — "
                    "mixed int8+int4 factors, Quest sparse bounds, and "
                    "compact-slerp storage are unsupported in decode PP"
                )
    groups = xkv.layer_groups
    if not groups:
        raise ValueError("no layer groups")
    g = len(groups[0].layers)
    expect = 0
    for grp in groups:
        if list(grp.layers) != list(range(expect, expect + g)):
            raise ValueError(
                "decode PP needs consecutive equal-size groups covering "
                f"all layers (group {grp.layers} at layer {expect})"
            )
        if (grp.rank_k, grp.rank_v) != (groups[0].rank_k, groups[0].rank_v):
            raise ValueError("decode PP needs uniform group ranks")
        expect += g
    if expect != cfg.num_layers:
        raise ValueError("groups must cover every layer")
    if cfg.num_layers % n_stages:
        raise ValueError(f"{cfg.num_layers} layers / {n_stages} stages")
    layers_per_stage = cfg.num_layers // n_stages
    if layers_per_stage % g:
        raise ValueError(
            f"stage size {layers_per_stage} must be a whole number of "
            f"groups (group size {g})"
        )
    return g


def pipelined_decode_step(
    params: Dict[str, Any],
    cfg: ModelConfig,
    xkv,
    cache,
    tokens: jax.Array,  # (b, 1)
    pos: jax.Array,  # () int32
    mesh: Mesh,
    axis_name: str = "pipe",
    num_microbatches: int = None,
):
    """One decode step through the factored cache, layer-stage-sharded.

    Each pipe-mesh device holds its stage's layer weights, group factor
    panels, and tail rows; only (mb, 1, hidden) activations cross stages
    (``ppermute``). The batch is split into M microbatches so stages
    overlap — steady-state bubble fraction (P-1)/(P+M-1). Attention runs
    the rank-space XLA path (`ops/attention.rankspace_decode_attention_xla`
    — post-RoPE factors need no trig, which keeps the stage body free of
    position tables). int8 factors supported; sparse/window/mixed-int4/slerp
    configs raise ValueError in ``_check_uniform_groups`` (this is a
    direct-call API, so the support matrix is enforced here, not by the
    engine).

    Returns (logits (b, 1, V) fp32, cache with tail advanced) — bit-parity
    with ``models/llama.decode_step`` on the same inputs.
    """
    from xkv_tpu.ops.attention import (
        dense_decode_attention_xla,
        merge_partials,
        rankspace_decode_attention_xla,
    )
    from xkv_tpu.models.llama import qkv_proj, unembed as llama_unembed
    from xkv_tpu.cache import vt_layer_slice

    n_stages = mesh.shape[axis_name]
    g = _check_uniform_groups(xkv, cfg, n_stages, cache=cache)
    b, ql = tokens.shape
    if ql != 1:
        raise ValueError("pipelined_decode_step is single-token")
    M = num_microbatches or min(b, n_stages)
    if b % M:
        raise ValueError(f"batch {b} must divide microbatches {M}")
    mb = b // M
    Lp = cfg.num_layers // n_stages
    scale = 1.0 / math.sqrt(cfg.head_dim)
    hkv, hd = cfg.num_kv_heads, cfg.head_dim

    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    positions = pos + jnp.arange(ql)[None, :]
    cos, sin = rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling
    )
    # closed-over values may be committed to a different mesh (the serving
    # dp/tp mesh); replicate them onto the pipe mesh
    cos = jax.device_put(cos, rep)
    sin = jax.device_put(sin, rep)

    quantized = cache.groups[0].k_scale is not None

    def stack(field):
        return jnp.stack([getattr(gf, field) for gf in cache.groups], axis=0)

    k_us_st, k_vt_st = stack("k_us"), stack("k_vt")
    v_us_st, v_vt_st = stack("v_us"), stack("v_vt")
    if quantized:
        k_sc_st, v_sc_st = stack("k_scale"), stack("v_scale")
    else:
        # dummy scalars keep the shard_map signature static
        G = len(cache.groups)
        k_sc_st = jnp.ones((G, 1, 1, 1), jnp.float32)
        v_sc_st = jnp.ones((G, 1, 1, 1), jnp.float32)

    stacked = stack_layer_params(params)
    h0 = params["embed"][tokens].reshape(M, mb, ql, cfg.hidden_size)
    tail_len = jax.device_put(cache.tail_len, rep)

    def stage_fn(stage_layers, kus, kvt, vus, vvt, ksc, vsc,
                 tail_k, tail_v, h_all):
        # stage_layers: (Lp, ...); kus/...: (Gp, b, ...) local groups;
        # tail_k/tail_v: (Lp, b, hkv, t, hd) local tail.
        p_idx = jax.lax.axis_index(axis_name)

        def run_stage(h, mb_idx, tk_all, tv_all):
            """Apply this stage's layers to (mb, 1, d) activations for
            microbatch ``mb_idx``; returns (h, per-layer new tail rows)."""
            b_off = mb_idx * mb

            def body(h, xs):
                layer_p, li = xs
                gi = li // g
                gpos = li % g
                resid = h
                x = llama.rms_norm(
                    h, layer_p["input_norm"], cfg.rms_norm_eps
                )
                q, k_new, v_new = qkv_proj(layer_p["attn"], cfg, x)
                q = apply_rope(q, cos, sin)
                k_new = apply_rope(k_new, cos, sin)

                sl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                    a, b_off, mb, axis=0
                )
                # gpos is traced (scan over layers): dynamic column slice
                # of the group-shared vt bases instead of vt_layer_slice.
                width = hkv * hd
                dsl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                    a, gpos * width, width, axis=2
                )
                ksl = dsl(sl(ksc[gi])) if quantized else None
                parts = [
                    rankspace_decode_attention_xla(
                        q, sl(kus[gi]),
                        dsl(sl(kvt[gi])),
                        sl(vus[gi]),
                        dsl(sl(vvt[gi])),
                        scale, hkv,
                        k_scale_slice=ksl,
                        v_rank_scale=sl(vsc[gi]) if quantized else None,
                    )
                ]
                # tail (this stage's rows, this microbatch's slice) + the
                # new token's own row
                tk = jax.lax.dynamic_slice_in_dim(tk_all[li], b_off, mb, 0)
                tv = jax.lax.dynamic_slice_in_dim(tv_all[li], b_off, mb, 0)
                tk = jax.lax.dynamic_update_slice(
                    tk, k_new.astype(tk.dtype), (0, 0, tail_len, 0)
                )
                tv = jax.lax.dynamic_update_slice(
                    tv, v_new.astype(tv.dtype), (0, 0, tail_len, 0)
                )
                valid = jnp.broadcast_to(
                    tail_len + 1 + jnp.arange(ql, dtype=jnp.int32)[None, :],
                    (mb, ql),
                )
                parts.append(
                    dense_decode_attention_xla(
                        q, tk, tv, scale, valid_len=valid
                    )
                )
                attn = merge_partials(*parts).astype(h.dtype)
                attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(mb, ql, -1)
                h = resid + attn @ layer_p["attn"]["wo"]
                h = h + llama.mlp(
                    layer_p["mlp"],
                    llama.rms_norm(h, layer_p["post_norm"], cfg.rms_norm_eps),
                )
                return h, (k_new, v_new)

            return jax.lax.scan(
                body, h, (stage_layers, jnp.arange(Lp))
            )

        def step(carry, t):
            current, outputs, tk_all, tv_all = carry
            inject = h_all[jnp.clip(t, 0, M - 1)]
            current = jnp.where(p_idx == 0, inject, current)
            mb_idx = jnp.clip(t - p_idx, 0, M - 1)
            valid_tick = (t - p_idx >= 0) & (t - p_idx < M)
            worked, (new_k, new_v) = run_stage(current, mb_idx, tk_all, tv_all)
            # Persist the new tail rows for the active microbatch only on
            # valid ticks (bubble ticks compute garbage).
            # new_k/new_v: (Lp, mb, hkv, ql=1, hd) — ql occupies the tail
            # position slot.
            row_k = jnp.where(
                valid_tick, new_k,
                jax.lax.dynamic_slice(
                    tk_all,
                    (0, mb_idx * mb, 0, tail_len, 0),
                    (Lp, mb, hkv, 1, hd),
                ).astype(new_k.dtype),
            )
            row_v = jnp.where(
                valid_tick, new_v,
                jax.lax.dynamic_slice(
                    tv_all,
                    (0, mb_idx * mb, 0, tail_len, 0),
                    (Lp, mb, hkv, 1, hd),
                ).astype(new_v.dtype),
            )
            tk_all = jax.lax.dynamic_update_slice(
                tk_all, row_k.astype(tk_all.dtype),
                (0, mb_idx * mb, 0, tail_len, 0),
            )
            tv_all = jax.lax.dynamic_update_slice(
                tv_all, row_v.astype(tv_all.dtype),
                (0, mb_idx * mb, 0, tail_len, 0),
            )
            out_idx = jnp.clip(t - (n_stages - 1), 0, M - 1)
            record = (t - (n_stages - 1) >= 0) & (t - (n_stages - 1) < M)
            outputs = jnp.where(
                record & (p_idx == n_stages - 1),
                jax.lax.dynamic_update_index_in_dim(
                    outputs, worked, out_idx, axis=0
                ),
                outputs,
            )
            perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]
            nxt = jax.lax.ppermute(worked, axis_name, perm)
            return (nxt, outputs, tk_all, tv_all), None

        init = (
            jnp.zeros((mb, ql, cfg.hidden_size), h_all.dtype),
            jnp.zeros((M, mb, ql, cfg.hidden_size), h_all.dtype),
            tail_k,
            tail_v,
        )
        (_, outputs, tail_k, tail_v), _ = jax.lax.scan(
            step, init, jnp.arange(n_stages + M - 1)
        )
        outputs = jnp.where(p_idx == n_stages - 1, outputs, 0.0)
        return jax.lax.psum(outputs, axis_name), tail_k, tail_v

    from jax import shard_map

    Pp = P(axis_name)
    # Inputs may be committed to a different mesh (e.g. the dp/tp serving
    # mesh); place them explicitly on the pipe mesh with their stage
    # shardings before the shard_map.
    specs = (Pp, Pp, Pp, Pp, Pp, Pp, Pp, Pp, Pp, P())
    args = (stacked, k_us_st, k_vt_st, v_us_st, v_vt_st, k_sc_st, v_sc_st,
            cache.tail_k, cache.tail_v, h0)
    args = tuple(
        jax.tree.map(
            lambda a, sp=sp: jax.device_put(a, NamedSharding(mesh, sp)), arg
        )
        for arg, sp in zip(args, specs)
    )
    out, new_tail_k, new_tail_v = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=specs,
        out_specs=(P(), Pp, Pp),
        check_vma=False,
    )(*args)

    h = out.reshape(b, ql, cfg.hidden_size)
    logits = llama_unembed(params, cfg, h)
    cache = cache.replace(tail_k=new_tail_k, tail_v=new_tail_v)
    return logits, cache.advance(ql)
