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
cheap); the pipeline covers the decoder stack. Correctness-focused: the
classic bubble overheads apply; decode-time PP and overlap tuning are
future work.
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
