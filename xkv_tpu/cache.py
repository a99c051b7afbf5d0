"""Compressed KV cache structures — the real thing the reference only fakes.

The reference's ``FakeLayerMergingCache`` reconstructs full-size lossy K/V
and stores them densely (`fake_layer_merge_dynamic_cache.py:202-213`), so no
memory is saved. Here the cache holds, per layer group, the low-rank factors
of the stacked pre-RoPE K (and V) matrices:

    group matrix  M_K = [K_l0 | K_l1 | ... ]  shape (b, s_p, g*hkv*hd)
    factors       k_us (b, s_p, rk),  k_vt (b, rk, g*hkv*hd)

plus dense segments for everything the factors don't cover:
  * ungrouped layers' prefill K/V (post-RoPE K, as the reference stores),
  * grouped layers when merge_key/merge_value is off,
  * SLERP-merged layers (the MiniCache scheme is inherently full-size),
  * a preallocated decode *tail* holding tokens appended after prefill
    (new tokens can't cheaply join a frozen factorization; the hybrid
    factors+tail design realizes the windowed-compression intent of the
    reference fork's `src/patch_model.py:62-120`).

Memory accounting helpers quantify the achieved compression ratio.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from xkv_tpu.configs import XKVConfig
from xkv_tpu.models.config import ModelConfig


@struct.dataclass
class SlerpCompact:
    """Compact storage for one merged side (K or V) of a 2-layer SLERP
    (MiniCache) group — realizing the memory saving the reference's fake
    path cannot (`fake_layer_merge_dynamic_cache.py:93-100` stores both
    layers dense).

    After the MiniCache merge, divergent rows of the two layers are exactly
    parallel (both are ``merged_unit * norm_l``), so one shared direction
    row + two scalars represents them losslessly; only the non-divergent
    rows (which keep their original, non-parallel per-layer values) need
    both rows stored. Selection is by the CURRENT angle between the two
    stored rows (largest first), which also makes re-compaction after a
    tail fold idempotent. K rows are stored post-RoPE: rotation at a shared
    position preserves angles and commutes with the per-layer scalar norms.

    base:      (b, hkv, s, hd) shared unit direction per row.
    norms:     (b, hkv, s, 2) per-layer row norms.
    keep_idx:  (b, hkv, D) positions whose exact rows are kept.
    keep_rows: (b, hkv, D, 2, hd) exact rows of both layers at keep_idx.
    """

    base: jax.Array
    norms: jax.Array
    keep_idx: jax.Array
    keep_rows: jax.Array


@struct.dataclass
class GroupFactors:
    """Low-rank factors for one layer group. Fields are None when the
    corresponding side (K or V) is not merged.

    When int8-quantized (compress/quant.py): k_us/k_vt are int8 with the
    post-GEMM column scale in ``k_scale``; v_us is int8 with its per-rank
    scale in ``v_scale`` (v_vt stays bf16)."""

    k_us: Optional[jax.Array] = None  # (b, s_p, rk)
    k_vt: Optional[jax.Array] = None  # (b, rk, g*hkv*hd)
    v_us: Optional[jax.Array] = None  # (b, s_p, rv)
    v_vt: Optional[jax.Array] = None  # (b, rv, g*hkv*hd)
    k_scale: Optional[jax.Array] = None  # (b, 1, g*hkv*hd) fp32 (int8 only)
    v_scale: Optional[jax.Array] = None  # (b, 1, rv) fp32 (int8 only)
    # Mixed int8+int4 storage (factor_dtype="int4", rope_mode="post" only;
    # compress/quant.py packed-nibble format): k_us/v_us hold the int8 top
    # ranks, *_us4 the packed int4 tail, k_vt4/k_scale4 the tail's basis
    # and column scale. v_vt / v_scale are stored in the kernel's
    # [hi | lo-evens | lo-odds] rank order, so no runtime permutation.
    k_us4: Optional[jax.Array] = None  # (b, s_p, r_lo_k/2) int8 packed
    k_vt4: Optional[jax.Array] = None  # (b, r_lo_k, g*hkv*hd) int8 (eo rows)
    k_scale4: Optional[jax.Array] = None  # (b, 1, g*hkv*hd) fp32
    v_us4: Optional[jax.Array] = None  # (b, s_p, r_lo_v/2) int8 packed
    # MLA only: per-layer inverse rms of the (lossy) reconstructed latent,
    # (b, g, s_p) fp32. rms_norm's nonlinearity is a per-row scalar, so
    # precomputing it at compression time lets absorbed MLA decode run in
    # rank space without reconstructing the latent (models/deepseek.py).
    k_rnorm: Optional[jax.Array] = None
    # Quest-style per-chunk elementwise bounds of the POST-RoPE group keys,
    # (b, n_chunks, g*hkv*hd) each — present when the engine's sparse top-k
    # decode is enabled. U_c = qpos.kmax + qneg.kmin upper-bounds every true
    # q.k score inside the chunk, so selection never underrates the chunk
    # holding the best-matching key (chunk means wash single keys out).
    # Per-layer selection takes the same column slice as k_vt.
    k_cmin: Optional[jax.Array] = None
    k_cmax: Optional[jax.Array] = None
    # Compact MiniCache storage (slerp groups with slerp_compact=true).
    slerp_k: Optional[SlerpCompact] = None
    slerp_v: Optional[SlerpCompact] = None


@struct.dataclass
class XKVCache:
    """Hybrid factored + dense KV cache for one sequence batch.

    groups:  tuple of GroupFactors, ordered as ``XKVConfig.layer_groups``.
    dense_k: {layer_idx: (b, hkv, s_p, hd)} post-RoPE prefill keys for layers
             whose K is not factored.
    dense_v: {layer_idx: (b, hkv, s_p, hd)} prefill values for layers whose V
             is not factored.
    tail_k/tail_v: (L, b, hkv, t_max, hd) decode-time appended K (post-RoPE)
             and V for every layer.
    tail_len: () int32 — number of valid tail positions.
    """

    groups: Tuple[GroupFactors, ...]
    dense_k: Dict[int, jax.Array]
    dense_v: Dict[int, jax.Array]
    tail_k: jax.Array
    tail_v: jax.Array
    tail_len: jax.Array

    @property
    def prefill_len(self) -> int:
        if self.dense_k:
            return next(iter(self.dense_k.values())).shape[2]
        for g in self.groups:
            for f in (g.k_us, g.v_us):
                if f is not None:
                    return f.shape[1]
            for sc in (g.slerp_k, g.slerp_v):
                if sc is not None:
                    return sc.base.shape[2]
        raise ValueError("empty cache")

    @property
    def tail_max(self) -> int:
        return self.tail_k.shape[3]

    def append_tail(self, layer_idx: int, k: jax.Array, v: jax.Array) -> "XKVCache":
        """Write one decode step's K/V (b, hkv, ql, hd) at the current tail
        position for ``layer_idx``. ``tail_len`` is advanced separately once
        per step (see ``advance``)."""
        pos = self.tail_len
        tail_k = jax.lax.dynamic_update_slice(
            self.tail_k, k[None].astype(self.tail_k.dtype), (layer_idx, 0, 0, pos, 0)
        )
        tail_v = jax.lax.dynamic_update_slice(
            self.tail_v, v[None].astype(self.tail_v.dtype), (layer_idx, 0, 0, pos, 0)
        )
        return self.replace(tail_k=tail_k, tail_v=tail_v)

    def advance(self, n: int = 1) -> "XKVCache":
        return self.replace(tail_len=self.tail_len + n)

    def tile_batch(self, n: int) -> "XKVCache":
        """Replicate a batch-1 cache to batch ``n`` (serving warm-start /
        throughput benchmarking). Groups and dense segments carry batch on
        axis 0, the tail on axis 1."""

        def rep(x, axis):
            if x is None:
                return None
            reps = [1] * x.ndim
            reps[axis] = n
            return jnp.tile(x, reps)

        def rep_sc(sc):
            if sc is None:
                return None
            return SlerpCompact(
                base=rep(sc.base, 0), norms=rep(sc.norms, 0),
                keep_idx=rep(sc.keep_idx, 0), keep_rows=rep(sc.keep_rows, 0),
            )

        groups = tuple(
            GroupFactors(
                k_us=rep(g.k_us, 0), k_vt=rep(g.k_vt, 0),
                v_us=rep(g.v_us, 0), v_vt=rep(g.v_vt, 0),
                k_scale=rep(g.k_scale, 0), v_scale=rep(g.v_scale, 0),
                k_us4=rep(g.k_us4, 0), k_vt4=rep(g.k_vt4, 0),
                k_scale4=rep(g.k_scale4, 0), v_us4=rep(g.v_us4, 0),
                k_rnorm=rep(g.k_rnorm, 0),
                k_cmin=rep(g.k_cmin, 0), k_cmax=rep(g.k_cmax, 0),
                slerp_k=rep_sc(g.slerp_k), slerp_v=rep_sc(g.slerp_v),
            )
            for g in self.groups
        )
        return self.replace(
            groups=groups,
            dense_k={l: rep(a, 0) for l, a in self.dense_k.items()},
            dense_v={l: rep(a, 0) for l, a in self.dense_v.items()},
            tail_k=rep(self.tail_k, 1),
            tail_v=rep(self.tail_v, 1),
        )

    # ------------------------------------------------------------- memory
    def num_cache_bytes(self) -> int:
        """Bytes held for prefill KV (factors incl. scales + dense),
        excluding the tail (which exists in both compressed and baseline)."""
        total_bytes = 0
        for g in self.groups:
            for f in jax.tree_util.tree_leaves(g):
                total_bytes += f.size * f.dtype.itemsize
        for d in (self.dense_k, self.dense_v):
            for arr in d.values():
                total_bytes += arr.size * arr.dtype.itemsize
        return total_bytes

    def compression_ratio(self, cfg: ModelConfig) -> float:
        """Dense-cache bytes (at the engine's cache dtype) / stored bytes.
        Int8 factor quantization therefore shows up as extra compression."""
        b = self.tail_k.shape[1]
        s_p = self.prefill_len
        if cfg.model_type == "deepseek_v2":
            dense = cfg.num_layers * b * s_p * (cfg.kv_lora_rank + cfg.qk_rope_head_dim)
        else:
            dense = 2 * cfg.num_layers * b * cfg.num_kv_heads * s_p * cfg.head_dim
        dense_bytes = dense * self.tail_k.dtype.itemsize
        return dense_bytes / max(self.num_cache_bytes(), 1)


def init_tail(
    cfg: ModelConfig, batch: int, t_max: int, dtype=jnp.bfloat16
) -> Tuple[jax.Array, jax.Array]:
    if cfg.model_type == "deepseek_v2":
        # MLA: K slot carries the shared latent (1 "head" of kv_lora_rank),
        # V slot carries the small RoPE key (reference `deepseek_v2.py:214-232`).
        k_shape = (cfg.num_layers, batch, 1, t_max, cfg.kv_lora_rank)
        v_shape = (cfg.num_layers, batch, 1, t_max, cfg.qk_rope_head_dim)
        return jnp.zeros(k_shape, dtype), jnp.zeros(v_shape, dtype)
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, t_max, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def layer_group_index(xkv: XKVConfig) -> Dict[int, Tuple[int, int]]:
    """{layer_idx: (group_ordinal, position_within_group)} for grouped layers."""
    out: Dict[int, Tuple[int, int]] = {}
    for gi, grp in enumerate(xkv.layer_groups):
        for pos, lyr in enumerate(grp.layers):
            out[lyr] = (gi, pos)
    return out


def vt_layer_slice(vt: jax.Array, pos: int, num_kv_heads: int, head_dim: int) -> jax.Array:
    """Static column slice of a group's shared V^T for the layer at position
    ``pos`` in the group: columns [pos*hkv*hd, (pos+1)*hkv*hd).

    The reference splits the reconstructed tensor per layer along the head
    dim (`fake_layer_merge_dynamic_cache.py:181-182`); in factored form that
    split is a column slice of V^T.
    """
    width = num_kv_heads * head_dim
    return jax.lax.slice_in_dim(vt, pos * width, (pos + 1) * width, axis=2)
