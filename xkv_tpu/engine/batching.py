"""Continuous batching: slot-based scheduler over the factored cache.

The reference evaluates one sample at a time per rank
(`evaluate/evaluator.py:63-69`); the TPU build adds a serving layer (north
star: "continuous batching", BASELINE.json) built the XLA-friendly way:

  * B fixed decode *slots*; all shapes static.
  * Admission: a new request is prefilled alone (compiled per length
    bucket), its compressed cache is written into its slot at a fixed
    s_max padding; per-slot valid lengths mask attention.
  * One jitted ``decode_step_batched`` advances every active slot per step;
    finished slots (EOS / max tokens) free immediately and the next queued
    request is admitted — no batch-wide barrier.

Greedy decoding (the reference's eval setting).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xkv_tpu.cache import GroupFactors, SlerpCompact, XKVCache, init_tail
from xkv_tpu.configs import XKVConfig
from xkv_tpu.engine.compression import build_cache
from xkv_tpu.models.config import ModelConfig
from xkv_tpu.ops.rope import rope_cos_sin


@dataclass
class Request:
    request_id: int
    tokens: np.ndarray  # (s,) prompt
    max_new_tokens: int
    generated: List[int] = field(default_factory=list)
    done: bool = False


def _pad_to(arr: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


class BatchedEngine:
    """Slot-based continuous batching over the hybrid factored cache."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        xkv: Optional[XKVConfig],
        num_slots: int = 4,
        s_max: int = 2048,
        tail_max: int = 128,
        prefill_buckets: Optional[List[int]] = None,
        attention_impl: str = "xla",
        eos_token_id: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        factor_dtype=jnp.bfloat16,
        prefill_chunk: Optional[int] = None,
        sparse_topk: Optional[int] = None,
        sparse_block: int = 512,
        sparse_layers=None,
        speculative_k: Optional[int] = None,
        draft_rank: Optional[int] = None,
        mesh=None,
    ):
        if cfg.model_type == "deepseek_v2":
            from xkv_tpu.models import deepseek as model_module

            if xkv is not None and xkv.merge_value:
                raise ValueError("DeepSeek MLA: pass merge_value=False")
        else:
            from xkv_tpu.models import llama as model_module
        if factor_dtype == "int4":
            if cfg.model_type == "deepseek_v2":
                raise ValueError(
                    "factor_dtype='int4' is llama-family rope_mode='post' "
                    "only; MLA uses int8 factors"
                )
            if xkv is None or xkv.rope_mode != "post":
                raise ValueError(
                    "factor_dtype='int4' requires rope_mode='post' "
                    "(rank-space decode; docs/ROPE_MODES.md)"
                )
            if not (xkv.merge_key and xkv.merge_value):
                # The single-stream InferenceEngine carries the packed int4
                # tail through the mixed dense/factored fallback, but the
                # batched slot allocator lays out int4 slots for fully
                # merged groups only (per-slot dense segments for the
                # unmerged side are not allocated in the packed layout).
                raise ValueError(
                    "BatchedEngine factor_dtype='int4' requires "
                    "merge_key=True and merge_value=True (one-sided int4 "
                    "is supported by the single-stream InferenceEngine)"
                )
            if speculative_k is not None:
                raise ValueError(
                    "factor_dtype='int4' does not compose with batched "
                    "speculation yet (the multi-token verify pass needs "
                    "the mixed packed layout in its exact path); "
                    "sparse_topk composes (rank-space gathered rows)"
                )
            max_rank = max(
                max(g.rank_k or 0, g.rank_v or 0) for g in xkv.layer_groups
            )
            min_bucket = min(prefill_buckets or [s_max])
            if min_bucket < max_rank:
                # A shorter admission bucket clamps the SVD rank below the
                # configured rank, shrinking the int4 tail — the packed
                # nibble/eo-row layouts would then misalign with the
                # full-rank slot allocation.
                raise ValueError(
                    f"factor_dtype='int4' needs every prefill bucket >= the "
                    f"max factor rank ({max_rank}); got bucket {min_bucket}"
                )
        self._model = model_module
        self._mla = cfg.model_type == "deepseek_v2"
        self._quantized = factor_dtype in ("int8", jnp.int8)
        self._mixed4 = factor_dtype == "int4"
        # Multi-chip serving (the north-star v5e-8 deployment): slots are
        # DP-sharded over the mesh's data axis; weights, dense cache heads
        # and factor ranks are TP-sharded over the model axis
        # (parallel/sharding.py). The pallas decode path routes through the
        # shard_map TP kernels; everything else is GSPMD-propagated.
        self.mesh = mesh
        if mesh is not None:
            if "data" in mesh.shape and num_slots % mesh.shape["data"]:
                raise ValueError(
                    f"num_slots={num_slots} must be a multiple of the "
                    f"mesh data axis ({mesh.shape['data']})"
                )
            from xkv_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.xkv = xkv
        self.num_slots = num_slots
        self.s_max = s_max
        self.tail_max = tail_max
        self.attention_impl = attention_impl
        self.eos_token_id = eos_token_id
        self.cache_dtype = cache_dtype
        self.factor_dtype = factor_dtype
        self.prefill_buckets = sorted(prefill_buckets or [s_max])
        # Chunked admission: a long prompt prefills prefill_chunk tokens per
        # scheduler step, interleaved with decode steps for active slots —
        # no head-of-line blocking behind a 32K admission.
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None:
            bad = [b for b in self.prefill_buckets if b % prefill_chunk]
            if bad:
                raise ValueError(
                    f"prefill buckets {bad} not multiples of "
                    f"prefill_chunk={prefill_chunk}"
                )
        self._admitting: Optional[dict] = None
        self._chunk_jit: Dict[int, any] = {}
        self._compress_jit: Dict[int, any] = {}
        if sparse_topk is not None and self._mla:
            raise ValueError("sparse_topk is llama-family only")
        self.sparse_topk = sparse_topk
        self.sparse_block = sparse_block
        self.sparse_layers = (
            None if sparse_layers is None else frozenset(sparse_layers)
        )
        self._sparse_kw = (
            {} if sparse_topk is None
            else {"sparse_select": sparse_topk, "sparse_block": sparse_block,
                  "sparse_layers": self.sparse_layers}
        )
        # Rank-truncated drafts (MLA's speculative draft flavor; llama
        # drafts with sparse_topk). Draft-only: plain steps stay full-rank.
        if draft_rank is not None and not self._mla:
            raise ValueError("draft_rank drafts are MLA-only (llama-family "
                             "speculation drafts with sparse_topk)")
        self.draft_rank = draft_rank
        self._draft_kw = (
            self._sparse_kw if sparse_topk is not None
            else ({"draft_rank": draft_rank} if draft_rank is not None else {})
        )
        # Batched speculative decoding: every active slot drafts
        # ``speculative_k`` tokens with the cheap draft path (sparse top-k
        # for llama, rank-truncated latents for MLA), then ONE exact
        # multi-token pass verifies all slots at once; per-slot acceptance
        # lengths advance each slot independently. Output per request is
        # bit-exact to plain greedy decoding (`step` docstring).
        if speculative_k is not None:
            if sparse_topk is None and draft_rank is None:
                raise ValueError("speculative_k requires sparse_topk "
                                 "(llama) or draft_rank (MLA) — the draft "
                                 "path")
            if cfg.sliding_window is not None:
                # Early guard (ADVICE r3 #3): the multi-token verify pass
                # has no per-row window bound.
                raise ValueError(
                    "speculative_k does not compose with sliding_window "
                    "(multi-token verify has no per-row window bound)"
                )
            if speculative_k + 1 > tail_max:
                raise ValueError(f"speculative_k={speculative_k} needs "
                                 f"tail_max > speculative_k")
        self.speculative_k = speculative_k

        self.batch_cache = self._empty_batch_cache()
        self._cache_shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from xkv_tpu.parallel.sharding import cache_pspecs

            self._cache_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s),
                cache_pspecs(self.batch_cache),
                is_leaf=lambda x: isinstance(x, PartitionSpec),
            )
            self.batch_cache = jax.device_put(
                self.batch_cache, self._cache_shardings
            )
        self.prefill_len = np.zeros(num_slots, np.int32)
        self.tail_len = np.zeros(num_slots, np.int32)
        self.pos = np.zeros(num_slots, np.int32)
        self.token = np.zeros(num_slots, np.int32)
        self.slot_request: Dict[int, Request] = {}

        self.queue: List[Request] = []
        self._next_id = 0
        # Speculation telemetry: rounds run, tokens emitted by rounds, and
        # plain top-up steps (capacity-blocked rounds).
        self.spec_stats = {"rounds": 0, "round_tokens": 0, "plain_steps": 0}

        rope_dim = cfg.qk_rope_head_dim if self._mla else cfg.head_dim
        self._cos_sin = rope_cos_sin(
            jnp.arange(self.s_max), rope_dim, cfg.rope_theta, cfg.rope_scaling
        )
        self._prefill_jit: Dict[int, any] = {}
        self._step_jit = jax.jit(self._step_impl)
        self._spec_step_jit = jax.jit(self._spec_step_impl)
        self._insert_jit = jax.jit(self._insert_impl, static_argnames=("s_bucket",))
        self._refactor_jit = jax.jit(self._refactor_impl)
        # Per-slot refactorization: SVD groups refold tails into factors;
        # compact slerp groups re-compact in place (both in
        # refactorize_slot_cache). Dense/fake storage never refolds.
        self._can_refactor = (
            xkv is not None
            and (xkv.merge_key or xkv.merge_value)
            and (xkv.layer_merge_impl == "svd"
                 or (xkv.layer_merge_impl == "slerp" and xkv.slerp_compact))
        )

    # ------------------------------------------------------------ structure
    def _empty_batch_cache(self) -> XKVCache:
        cfg, xkv = self.cfg, self.xkv
        B, S = self.num_slots, self.s_max
        if self._mla:
            # MLA: K slot = shared latent (1 "head", kv_lora_rank wide);
            # V slot = RoPE key (qk_rope_head_dim wide), never merged.
            hkv, hd = 1, cfg.kv_lora_rank
        else:
            hkv, hd = cfg.num_kv_heads, cfg.head_dim
        groups = []
        dense_k, dense_v = {}, {}
        covered = set()
        if xkv is not None:
            for grp in xkv.layer_groups:
                covered.update(grp.layers)
                g = len(grp.layers)
                kw = {}
                quantlike = self._quantized or self._mixed4
                f_dtype = jnp.int8 if quantlike else self.factor_dtype
                if self._mixed4:
                    from xkv_tpu.engine.compression import int4_rank_hi

                    hi_k = int4_rank_hi(grp.rank_k, xkv.int4_rank_frac)
                    hi_v = int4_rank_hi(grp.rank_v, xkv.int4_rank_frac)
                compact_slerp = (
                    xkv.layer_merge_impl == "slerp" and xkv.slerp_compact
                )
                if compact_slerp:
                    # Fixed per-slot exception budget: the admission-time
                    # keep set (<= keep_frac * s_max) plus one tail fold's
                    # fresh rows. Beyond that, slot refolds re-approximate
                    # the lowest-angle rows (single-stream refolds grow the
                    # budget instead — see refactorize_slot_cache).
                    D = max(1, int(xkv.slerp_keep_frac * S)) + self.tail_max
                    sc = SlerpCompact(
                        base=jnp.zeros((B, hkv, S, hd), self.cache_dtype),
                        norms=jnp.zeros((B, hkv, S, 2), jnp.float32),
                        keep_idx=jnp.zeros((B, hkv, D), jnp.int32),
                        keep_rows=jnp.zeros(
                            (B, hkv, D, 2, hd), self.cache_dtype
                        ),
                    )
                    if xkv.merge_key:
                        kw["slerp_k"] = sc
                    else:
                        for l in grp.layers:
                            dense_k[l] = jnp.zeros(
                                (B, hkv, S, hd), self.cache_dtype
                            )
                    if xkv.merge_value:
                        kw["slerp_v"] = sc
                    else:
                        for l in grp.layers:
                            dense_v[l] = jnp.zeros(
                                (B, hkv, S, hd), self.cache_dtype
                            )
                    groups.append(GroupFactors(**kw))
                    continue
                if xkv.layer_merge_impl == "svd" and xkv.merge_key:
                    r8_k = hi_k if self._mixed4 else grp.rank_k
                    kw["k_us"] = jnp.zeros((B, S, r8_k), f_dtype)
                    kw["k_vt"] = jnp.zeros(
                        (B, r8_k, g * hkv * hd), f_dtype
                    )
                    if quantlike:
                        kw["k_scale"] = jnp.zeros(
                            (B, 1, g * hkv * hd), jnp.float32
                        )
                    if self._mixed4:
                        lo_k = grp.rank_k - hi_k
                        kw["k_us4"] = jnp.zeros((B, S, lo_k // 2), jnp.int8)
                        kw["k_vt4"] = jnp.zeros(
                            (B, lo_k, g * hkv * hd), jnp.int8
                        )
                        kw["k_scale4"] = jnp.zeros(
                            (B, 1, g * hkv * hd), jnp.float32
                        )
                    if self.sparse_topk is not None:
                        nc = -(-S // self.sparse_block)
                        kw["k_cmin"] = jnp.zeros(
                            (B, nc, g * hkv * hd), self.cache_dtype
                        )
                        kw["k_cmax"] = jnp.zeros(
                            (B, nc, g * hkv * hd), self.cache_dtype
                        )
                    if self._mla:
                        # Per-row inv-rms of the reconstructed latent —
                        # what lets batched MLA decode stay in rank space
                        # (the absorbed path in models/deepseek.py:673).
                        kw["k_rnorm"] = jnp.zeros((B, g, S), jnp.float32)
                else:
                    for l in grp.layers:
                        dense_k[l] = jnp.zeros((B, hkv, S, hd), self.cache_dtype)
                v_shape = (
                    (B, 1, S, cfg.qk_rope_head_dim) if self._mla
                    else (B, hkv, S, hd)
                )
                if xkv.layer_merge_impl == "svd" and xkv.merge_value:
                    r8_v = hi_v if self._mixed4 else grp.rank_v
                    kw["v_us"] = jnp.zeros((B, S, r8_v), f_dtype)
                    # v_vt keeps ALL rank_v rows (bf16, [hi | lo-eo] order
                    # in mixed4); only us splits into int8 + packed int4.
                    kw["v_vt"] = jnp.zeros(
                        (B, grp.rank_v, g * hkv * hd),
                        jnp.bfloat16 if quantlike else f_dtype,
                    )
                    if quantlike:
                        kw["v_scale"] = jnp.zeros((B, 1, grp.rank_v), jnp.float32)
                    if self._mixed4:
                        kw["v_us4"] = jnp.zeros(
                            (B, S, (grp.rank_v - hi_v) // 2), jnp.int8
                        )
                else:
                    for l in grp.layers:
                        dense_v[l] = jnp.zeros(v_shape, self.cache_dtype)
                groups.append(GroupFactors(**kw))
        for l in range(cfg.num_layers):
            if l not in covered:
                dense_k[l] = jnp.zeros((B, hkv, S, hd), self.cache_dtype)
                dense_v[l] = jnp.zeros(
                    (B, 1, S, cfg.qk_rope_head_dim) if self._mla
                    else (B, hkv, S, hd),
                    self.cache_dtype,
                )
        tail_k, tail_v = init_tail(cfg, B, self.tail_max, self.cache_dtype)
        return XKVCache(
            groups=tuple(groups),
            dense_k=dense_k,
            dense_v=dense_v,
            tail_k=tail_k,
            tail_v=tail_v,
            tail_len=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ admission
    def _compress_kvs(self, kvs, s_bucket: int, true_len):
        """Mask padded rows to zero and compress into a batch-1 cache.

        Right-padding is safe: the valid region [0, s) attends only within
        itself (causal), so its K/V and logits are exact. Zero rows are
        exactly representable by the SVD (zero rows of U) and consume no
        rank, and decode masks them via per-slot prefill_len. Everything is
        static per bucket: one compile per bucket, not per prompt length.
        """
        mask = (jnp.arange(s_bucket) < true_len)[None, None, :, None]
        kvs = [(k * mask, v * mask) for k, v in kvs]
        cos_p, sin_p = (x[:s_bucket] for x in self._cos_sin)
        rope_k = not self._mla
        if self.xkv is not None:
            return build_cache(
                kvs, self.xkv, self.cfg, cos_p, sin_p, tail_max=1,
                factor_dtype=self.factor_dtype,
                cache_dtype=self.cache_dtype,
                rope_dense_keys=rope_k,
                sparse_block=(
                    self.sparse_block if self.sparse_topk is not None else None
                ),
                valid_len=true_len,
            )
        from xkv_tpu.engine.compression import build_uncompressed_cache

        return build_uncompressed_cache(
            kvs, self.cfg, cos_p, sin_p, tail_max=1,
            cache_dtype=self.cache_dtype,
            rope_dense_keys=rope_k,
        )

    def _pick_bucket(self, s: int) -> int:
        bucket = next((b for b in self.prefill_buckets if b >= s), None)
        if bucket is None:
            raise ValueError(f"prompt length {s} exceeds s_max={self.s_max}")
        return bucket

    def _prefill_one(self, tokens: np.ndarray):
        """Single-sequence monolithic prefill + compress at a bucketed
        length."""
        s = tokens.shape[-1]
        bucket = self._pick_bucket(s)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :s] = tokens
        if bucket not in self._prefill_jit:

            prefill_kw = {"attention_impl": self.attention_impl}
            if self.mesh is not None:
                # pallas flash prefill needs the explicit shard_map TP path
                # (flash_attention_tp); MLA attention under a mesh stays
                # XLA, but the mesh still reaches the MoE layers (EP).
                if self._mla:
                    prefill_kw["attention_impl"] = "xla"
                prefill_kw["mesh"] = self.mesh

            def fn(params, toks, true_len):
                # Unembed only the last valid position — the full
                # (1, bucket, vocab) fp32 logits would dominate admission
                # memory at long buckets (4.2 GB at 32K x 32000).
                logits, kvs = self._model.prefill(
                    params, self.cfg, toks,
                    logits_position=true_len - 1,
                    **prefill_kw,
                )
                cache1 = self._compress_kvs(kvs, toks.shape[1], true_len)
                return logits[0, 0], cache1

            self._prefill_jit[bucket] = jax.jit(fn)
        first_logits, cache1 = self._prefill_jit[bucket](
            self.params, jnp.asarray(padded), s
        )
        first_token = int(np.argmax(np.asarray(first_logits)))
        return cache1, first_token, s, bucket

    # ------------------------------------------------- chunked admission
    def _start_admission(self, req: Request, slot: int):
        s = int(req.tokens.shape[-1])
        bucket = self._pick_bucket(s)
        L = self.cfg.num_layers
        dt = self.params["embed"].dtype
        if self._mla:
            # K scratch = RoPE-free latent, V scratch = roped k_pe
            # (deepseek.prefill_chunk).
            k_shape = (L, 1, 1, bucket, self.cfg.kv_lora_rank)
            v_shape = (L, 1, 1, bucket, self.cfg.qk_rope_head_dim)
        else:
            hkv, hd = self.cfg.num_kv_heads, self.cfg.head_dim
            k_shape = v_shape = (L, 1, hkv, bucket, hd)
        self._admitting = dict(
            req=req, slot=slot, bucket=bucket, s=s, ci=0,
            scratch_k=jnp.zeros(k_shape, dt),
            scratch_v=jnp.zeros(v_shape, dt),
        )

    def _advance_admission(self):
        """Run ONE prefill chunk; on the last chunk, compress + insert."""
        a = self._admitting
        C = self.prefill_chunk
        pos0 = a["ci"] * C
        s, bucket = a["s"], a["bucket"]
        valid = min(C, s - pos0)
        chunk = np.zeros((1, C), np.int32)
        chunk[0, :valid] = a["req"].tokens[pos0: pos0 + valid]
        final = pos0 + C >= s
        last_idx = valid - 1 if final else C - 1
        if bucket not in self._chunk_jit:

            def fn(params, toks, sk, sv, p0, li, cos_s, sin_s):
                return self._model.prefill_chunk(
                    params, self.cfg, toks, sk, sv, p0, cos_s, sin_s, li
                )

            self._chunk_jit[bucket] = jax.jit(fn, donate_argnums=(2, 3))
        cos_s, sin_s = (x[:bucket] for x in self._cos_sin)
        logits, a["scratch_k"], a["scratch_v"] = self._chunk_jit[bucket](
            self.params, jnp.asarray(chunk), a["scratch_k"], a["scratch_v"],
            jnp.asarray(pos0, jnp.int32), jnp.asarray(last_idx, jnp.int32),
            cos_s, sin_s,
        )
        a["ci"] += 1
        if final:
            self._finish_admission(logits)

    def _finish_admission(self, logits):
        a = self._admitting
        self._admitting = None
        bucket, s, slot, req = a["bucket"], a["s"], a["slot"], a["req"]
        if bucket not in self._compress_jit:

            def fn(sk, sv, true_len):
                kvs = [(sk[l], sv[l]) for l in range(self.cfg.num_layers)]
                return self._compress_kvs(kvs, bucket, true_len)

            self._compress_jit[bucket] = jax.jit(fn, donate_argnums=(0, 1))
        cache1 = self._compress_jit[bucket](a["scratch_k"], a["scratch_v"], s)
        first_token = int(np.argmax(np.asarray(logits[0, 0])))
        self.batch_cache = self._insert_jit(
            self.batch_cache, cache1, slot, s_bucket=bucket
        )
        req.generated.append(first_token)
        self.slot_request[slot] = req
        self.prefill_len[slot] = s
        self.tail_len[slot] = 0
        self.pos[slot] = s
        self.token[slot] = first_token
        self._maybe_finish(slot)

    def _insert_impl(self, batch_cache: XKVCache, cache1: XKVCache, slot: int,
                     s_bucket: int):
        """Write one sequence's padded cache into its slot."""

        def ins(dst, src):
            src = _pad_to(src, self.s_max, axis=-2 if src.ndim == 4 else 1)
            return jax.lax.dynamic_update_slice_in_dim(dst, src, slot, axis=0)

        def ins_field(dst, src, pad_axis=None):
            if dst is None:
                return None
            if pad_axis is not None:
                src = _pad_to(src, dst.shape[pad_axis], pad_axis)
            return jax.lax.dynamic_update_slice_in_dim(dst, src, slot, axis=0)

        def ins_slerp(dst, src):
            """Write a bucket-sized SlerpCompact into the slot layout.

            Sequence rows pad with zeros (base/norms 0 -> reconstructs zero
            rows, masked by prefill_len). The exception budget pads by
            DUPLICATING entry 0: duplicate scatter indices then write the
            same values, so compact_reconstruct stays deterministic."""
            if dst is None:
                return None
            D = dst.keep_idx.shape[2]
            d = src.keep_idx.shape[2]
            if d < D:
                reps = [1] * 3
                reps[2] = D - d
                idx = jnp.concatenate(
                    [src.keep_idx, jnp.tile(src.keep_idx[:, :, :1], reps)],
                    axis=2,
                )
                rows = jnp.concatenate(
                    [src.keep_rows,
                     jnp.tile(src.keep_rows[:, :, :1], reps + [1, 1])],
                    axis=2,
                )
                src = src.replace(keep_idx=idx, keep_rows=rows)
            return SlerpCompact(
                base=ins_field(dst.base, src.base, pad_axis=2),
                norms=ins_field(dst.norms, src.norms, pad_axis=2),
                keep_idx=ins_field(dst.keep_idx, src.keep_idx),
                keep_rows=ins_field(dst.keep_rows, src.keep_rows),
            )

        groups = []
        for gd, gs in zip(batch_cache.groups, cache1.groups):
            groups.append(
                GroupFactors(
                    k_us=ins_field(gd.k_us, gs.k_us, pad_axis=1),
                    k_vt=ins_field(gd.k_vt, gs.k_vt),
                    v_us=ins_field(gd.v_us, gs.v_us, pad_axis=1),
                    v_vt=ins_field(gd.v_vt, gs.v_vt),
                    k_scale=ins_field(gd.k_scale, gs.k_scale),
                    v_scale=ins_field(gd.v_scale, gs.v_scale),
                    k_us4=ins_field(gd.k_us4, gs.k_us4, pad_axis=1),
                    k_vt4=ins_field(gd.k_vt4, gs.k_vt4),
                    k_scale4=ins_field(gd.k_scale4, gs.k_scale4),
                    v_us4=ins_field(gd.v_us4, gs.v_us4, pad_axis=1),
                    k_rnorm=ins_field(gd.k_rnorm, gs.k_rnorm, pad_axis=2),
                    k_cmin=ins_field(gd.k_cmin, gs.k_cmin, pad_axis=1),
                    k_cmax=ins_field(gd.k_cmax, gs.k_cmax, pad_axis=1),
                    slerp_k=ins_slerp(gd.slerp_k, gs.slerp_k),
                    slerp_v=ins_slerp(gd.slerp_v, gs.slerp_v),
                )
            )
        dense_k = {
            l: jax.lax.dynamic_update_slice_in_dim(
                batch_cache.dense_k[l], _pad_to(cache1.dense_k[l], self.s_max, 2),
                slot, axis=0,
            )
            for l in batch_cache.dense_k
        }
        dense_v = {
            l: jax.lax.dynamic_update_slice_in_dim(
                batch_cache.dense_v[l], _pad_to(cache1.dense_v[l], self.s_max, 2),
                slot, axis=0,
            )
            for l in batch_cache.dense_v
        }
        # reset the slot's tail
        tail_k = batch_cache.tail_k.at[:, slot].set(0)
        tail_v = batch_cache.tail_v.at[:, slot].set(0)
        return batch_cache.replace(
            groups=tuple(groups), dense_k=dense_k, dense_v=dense_v,
            tail_k=tail_k, tail_v=tail_v,
        )

    def _refactor_impl(self, batch_cache, slot, plen):
        from xkv_tpu.engine.compression import refactorize_slot_cache

        return refactorize_slot_cache(batch_cache, self.xkv, self.cfg, slot, plen)

    # ------------------------------------------------------------ stepping
    def _step_impl(self, batch_cache, params, token, pos, prefill_len, tail_len):
        logits, batch_cache = self._model.decode_step_batched(
            params, self.cfg, self.xkv, batch_cache,
            token, pos, prefill_len, tail_len, self._cos_sin,
            attention_impl=self.attention_impl, mesh=self.mesh,
            **self._sparse_kw,
        )
        if self._cache_shardings is not None:
            # Pin the cache layout so per-step GSPMD choices can't drift it
            # away from the slot-DP / head-TP placement.
            batch_cache = jax.lax.with_sharding_constraint(
                batch_cache, self._cache_shardings
            )
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return next_tok, batch_cache

    def _spec_step_impl(self, batch_cache, params, token, pos, prefill_len,
                        tail_len):
        """One batched speculative round (engine.py `_spec_round_impl`, made
        per-slot): draft ``speculative_k`` tokens for EVERY slot with the
        sparse path, verify them all with ONE exact multi-token batched
        pass, accept each slot's longest matching prefix.

        The verify pass re-appends exact K/V over rows [tail_len,
        tail_len+k+1) of every slot's tail (draft rows are sparse-flavored),
        so each slot's cache state equals having decoded its accepted tokens
        exactly. Returns (exact (B, k+1), n_out (B,), cache); the scheduler
        advances slot ``i`` by n_out[i] and emits exact[i, :n_out[i]].
        """
        k = self.speculative_k
        t0 = tail_len

        def body(carry, _):
            tk, tv, tl, tok, p = carry
            c = batch_cache.replace(tail_k=tk, tail_v=tv)
            logits, c2 = self._model.decode_step_batched(
                params, self.cfg, self.xkv, c, tok, p, prefill_len, tl,
                self._cos_sin, attention_impl=self.attention_impl,
                mesh=self.mesh, **self._draft_kw,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (c2.tail_k, c2.tail_v, tl + 1, nxt, p + 1), nxt

        init = (batch_cache.tail_k, batch_cache.tail_v, t0, token, pos)
        (tk, tv, _, _, _), drafts = jax.lax.scan(body, init, None, length=k)
        drafts = jnp.transpose(drafts, (1, 0))  # (B, k)

        vcache = batch_cache.replace(tail_k=tk, tail_v=tv)
        inputs = jnp.concatenate([token[:, None], drafts], axis=1)  # (B, k+1)
        logits, vcache = self._model.decode_step_batched(
            params, self.cfg, self.xkv, vcache, inputs, pos, prefill_len, t0,
            self._cos_sin, attention_impl=self.attention_impl, mesh=self.mesh,
        )
        if self._cache_shardings is not None:
            vcache = jax.lax.with_sharding_constraint(
                vcache, self._cache_shardings
            )
        exact = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
        matches = drafts == exact[:, :k]
        n_acc = jnp.sum(jnp.cumprod(matches.astype(jnp.int32), axis=1), axis=1)
        return exact, n_acc + 1, vcache

    # ------------------------------------------------------------ public API
    def submit(self, tokens, max_new_tokens: int) -> int:
        req = Request(self._next_id, np.asarray(tokens, np.int32).reshape(-1),
                      max_new_tokens)
        self._next_id += 1
        self.queue.append(req)
        return req.request_id

    def _free_slots(self) -> List[int]:
        return [i for i in range(self.num_slots) if i not in self.slot_request]

    def _admit(self):
        if self.prefill_chunk is not None:
            # Chunked: at most one admission in flight; ONE chunk per
            # scheduler step, so decode steps interleave with long prefills.
            if self._admitting is None and self.queue and self._free_slots():
                self._start_admission(self.queue.pop(0), self._free_slots()[0])
            if self._admitting is not None:
                self._advance_admission()
            return
        for slot in self._free_slots():
            if not self.queue:
                break
            req = self.queue.pop(0)
            cache1, first_token, s, bucket = self._prefill_one(req.tokens)
            self.batch_cache = self._insert_jit(
                self.batch_cache, cache1, slot, s_bucket=bucket
            )
            req.generated.append(first_token)
            self.slot_request[slot] = req
            self.prefill_len[slot] = s
            self.tail_len[slot] = 0
            self.pos[slot] = s
            self.token[slot] = first_token
            self._maybe_finish(slot)

    def _maybe_finish(self, slot: int):
        req = self.slot_request.get(slot)
        if req is None:
            return
        last = req.generated[-1]
        if (
            len(req.generated) >= req.max_new_tokens
            or (self.eos_token_id is not None and last == self.eos_token_id)
        ):
            req.done = True
            del self.slot_request[slot]

    def _handle_full_tail(self, slot: int):
        """A slot whose tail filled either folds the tail back into its
        factors in place (periodic refactorization — generation continues
        until the slot's static row capacity s_max is exhausted) or, when
        that's impossible, finishes early."""
        if slot not in self.slot_request or self.tail_len[slot] < self.tail_max:
            return
        plen = int(self.prefill_len[slot])
        if self._can_refactor and plen + self.tail_max <= self.s_max:
            self.batch_cache = self._refactor_jit(
                self.batch_cache,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(plen, jnp.int32),
            )
            self.prefill_len[slot] = plen + self.tail_max
            self.tail_len[slot] = 0
        else:
            req = self.slot_request.pop(slot)
            req.done = True
            self._tail_capacity_finished.append(req)

    def step(self) -> List[Request]:
        """Admit queued requests, run one decode step (or one speculative
        round when ``speculative_k`` is set — emitted tokens are bit-exact
        to plain greedy decoding either way), return newly finished
        requests."""
        self._admit()
        if not self.slot_request:
            return []
        if self.speculative_k is not None and not self._spec_blocked():
            return self._spec_round()
        if self.speculative_k is not None:
            self.spec_stats["plain_steps"] += 1
        next_tok, self.batch_cache = self._step_jit(
            self.batch_cache,
            self.params,
            jnp.asarray(self.token),
            jnp.asarray(self.pos),
            jnp.asarray(self.prefill_len),
            jnp.asarray(self.tail_len),
        )
        next_tok = np.asarray(next_tok)
        finished = []
        self._tail_capacity_finished: List[Request] = []
        for slot, req in list(self.slot_request.items()):
            self.tail_len[slot] += 1
            self.pos[slot] += 1
            tok = int(next_tok[slot])
            req.generated.append(tok)
            self.token[slot] = tok
            self._maybe_finish(slot)
            if req.done:
                finished.append(req)
            else:
                self._handle_full_tail(slot)
        finished.extend(self._tail_capacity_finished)
        return finished

    def _spec_blocked(self) -> bool:
        """True when some active slot lacks tail room for a full speculative
        round (k drafts + 1). Those slots top up with plain steps until the
        tail fills and `_handle_full_tail` folds it back into the factors."""
        need = self.speculative_k + 1
        return any(
            self.tail_len[slot] + need > self.tail_max
            for slot in self.slot_request
        )

    def _spec_round(self) -> List[Request]:
        """One batched speculative round: advance every active slot by its
        own acceptance length (1..k+1 tokens)."""
        exact, n_out, self.batch_cache = self._spec_step_jit(
            self.batch_cache,
            self.params,
            jnp.asarray(self.token),
            jnp.asarray(self.pos),
            jnp.asarray(self.prefill_len),
            jnp.asarray(self.tail_len),
        )
        exact = np.asarray(exact)
        n_out = np.asarray(n_out)
        self.spec_stats["rounds"] += 1
        finished = []
        self._tail_capacity_finished: List[Request] = []
        for slot, req in list(self.slot_request.items()):
            n = int(n_out[slot])
            self.spec_stats["round_tokens"] += n
            # Cache rows [t0, t0+n) are this slot's real history now, even
            # if EOS/max_new truncates the *emitted* tokens below (the slot
            # is freed in that case, so the extra rows never matter).
            self.tail_len[slot] += n
            self.pos[slot] += n
            for tok in exact[slot, :n]:
                req.generated.append(int(tok))
                self.token[slot] = int(tok)
                self._maybe_finish(slot)
                if req.done:
                    break
            if req.done:
                finished.append(req)
            else:
                self._handle_full_tail(slot)
        finished.extend(self._tail_capacity_finished)
        return finished

    def run(self) -> List[Request]:
        """Drain the queue; returns all finished requests."""
        done: List[Request] = []
        while self.queue or self.slot_request or self._admitting is not None:
            done.extend(self.step())
        return done
