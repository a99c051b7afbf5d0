"""Single-sequence/batch inference engine: jitted prefill + compress + decode.

Drives the xKV pipeline end-to-end (reference call stack §3.2 of SURVEY.md,
`xKV/attn_patch/llama.py:19-73` + `fake_layer_merge_dynamic_cache.py:127-208`):

  prefill(tokens)  -> clean causal forward, stash pre-RoPE K / V per layer,
                      compress groups into low-rank factors, build cache
  decode           -> lax.scan'd greedy loop reading the factored cache

Modes:
  * "factored"     — the real system: cache holds factors (+ dense tail).
  * "fake"         — reference-parity: dense lossy reconstruction stored.
  * "none"         — uncompressed baseline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xkv_tpu.cache import XKVCache
from xkv_tpu.configs import XKVConfig
from xkv_tpu.engine.compression import build_cache, build_uncompressed_cache
from xkv_tpu.models.config import ModelConfig
from xkv_tpu.ops.rope import rope_cos_sin


class InferenceEngine:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        xkv: Optional[XKVConfig] = None,
        mode: str = "factored",
        tail_max: int = 128,
        attention_impl: str = "xla",
        donate_cache: bool = True,
        cache_dtype=jnp.bfloat16,
        factor_dtype=jnp.bfloat16,
        mesh=None,
        prefill_logits: str = "all",
        sparse_topk: Optional[int] = None,
        sparse_block: int = 512,
        sparse_layers=None,
        sparse_topk_max: Optional[int] = None,
        sparse_adaptive_band: float = 0.5,
        draft_rank: Optional[int] = None,
        sequence_parallel: bool = False,
        staged_prefill: bool = False,
    ):
        if mode not in ("factored", "fake", "none"):
            raise ValueError(f"unknown mode {mode!r}")
        if prefill_logits not in ("all", "last"):
            raise ValueError(f"unknown prefill_logits {prefill_logits!r}")
        self.prefill_logits = prefill_logits
        # Sparse top-k decode: attend only to the sparse_topk highest-scoring
        # sparse_block-sized prefill chunks per step (landmark selection over
        # the factored cache — approximate; sink + recency chunks always
        # kept, the dense tail stays exact).
        if sparse_topk is not None:
            if mode != "factored":
                raise ValueError("sparse_topk requires mode='factored'")
            if cfg.model_type == "deepseek_v2":
                raise ValueError(
                    "sparse_topk is llama-family only (MLA's absorbed decode "
                    "is already rank-space)"
                )
            # factor_dtype='int4' composes (round 4): Quest selection
            # gathers int8 + packed-int4 rows and the rank-space XLA path
            # attends over them (sparse_rankspace_decode_attention_xla).
        if factor_dtype == "int4":
            # llama-family needs rope_mode='post' (rank-space decode);
            # MLA latents are RoPE-free and compose directly (round 4 —
            # mixed int8+int4 score/value terms in the absorbed decode).
            if cfg.model_type != "deepseek_v2" and xkv is not None \
                    and mode == "factored" and xkv.rope_mode != "post":
                raise ValueError(
                    "factor_dtype='int4' requires rope_mode='post' "
                    "(rank-space decode; docs/ROPE_MODES.md)"
                )
            # merge-one-side int4 runs through the mixed dense/factored
            # fallback, which carries the packed int4 tail via
            # dequantize_{k,v}_mixed4 (models/llama.py; VERDICT r3 #4).
        self.sparse_topk = sparse_topk
        self.sparse_block = sparse_block
        # Per-layer sparse/dense mixing: Quest-bound informativeness is
        # layer-dependent (docs/RULER_OFFLINE.md — a retrieval layer with
        # uninformative bounds loses the needle); layers outside
        # sparse_layers read the factored cache exactly.
        self.sparse_layers = (
            None if sparse_layers is None else frozenset(sparse_layers)
        )
        # Adaptive budget (VERDICT r4 #10): per decode step, spend
        # sparse_topk_max chunks instead of sparse_topk when the Quest
        # bound statistics show many near-max ("hot") chunks — the
        # multi-answer signature. Single-device llama-family only (the TP
        # sparse path keeps a static per-shard budget).
        if sparse_topk_max is not None:
            if sparse_topk is None:
                raise ValueError("sparse_topk_max requires sparse_topk")
            if sparse_topk_max <= sparse_topk:
                raise ValueError("sparse_topk_max must exceed sparse_topk")
            if mesh is not None:
                raise ValueError(
                    "sparse_topk_max is single-device (TP sparse selection "
                    "is per-shard with a static budget)"
                )
        self.sparse_topk_max = sparse_topk_max
        self._sparse_kw = (
            {} if sparse_topk is None
            else {"sparse_select": sparse_topk, "sparse_block": sparse_block,
                  "sparse_layers": self.sparse_layers,
                  "sparse_select_max": sparse_topk_max,
                  "sparse_adaptive_band": sparse_adaptive_band}
        )
        # Rank-truncated drafts for speculative decoding (MLA: the absorbed
        # decode has no sparse chunk path, but the SVD-ordered latent
        # factors truncate to the best rank-r approximation). Draft-only:
        # plain decode stays full-rank.
        if draft_rank is not None:
            if cfg.model_type != "deepseek_v2":
                raise ValueError("draft_rank drafts are MLA-only "
                                 "(llama-family speculation drafts with "
                                 "sparse_topk)")
            if mode != "factored":
                raise ValueError("draft_rank requires mode='factored'")
        self.draft_rank = draft_rank
        self._draft_kw = (
            self._sparse_kw if sparse_topk is not None
            else ({"draft_rank": draft_rank} if draft_rank is not None else {})
        )
        if mode != "none" and xkv is None:
            raise ValueError("xkv config required unless mode='none'")
        if cfg.model_type == "deepseek_v2":
            from xkv_tpu.models import deepseek as model_module

            if xkv is not None and xkv.merge_value:
                # reference deepseek_v2.py:222-223: only the latent is merged
                raise ValueError(
                    "DeepSeek MLA does not support merge_value (the V slot "
                    "holds the uncompressed RoPE key); pass merge_value=False"
                )
        else:
            from xkv_tpu.models import llama as model_module
        self._model = model_module
        self._rope_dense_keys = cfg.model_type != "deepseek_v2"
        # With a mesh, weights are TP/DP-sharded up front and GSPMD propagates
        # shardings through prefill/decode, inserting ICI collectives
        # (scaling-book recipe: annotate inputs, let XLA do the rest).
        self.mesh = mesh
        if mesh is not None:
            from xkv_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.xkv = xkv
        self.mode = mode
        self.tail_max = tail_max
        self.attention_impl = attention_impl
        self.cache_dtype = cache_dtype
        self.factor_dtype = factor_dtype
        # Sequence-parallel prefill: the prompt's sequence axis is sharded
        # over the mesh data axis and attention runs the ring — for
        # prompts beyond one chip's HBM (VERDICT r2 #9). llama-family only.
        self.sequence_parallel = sequence_parallel
        if sequence_parallel:
            if mesh is None or "data" not in mesh.shape:
                raise ValueError(
                    "sequence_parallel requires a mesh with a 'data' axis"
                )
            if cfg.model_type == "deepseek_v2":
                raise ValueError(
                    "sequence_parallel prefill is llama-family only (MLA "
                    "prefill shards batch over data instead)"
                )

        # Staged prefill: run the forward one SVD group at a time and
        # compress each group's K/V as its layers complete — peak HBM holds
        # ONE group's dense K/V instead of every layer's. The monolithic
        # 12-layer graph at 64K carries 10.6 GB of K/V temps (XLA cannot
        # free a group's K/V until build_cache consumes it at the END of
        # the mega-graph) and OOMs a 16 GB chip at compile; the staged
        # path serves depths the monolith cannot (VERDICT r4 #3).
        self.staged_prefill = staged_prefill
        if staged_prefill:
            if mode != "factored" or xkv is None:
                raise ValueError("staged_prefill requires mode='factored'")
            if xkv.layer_merge_impl != "svd":
                raise ValueError("staged_prefill supports the svd scheme only")
            if cfg.model_type == "deepseek_v2":
                raise ValueError("staged_prefill is llama-family only")
            if mesh is not None or sequence_parallel:
                raise ValueError(
                    "staged_prefill is single-device (the sharded prefill "
                    "paths stream through GSPMD instead)"
                )
            if prefill_logits != "last":
                raise ValueError("staged_prefill computes last-position "
                                 "logits only (prefill_logits='last')")
            for grp in xkv.layer_groups:
                lo = grp.layers[0]
                if list(grp.layers) != list(range(lo, lo + len(grp.layers))):
                    raise ValueError(
                        "staged_prefill needs contiguous layer groups, got "
                        f"{grp.layers}"
                    )

        self._prefill_fn = jax.jit(self._prefill_impl)
        self._refactorize_fn = jax.jit(self._refactorize_impl)
        donate = (0,) if donate_cache else ()
        self._decode_fn = jax.jit(self._decode_impl, donate_argnums=donate)
        self._generate_fn = jax.jit(
            self._generate_impl, static_argnames=("n_steps",), donate_argnums=donate
        )
        self._score_fn = jax.jit(self._score_impl, donate_argnums=donate)
        self._spec_jit = {}

    # ------------------------------------------------------------ internals
    def _rope_tables(self, s: int) -> Tuple[jax.Array, jax.Array]:
        """Pure rope-table computation (safe inside jit traces)."""
        return rope_cos_sin(
            jnp.arange(s), self.cfg.head_dim, self.cfg.rope_theta,
            self.cfg.rope_scaling,
        )

    def _prefill_cos_sin(self, s: int) -> Tuple[jax.Array, jax.Array]:
        """RoPE tables for prefill positions, computed ONCE per length and
        kept on device as concrete arrays — recomputing 2*s*hd
        transcendentals inside every decode call costs ~1 ms/step at 32K.
        Only call OUTSIDE jit traces (tables become args to the jits)."""
        if not hasattr(self, "_cos_sin_cache"):
            self._cos_sin_cache = {}
        if s not in self._cos_sin_cache:
            self._cos_sin_cache[s] = jax.jit(lambda: self._rope_tables(s))()
        return self._cos_sin_cache[s]

    def _prefill_impl(self, params, tokens):
        # Under a mesh, the pallas flash kernel goes through an explicit
        # shard_map (flash_attention_tp — pallas_call has no GSPMD
        # partitioning rules). MLA prefill under a mesh stays on the
        # blockwise XLA path.
        prefill_kw = {}
        if self.mesh is not None:
            if self._model.__name__.endswith("deepseek"):
                # MLA attention stays on the blockwise XLA path, but the
                # mesh still reaches the MoE layers (expert parallelism).
                prefill_kw["attention_impl"] = "xla"
                prefill_kw["mesh"] = self.mesh
            else:
                prefill_kw["attention_impl"] = self.attention_impl
                prefill_kw["mesh"] = self.mesh
                if self.sequence_parallel:
                    prefill_kw["sequence_parallel"] = True
        else:
            prefill_kw["attention_impl"] = self.attention_impl
        logits, kvs = self._model.prefill(
            params, self.cfg, tokens,
            logits_position=(
                tokens.shape[1] - 1 if self.prefill_logits == "last" else None
            ),
            **prefill_kw,
        )
        cos_p, sin_p = self._rope_tables(tokens.shape[1])
        if self.mode == "none":
            cache = build_uncompressed_cache(
                kvs, self.cfg, cos_p, sin_p, self.tail_max,
                cache_dtype=self.cache_dtype,
                rope_dense_keys=self._rope_dense_keys,
            )
        else:
            cache = build_cache(
                kvs,
                self.xkv,
                self.cfg,
                cos_p,
                sin_p,
                self.tail_max,
                fake=(self.mode == "fake"),
                factor_dtype=self.factor_dtype,
                cache_dtype=self.cache_dtype,
                rope_dense_keys=self._rope_dense_keys,
                sparse_block=(
                    self.sparse_block if self.sparse_topk is not None else None
                ),
            )
        return logits, cache

    def _compress_group_jit(self, grp):
        """One compiled per-group compressor, cached by group SHAPE — with
        uniform groups every group reuses a single compile. The group is
        re-keyed to local layer indices 0..g-1 so the closure is
        layer-id-free; the caller maps the dense outputs back."""
        key = (len(grp.layers), grp.rank_k, grp.rank_v)
        cj = self._staged["compress"]
        if key not in cj:
            import dataclasses

            from xkv_tpu.engine.compression import compress_svd_group

            grp_local = dataclasses.replace(
                grp, layers=list(range(len(grp.layers)))
            )

            def fn(ks, vs, cos, sin):
                return compress_svd_group(
                    ks, vs, grp_local, self.xkv, self.cfg, cos, sin,
                    factor_dtype=self.factor_dtype,
                    cache_dtype=self.cache_dtype,
                    rope_dense_keys=self._rope_dense_keys,
                    sparse_block=(
                        self.sparse_block if self.sparse_topk is not None
                        else None
                    ),
                )

            cj[key] = jax.jit(fn)
        return cj[key]

    def _prefill_staged(self, tokens):
        """Per-group prefill + compression (see __init__ staged_prefill).

        A host loop dispatches one jit per group: span(g layers) ->
        compress(group) — the group's dense K/V is DONATED to the
        compressor, so its buffers free as soon as the factors exist.
        Numerics match the monolithic path exactly (same `_prefill_layer`
        body, same `compress_svd_group`); parity pinned in
        tests/test_engine.py::test_staged_prefill_matches_monolithic.
        """
        from xkv_tpu.cache import init_tail
        from xkv_tpu.ops.rope import apply_rope

        cfg, xkv = self.cfg, self.xkv
        b, s = tokens.shape
        cos, sin = self._prefill_cos_sin(s)
        if not hasattr(self, "_staged"):
            from xkv_tpu.models import llama as _llama

            def span_fn(layers, h, cos, sin):
                return _llama.prefill_layer_span(
                    layers, cfg, h, cos, sin,
                    attention_impl=self.attention_impl,
                )

            def final_fn(params, h):
                h_last = jax.lax.dynamic_slice_in_dim(
                    h, h.shape[1] - 1, 1, axis=1
                )
                return _llama.unembed(params, cfg, h_last)

            cd = self.cache_dtype
            self._staged = {
                "embed": jax.jit(lambda emb, t: emb[t]),
                # spans keyed by length; compress keyed by group shape
                "span": {},
                "span_fn": span_fn,
                "final": jax.jit(final_fn),
                "dense": jax.jit(
                    lambda k, v, cos, sin: (
                        apply_rope(k, cos[None], sin[None]).astype(cd),
                        v.astype(cd),
                    )
                ),
                "compress": {},
            }

        def span_jit(n):
            if n not in self._staged["span"]:
                # donate h + the layer weights? weights must persist — only
                # h is transient, but it is also the output; leave donation
                # off (h is ~b*s*d*2B, small next to the group K/V).
                self._staged["span"][n] = jax.jit(self._staged["span_fn"])
            return self._staged["span"][n]

        h = self._staged["embed"](self.params["embed"], tokens)
        group_of = {grp.layers[0]: grp for grp in xkv.layer_groups}
        covered = {l for grp in xkv.layer_groups for l in grp.layers}
        groups = []
        dense_k, dense_v = {}, {}
        li = 0
        while li < cfg.num_layers:
            grp = group_of.get(li)
            if grp is not None:
                layer_ps = [self.params["layers"][l] for l in grp.layers]
                h, kvs = span_jit(len(layer_ps))(layer_ps, h, cos, sin)
                ks = [k for k, _ in kvs]
                vs = [v for _, v in kvs]
                gf, dk, dv = self._compress_group_jit(grp)(ks, vs, cos, sin)
                groups.append(gf)
                for loc, dst in dk.items():
                    dense_k[grp.layers[loc]] = dst
                for loc, dst in dv.items():
                    dense_v[grp.layers[loc]] = dst
                del kvs, ks, vs
                li += len(grp.layers)
            else:
                if li in covered:
                    raise ValueError(
                        f"layer {li} is grouped but not at a group start — "
                        "staged_prefill needs contiguous groups"
                    )
                layer_ps = [self.params["layers"][li]]
                h, kvs = span_jit(1)(layer_ps, h, cos, sin)
                dense_k[li], dense_v[li] = self._staged["dense"](
                    kvs[0][0], kvs[0][1], cos, sin
                )
                del kvs
                li += 1
        logits = self._staged["final"](self.params, h)
        tail_k, tail_v = init_tail(cfg, b, self.tail_max, self.cache_dtype)
        cache = XKVCache(
            groups=tuple(groups),
            dense_k=dense_k,
            dense_v=dense_v,
            tail_k=tail_k,
            tail_v=tail_v,
            tail_len=jnp.zeros((), jnp.int32),
        )
        return logits, cache

    def _refactorize_impl(self, cache):
        from xkv_tpu.engine.compression import refactorize_cache

        return refactorize_cache(
            cache, self.xkv, self.cfg,
            factor_dtype=self.factor_dtype, cache_dtype=self.cache_dtype,
        )

    def refactorize(self, cache):
        """Fold a full decode tail into the factors (tail_len must equal
        tail_max); returns a cache with an empty tail and prefill_len
        extended by tail_max."""
        if self.mode != "factored" or self.xkv is None:
            raise ValueError("refactorize requires mode='factored'")
        return self._refactorize_fn(cache)

    def _decode_impl(self, cache, params, tokens, pos, cos_sin):
        return self._model.decode_step(
            params, self.cfg, self.xkv, cache, tokens, pos, cos_sin,
            attention_impl=self.attention_impl, mesh=self.mesh,
            **self._sparse_kw,
        )

    def _generate_impl(self, cache, params, first_token, start_pos, cos_sin,
                       n_steps: int):
        # Only the mutable tail goes through the scan carry; the frozen
        # factors / dense prefill segments are closed over, so XLA treats
        # them as loop invariants instead of copying them every step.
        def body(carry, _):
            tail_k, tail_v, tail_len, token, pos = carry
            step_cache = cache.replace(
                tail_k=tail_k, tail_v=tail_v, tail_len=tail_len
            )
            logits, step_cache = self._model.decode_step(
                params, self.cfg, self.xkv, step_cache, token[:, None], pos, cos_sin,
                attention_impl=self.attention_impl, mesh=self.mesh,
                **self._sparse_kw,
            )
            next_tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            carry = (
                step_cache.tail_k,
                step_cache.tail_v,
                step_cache.tail_len,
                next_tok,
                pos + 1,
            )
            return carry, next_tok

        init = (cache.tail_k, cache.tail_v, cache.tail_len, first_token, start_pos)
        (tail_k, tail_v, tail_len, _, _), toks = jax.lax.scan(
            body, init, None, length=n_steps
        )
        cache = cache.replace(tail_k=tail_k, tail_v=tail_v, tail_len=tail_len)
        return jnp.transpose(toks, (1, 0)), cache  # (b, n_steps)

    def _spec_round_impl(self, cache, params, tok, pos, cos_sin, k: int):
        """One speculative round: draft ``k`` tokens with the cheap sparse
        path, verify all of them with ONE exact multi-token decode pass,
        accept the longest matching prefix (greedy => output is bit-exact
        to plain exact decoding).

        The verify pass re-appends exact K/V over the draft's tail rows
        (the draft's rows are sparse-flavored: earlier layers' approximate
        attention leaks into later layers' K/V), so the cache state after a
        round is identical to having decoded the accepted tokens exactly.

        Returns (exact_tokens (b, k+1), n_accepted (b,), next_tok (b,),
        cache). Caller advances pos by n_accepted and slices outputs.
        """
        t0 = cache.tail_len

        def body(carry, _):
            tail_k, tail_v, tail_len, token, p = carry
            step_cache = cache.replace(
                tail_k=tail_k, tail_v=tail_v, tail_len=tail_len
            )
            logits, step_cache = self._model.decode_step(
                params, self.cfg, self.xkv, step_cache, token[:, None], p,
                cos_sin, attention_impl=self.attention_impl, mesh=self.mesh,
                **self._draft_kw,
            )
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            carry = (
                step_cache.tail_k, step_cache.tail_v, step_cache.tail_len,
                nxt, p + 1,
            )
            return carry, nxt

        init = (cache.tail_k, cache.tail_v, cache.tail_len, tok, pos)
        (tail_k, tail_v, _, _, _), drafts = jax.lax.scan(
            body, init, None, length=k
        )
        drafts = jnp.transpose(drafts, (1, 0))  # (b, k)

        # Verify: exact multi-token pass from the pre-draft tail length —
        # append_tail overwrites rows [t0, t0+k+1) with exact K/V.
        vcache = cache.replace(tail_k=tail_k, tail_v=tail_v, tail_len=t0)
        inputs = jnp.concatenate([tok[:, None], drafts], axis=1)  # (b, k+1)
        logits, vcache = self._model.decode_step(
            params, self.cfg, self.xkv, vcache, inputs, pos, cos_sin,
            attention_impl=self.attention_impl, mesh=self.mesh,
        )
        exact = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (b, k+1)
        matches = drafts == exact[:, :k]
        n_acc = jnp.sum(jnp.cumprod(matches.astype(jnp.int32), axis=1), axis=1)
        n_out = n_acc + 1  # accepted drafts + the exact correction/bonus
        b = tok.shape[0]
        next_tok = exact[jnp.arange(b), n_acc]
        # Valid tail rows = the inputs that are real history: tok + accepted
        # drafts. (b == 1 for the speculative path, so n_out[0] is THE len.)
        out_cache = vcache.replace(tail_len=t0 + n_out[0])
        return exact, n_out, next_tok, out_cache

    def _score_impl(self, cache, params, tokens, start_pos, cos_sin):
        """Teacher-forced scoring: feed tokens[:, i] one at a time, return
        log-prob of each tokens[:, i+1] (perplexity RNN mode, reference
        `eval_perplexity_rnn.py:90-125`)."""

        def body(carry, token):
            tail_k, tail_v, tail_len, pos = carry
            step_cache = cache.replace(
                tail_k=tail_k, tail_v=tail_v, tail_len=tail_len
            )
            logits, step_cache = self._model.decode_step(
                params, self.cfg, self.xkv, step_cache, token[:, None], pos, cos_sin,
                attention_impl=self.attention_impl, mesh=self.mesh,
                **self._sparse_kw,
            )
            logprobs = jax.nn.log_softmax(logits[:, -1, :], axis=-1)
            carry = (
                step_cache.tail_k, step_cache.tail_v, step_cache.tail_len, pos + 1
            )
            return carry, logprobs

        tokens_t = jnp.transpose(tokens, (1, 0))  # (steps, b)
        init = (cache.tail_k, cache.tail_v, cache.tail_len, start_pos)
        (tail_k, tail_v, tail_len, _), logprobs = jax.lax.scan(body, init, tokens_t)
        cache = cache.replace(tail_k=tail_k, tail_v=tail_v, tail_len=tail_len)
        return jnp.transpose(logprobs, (1, 0, 2)), cache  # (b, steps, vocab)

    # ------------------------------------------------------------ public API
    def prefill(self, tokens) -> Tuple[jax.Array, XKVCache]:
        """tokens: (b, s) -> (logits (b, s, V) fp32, cache)."""
        tokens = jnp.asarray(tokens, jnp.int32)
        if self.staged_prefill:
            return self._prefill_staged(tokens)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from xkv_tpu.parallel.sharding import token_pspec

            spec = (
                P(None, "data") if self.sequence_parallel  # seq on data
                else token_pspec()                         # batch on data
            )
            tokens = jax.device_put(tokens, NamedSharding(self.mesh, spec))
        return self._prefill_fn(self.params, tokens)

    def decode_step(self, cache, tokens, pos):
        cos_sin = self._prefill_cos_sin(cache.prefill_len)
        return self._decode_fn(
            cache, self.params, jnp.asarray(tokens, jnp.int32), pos, cos_sin
        )

    def generate(
        self,
        tokens,
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
    ) -> jax.Array:
        """Greedy generation (the reference evaluates with do_sample=False,
        `evaluate/evaluator.py:63`). Returns (b, <=max_new_tokens) including
        nothing past the first EOS (host-side truncation)."""
        tokens = jnp.asarray(tokens, jnp.int32)
        can_refactor = self.mode == "factored" and self.xkv is not None
        if max_new_tokens > self.tail_max and not can_refactor:
            raise ValueError(
                f"max_new_tokens={max_new_tokens} exceeds tail_max={self.tail_max}"
            )
        logits, cache = self.prefill(tokens)
        first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        start_pos = jnp.asarray(tokens.shape[1], jnp.int32)
        if max_new_tokens == 1:
            return first[:, None]
        pieces = [first[:, None]]
        tok = first
        pos = start_pos
        remaining = max_new_tokens - 1
        while remaining > 0:
            # Segment the loop at tail capacity; a full tail is folded back
            # into the factors (periodic refactorization).
            n = min(remaining, self.tail_max)
            cos_sin = self._prefill_cos_sin(cache.prefill_len)
            rest, cache = self._generate_fn(
                cache, self.params, tok, pos, cos_sin, n_steps=n
            )
            pieces.append(rest)
            tok = rest[:, -1]
            pos = pos + n
            remaining -= n
            if remaining > 0:
                cache = self.refactorize(cache)
        out = jnp.concatenate(pieces, axis=1)
        if eos_token_id is not None:
            out_np = jax.device_get(out)
            import numpy as np

            trimmed = []
            for row in out_np:
                hits = np.where(row == eos_token_id)[0]
                trimmed.append(row[: hits[0] + 1] if len(hits) else row)
            return trimmed
        return out

    def score(self, cache, tokens, start_pos):
        """Teacher-forced next-token log-probs; see `_score_impl`."""
        cos_sin = self._prefill_cos_sin(cache.prefill_len)
        return self._score_fn(
            cache, self.params, jnp.asarray(tokens, jnp.int32), start_pos, cos_sin
        )

    def generate_speculative(
        self,
        tokens,
        max_new_tokens: int,
        draft_k: int = 7,
        eos_token_id: Optional[int] = None,
        return_stats: bool = False,
    ):
        """Greedy generation via sparse-draft / exact-verify speculation.

        Output is BIT-IDENTICAL to exact greedy decoding (``sparse_topk``
        affects only the drafts; every emitted token comes from an exact
        verify pass), at up to ~(draft_k+1) tokens per exact-attention
        round when the sparse path agrees with the exact one. Requires the
        engine to be constructed with ``sparse_topk`` (the draft path),
        mode='factored', batch 1.
        """
        if self.sparse_topk is None and self.draft_rank is None:
            raise ValueError("generate_speculative requires sparse_topk "
                             "(llama) or draft_rank (MLA) — the draft path")
        if self.cfg.sliding_window is not None:
            # Early guard (ADVICE r3 #3): the multi-token verify pass does
            # not support a sliding window (per-row window bounds), so fail
            # here instead of with a traced ValueError inside decode_step.
            raise ValueError(
                "speculative decoding does not compose with sliding_window "
                "(the multi-token verify pass has no per-row window bound)"
            )
        tokens = jnp.asarray(tokens, jnp.int32)
        if tokens.shape[0] != 1:
            raise ValueError("speculative decoding is batch-1 "
                             "(per-sequence acceptance lengths)")
        if draft_k + 1 > self.tail_max:
            raise ValueError(f"draft_k={draft_k} needs tail_max > draft_k")
        logits, cache = self.prefill(tokens)
        first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        out = [int(first[0])]
        tok = first
        pos = jnp.asarray(tokens.shape[1], jnp.int32)
        if draft_k not in self._spec_jit:
            self._spec_jit[draft_k] = jax.jit(
                lambda c, p, t, po, cs: self._spec_round_impl(
                    c, p, t, po, cs, draft_k
                )
            )
        spec_fn = self._spec_jit[draft_k]
        stats = {"rounds": 0, "round_tokens": 0, "plain_steps": 0}
        while len(out) < max_new_tokens:
            if eos_token_id is not None and out[-1] == eos_token_id:
                break
            capacity = self.tail_max - int(jax.device_get(cache.tail_len))
            if capacity < draft_k + 1:
                # Top the tail up to exactly full with plain exact steps
                # (they emit tokens too), then fold it into the factors.
                if capacity > 0:
                    cos_sin = self._prefill_cos_sin(cache.prefill_len)
                    toks, cache = self._generate_fn(
                        cache, self.params, tok, pos, cos_sin,
                        n_steps=capacity,
                    )
                    out.extend(int(x) for x in jax.device_get(toks[0]))
                    tok = toks[:, -1]
                    pos = pos + capacity
                    stats["plain_steps"] += capacity
                cache = self.refactorize(cache)
                continue
            exact, n_out, tok, cache = spec_fn(
                cache, self.params, tok, pos, self._prefill_cos_sin(
                    cache.prefill_len
                )
            )
            n = int(jax.device_get(n_out[0]))
            out.extend(int(x) for x in jax.device_get(exact[0])[:n])
            pos = pos + n
            stats["rounds"] += 1
            stats["round_tokens"] += n
        out = out[:max_new_tokens]
        if eos_token_id is not None and eos_token_id in out:
            out = out[: out.index(eos_token_id) + 1]
        import numpy as np

        result = np.asarray(out, np.int32)[None, :]
        if return_stats:
            stats["tokens_per_round"] = (
                stats["round_tokens"] / stats["rounds"] if stats["rounds"] else 0.0
            )
            return result, stats
        return result
