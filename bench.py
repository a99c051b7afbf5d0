"""Benchmark: serving decode throughput with the xKV factored cache.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup of factored-cache serving throughput over the
uncompressed-cache baseline on the same chip (the reference never measured
decode throughput — efficiency eval is an unreleased roadmap item, reference
README.md:139-141 — so the baseline is the uncompressed cache, per
BASELINE.md's north star: >= 2x decode tokens/s).

Methodology (north-star metric is tokens/s **per chip**): each mode runs at
its own best batch size that fits HBM — that is the serving value of an
8-16x smaller cache. The dense baseline tops out where its KV cache fills
the chip; the factored cache keeps admitting sequences. Both modes prefill
ONE sequence and tile the compressed/dense cache across slots (decode cost
is content-independent), then time steady-state batched decode steps.
``--matched`` instead compares both modes at the same batch (kernel-level
comparison; the capacity advantage is excluded).

Model geometry: Llama-3.1-8B per-layer shape (hidden 4096, 32 q heads,
8 KV heads, head_dim 128) truncated to fit one chip; xKV-4 ranks
rank_k=512 / rank_v=768 (8x KV compression, reference README.md:87-88;
int8 factors double that).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def build(cfg_kind: str, ctx: int, layers: int, tail: int,
          rope_mode: str = "post"):
    from xkv_tpu.configs import generate_consecutive_xkv_config
    from xkv_tpu.models.config import ModelConfig

    if cfg_kind == "mla":
        # DeepSeek-V2-Lite attention geometry (hidden 2048, 16 heads,
        # kv_lora_rank 512, rope 64 / nope 128 / v 128), truncated to
        # ``layers`` and with a dense FFN in place of Lite's MoE — the
        # measurement targets the MLA cache path (reference
        # deepseek_v2.py:186-227), not expert routing. merge_k only over
        # the latent (merge_v is rejected for MLA, reference :222-223):
        # group=4 @ rank 512 -> 4x latent compression (~3.5x incl. k_pe,
        # the reference's "3x on MLA" headline regime, README.md:121-136).
        from xkv_tpu.models.deepseek import init_params

        cfg = ModelConfig(
            vocab_size=32000,
            hidden_size=2048,
            intermediate_size=8192,
            num_layers=layers,
            num_q_heads=16,
            num_kv_heads=16,
            head_dim=128,
            rope_theta=10000.0,
            model_type="deepseek_v2",
            q_lora_rank=None,
            kv_lora_rank=512,
            qk_rope_head_dim=64,
            qk_nope_head_dim=128,
            v_head_dim=128,
        )
        xkv = generate_consecutive_xkv_config(
            num_layers=cfg.num_layers, end_layer=-1, group_size=4,
            rank_k=512, rank_v=None, merge_value=False,
        )
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        prompt = jax.random.randint(
            jax.random.PRNGKey(1), (1, ctx), 0, cfg.vocab_size
        )
        return cfg, xkv, params, prompt

    from xkv_tpu.models.llama import init_params

    if cfg_kind == "8b":
        cfg = ModelConfig(
            vocab_size=32000,
            hidden_size=4096,
            intermediate_size=14336,
            num_layers=layers,
            num_q_heads=32,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=500000.0,
        )
        rank_k, rank_v, group = 512, 768, 4
    else:  # quick
        cfg = ModelConfig(
            vocab_size=2048,
            hidden_size=512,
            intermediate_size=1024,
            num_layers=4,
            num_q_heads=8,
            num_kv_heads=4,
            head_dim=64,
            rope_theta=10000.0,
        )
        rank_k, rank_v, group = 64, 96, 4

    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=-1, group_size=group,
        rank_k=rank_k, rank_v=rank_v,
        extra_kwargs={"rope_mode": rope_mode},
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, ctx), 0, cfg.vocab_size)
    return cfg, xkv, params, prompt


def prep_cache(eng, prompt, batch: int):
    """Prefill once and tile the cache across ``batch`` decode slots."""
    logits, cache = eng.prefill(prompt)
    jax.block_until_ready(logits)
    first1 = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)  # (1,)
    if batch > 1:
        cache = cache.tile_batch(batch)
    jax.block_until_ready(cache)
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    return cache, first1, pos


def measure_decode(eng, prompt, batch: int, steps: int,
                   prepped=None) -> float:
    """Steady-state decode tokens/s via paired-length measurement.

    Two quirks of this TPU tunnel demand care: (1) identical
    (executable, args) executions are memoized, so every timed call uses a
    distinct first token from its warmup; (2) each call carries a large
    fixed dispatch overhead, so we time n-step and 2n-step runs and use the
    difference — fixed overhead cancels, leaving pure per-step time.
    """
    cache, first1, pos = prepped or prep_cache(eng, prompt, batch)
    # Distinct token per slot AND per timed run (tunnel memoization).
    first = (first1[0] + jnp.arange(batch, dtype=jnp.int32)) % eng.cfg.vocab_size
    vocab = eng.cfg.vocab_size

    cos_sin = eng._prefill_cos_sin(cache.prefill_len)

    # Return ONLY the tokens from the jit: without donation, returning the
    # cache would copy the multi-GB dense segments input->output every call
    # (OOM at the dense baseline's max batch).
    def make_fn(n):
        def fn(c, params, tok, p, cs):
            toks, _ = eng._generate_impl(c, params, tok, p, cs, n_steps=n)
            return toks

        return jax.jit(fn)

    fn_1, fn_2 = make_fn(steps), make_fn(2 * steps)

    def run(fn, tok_offset: int) -> float:
        tok = (first + tok_offset) % vocab
        t0 = time.perf_counter()
        toks = fn(cache, eng.params, tok, pos, cos_sin)
        # device_get, not block_until_ready: over the axon tunnel only a
        # real transfer waits for remote execution to finish.
        jax.device_get(toks)
        return time.perf_counter() - t0

    run(fn_1, 1)  # compile n
    run(fn_2, 2)  # compile 2n
    t1 = min(run(fn_1, 3), run(fn_1, 5))
    t2 = min(run(fn_2, 4), run(fn_2, 6))
    per_step = max((t2 - t1) / steps, 1e-9)
    return batch / per_step


def step_cost(cfg, xkv, cache, params, batch: int, rope_mode: str = "post",
              sparse_rows: int = 0, sparse_layers=None):
    """Roofline accounting for ONE batched decode step:
    (bytes_moved, flops, flops_int8).

    Bytes: every cache leaf is streamed from HBM once per step per consumer
    — a group's ``*_us`` factor panels are read by each of the group's
    layers (they are GBs, far beyond VMEM residency), the shared ``*_vt``
    bases once per group (each layer takes a disjoint column slice), dense
    segments and tails once, and the weights once (batch-independent).
    FLOPs: 2*B*(matmul params) for the dense stack + the attention terms of
    whichever cache path each layer runs. Both are analytic estimates (no
    XLA fusion/padding modeled) — good to a few percent, enough to anchor
    tokens/s to the hardware roofline.

    ``rope_mode``: "post" counts the rank-space decode (2*B*hq*S*(rk+rv)
    dominant); "pre" counts the reconstruction algorithm of
    ops/pallas/lowrank_attention.py — per layer a 2*B*S*rk*m K
    reconstruction GEMM (int8-eligible), a 2*B*hq*S*2m two-trig-field
    score GEMM, and the 2*B*hq*S*rv rank-space value path.
    ``sparse_rows``: with Quest top-k selection, only ~sparse_rows of the
    S factored rows stream per step per layer (us panels and attention
    FLOPs scale down; vt bases and the Quest bounds still read in full).
    ``sparse_layers``: per-layer sparse/dense mix — only the listed layer
    indices take the sparse_rows reduction; the rest stream/attend in full
    (the accuracy-correct configuration, docs/RULER_OFFLINE.md).
    ``flops_int8``: the subset of ``flops`` running on the MXU's 2x-rate
    int8 path (the pre-RoPE us@vt reconstruction GEMM with int8 factors) —
    callers use it for a dtype-correct MFU denominator (VERDICT r4 #4:
    counting it at the bf16 peak reported mfu_pre = 1.21 > 1).
    """
    def nbytes(a):
        if a is None:
            return 0
        if not hasattr(a, "dtype"):  # SlerpCompact: sum its array leaves
            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(a))
        return a.size * a.dtype.itemsize

    bytes_moved = 0
    # weights, once per step
    w_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    bytes_moved += w_bytes
    # matmul flops ~ 2*B*(params minus embedding); +unembed if tied
    p_embed = params["embed"].size
    n_mat = sum(x.size for x in jax.tree.leaves(params)) - p_embed
    if getattr(cfg, "tie_word_embeddings", True) and "lm_head" not in params:
        n_mat += p_embed  # tied unembed still does the (hidden, vocab) GEMM
    flops = 2.0 * batch * n_mat

    flops_i8 = 0.0
    groups = list(getattr(cache, "groups", ()) or ())
    grp_layers = [list(g.layers) for g in xkv.layer_groups] if xkv else []
    hq = cfg.num_q_heads
    hd = cfg.head_dim
    m_layer = cfg.num_kv_heads * hd
    for gf, g_lyrs in zip(groups, grp_layers):
        g = len(g_lyrs)
        S = gf.k_us.shape[1] if gf.k_us is not None else (
            gf.v_us.shape[1] if gf.v_us is not None else 0)
        frac = min(1.0, sparse_rows / S) if sparse_rows and S else 1.0
        # per-layer sparse/dense mix: layers outside sparse_layers read in
        # full (frac 1.0) even when sparse_rows is set
        if sparse_rows and sparse_layers is not None:
            n_sp = sum(1 for l in g_lyrs if l in sparse_layers)
        else:
            n_sp = g if sparse_rows else 0
        # effective us-panel re-reads across the group's layers
        eff_reads = n_sp * frac + (g - n_sp) * 1.0
        for name in ("k_us", "v_us", "k_us4", "v_us4"):
            bytes_moved += eff_reads * nbytes(getattr(gf, name, None))
        for name in ("k_vt", "v_vt", "k_vt4", "k_scale", "v_scale",
                     "k_scale4", "k_rnorm", "k_cmin", "k_cmax",
                     "slerp_k", "slerp_v"):
            bytes_moved += nbytes(getattr(gf, name, None))
        r_k = gf.k_us.shape[-1] if gf.k_us is not None else 0
        int8_k = gf.k_us is not None and gf.k_us.dtype == jnp.int8
        if gf.k_us4 is not None:
            r_k += 2 * gf.k_us4.shape[-1]
        r_v = gf.v_us.shape[-1] if gf.v_us is not None else 0
        if gf.v_us4 is not None:
            r_v += 2 * gf.v_us4.shape[-1]
        # attention rows per layer: sparse layers see S*frac, exact see S
        S_rows = n_sp * (frac * S) + (g - n_sp) * S
        if rope_mode == "pre":
            # reconstruction kernel: K recon GEMM + 2-field score GEMM +
            # rank-space value path (module docstring of
            # ops/pallas/lowrank_attention.py)
            recon = 2.0 * batch * S_rows * r_k * m_layer
            flops += (
                recon                                # us @ vt reconstruction
                + 2.0 * batch * hq * S_rows * 2 * m_layer  # [qa|qb] @ trig
                + 2.0 * batch * hq * S_rows * r_v    # P @ v_us
                + g * 2.0 * batch * hd * (r_k + r_v)  # query embeds / proj
            )
            if int8_k:
                flops_i8 += recon  # int8 x int8 -> int32 MXU path (2x rate)
        else:
            # rank-space decode: q fold (hd*r) + scores/values over S rows
            flops += 2.0 * batch * hq * (
                S_rows * (r_k + r_v) + g * hd * (r_k + r_v)
            )
    for seg in (getattr(cache, "dense_k", {}) or {},
                getattr(cache, "dense_v", {}) or {}):
        for arr in seg.values():
            bytes_moved += nbytes(arr)
            # (B, hkv, S, hd) dense attention over this segment
            S = arr.shape[2]
            flops += 2.0 * batch * hq * S * cfg.head_dim
    for t in (cache.tail_k, cache.tail_v):
        bytes_moved += nbytes(t)
        flops += 2.0 * batch * hq * t.shape[-2] * cfg.head_dim * cfg.num_layers
    return bytes_moved, flops, flops_i8


# Nominal single-chip peaks for the roofline fields (TPU v5e: 819 GB/s HBM,
# 197 bf16 TFLOP/s — jax-ml.github.io/scaling-book numbers). Override via
# --peak-hbm-gbps / --peak-tflops when benching other hardware.
PEAK_HBM_GBPS = 819.0
PEAK_TFLOPS = 197.0


def measure_verify(eng, cache, first1, pos, batch: int, ql: int,
                   steps: int) -> float:
    """Exact multi-token verify throughput (positions/s): the speculative
    ceiling. Each step runs ONE exact decode pass over ql positions per
    slot — the ql*hq query rows share one factor reconstruction and fill
    MXU row tiles a single decode token cannot (docs/DESIGN.md). Paired
    n/2n timing like measure_decode."""
    vocab = eng.cfg.vocab_size
    cos_sin = eng._prefill_cos_sin(cache.prefill_len)

    def make_fn(n):
        def fn(c, params, tb, p, cs):
            def body(carry, _):
                tk, tv, tl, blk, pp = carry
                sc = c.replace(tail_k=tk, tail_v=tv, tail_len=tl)
                lg, sc = eng._model.decode_step(
                    params, eng.cfg, eng.xkv, sc, blk, pp, cs,
                    attention_impl=eng.attention_impl)
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32) % vocab
                return (sc.tail_k, sc.tail_v, sc.tail_len, nxt, pp + ql), nxt[:, 0]

            init = (c.tail_k, c.tail_v, c.tail_len, tb, p)
            _, toks = jax.lax.scan(body, init, None, length=n)
            return toks

        return jax.jit(fn)

    fn1, fn2 = make_fn(steps), make_fn(2 * steps)
    base = (first1[0] + jnp.arange(batch * ql, dtype=jnp.int32)).reshape(
        batch, ql)

    def run(fn, off):
        tb = (base + off) % vocab
        t0 = time.perf_counter()
        jax.device_get(fn(cache, eng.params, tb, pos, cos_sin))
        return time.perf_counter() - t0

    run(fn1, 1)
    run(fn2, 2)
    t1 = min(run(fn1, 3), run(fn1, 5))
    t2 = min(run(fn2, 4), run(fn2, 6))
    per_step = max((t2 - t1) / steps, 1e-9)
    return batch * ql / per_step


def measure_prefill(eng, ctx: int, vocab: int) -> float:
    """Wall seconds for one ctx-token prefill (+ SVD compression when the
    engine is factored). Single-shot with a distinct prompt after a warmup
    (tunnel memoization, bench module docstring) — includes the fixed
    dispatch overhead, so treat as TTFT-ish, not pure device time."""
    p1 = jax.random.randint(jax.random.PRNGKey(7), (1, ctx), 0, vocab)
    p2 = jax.random.randint(jax.random.PRNGKey(8), (1, ctx), 0, vocab)
    jax.device_get(eng.prefill(p1)[0])  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(eng.prefill(p2)[0])
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny model smoke run")
    ap.add_argument("--ctx", type=int, default=None)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--matched", action="store_true",
                    help="same batch for both modes (kernel comparison) "
                    "instead of best-batch-per-mode serving throughput")
    ap.add_argument("--batch", type=int, default=None,
                    help="batch for --matched mode (default 1)")
    ap.add_argument("--batch-factored", type=int, default=None,
                    help="serving batch for the factored cache")
    ap.add_argument("--batch-dense", type=int, default=None,
                    help="serving batch for the dense baseline (its max "
                    "fitting batch at this ctx)")
    ap.add_argument("--only", default=None, choices=["factored", "none"],
                    help="measure one mode and print its tokens/s (sweeps)")
    ap.add_argument("--attention-impl", default=None, choices=["xla", "pallas"])
    ap.add_argument("--factor-dtype", default="int8",
                    choices=["bf16", "int8", "int4"],
                    help="low-rank factor storage (int8 = quantized cache)")
    ap.add_argument("--sparse", type=int, default=None,
                    help="sparse top-k decode: attend to N prefill chunks")
    ap.add_argument("--sparse-block", type=int, default=1024)
    ap.add_argument("--no-sparse-extra", action="store_true",
                    help="skip the supplementary sparse-decode measurement "
                    "in the default headline run")
    ap.add_argument("--mla", action="store_true",
                    help="DeepSeek-V2 MLA geometry: factored-latent vs "
                    "dense-latent decode (merge_k only; prints its own "
                    "JSON line, separate from the default llama headline)")
    ap.add_argument("--rope-mode", default="post", choices=["pre", "post"],
                    help="factored-key domain: 'post' (rank-space decode, "
                    "the TPU-native flagship — docs/ROPE_MODES.md) or 'pre' "
                    "(reference pre-RoPE semantics, reconstruction kernel)")
    ap.add_argument("--no-pre-extra", action="store_true",
                    help="skip the supplementary reference-semantics "
                    "(rope=pre) measurement in the default headline run")
    ap.add_argument("--no-depth-sweep", action="store_true",
                    help="skip the supplementary depth-scaling sweep "
                    "(4/16-layer points) in the default headline run")
    ap.add_argument("--no-mla-extra", action="store_true",
                    help="skip the supplementary MLA (DeepSeek-V2) serving "
                    "measurement in the default headline run")
    ap.add_argument("--peak-hbm-gbps", type=float, default=PEAK_HBM_GBPS,
                    help="nominal HBM bandwidth for the hbm_util field")
    ap.add_argument("--peak-tflops", type=float, default=PEAK_TFLOPS,
                    help="nominal bf16 TFLOP/s for the mfu field")
    ap.add_argument("--verify-ql", type=int, default=8,
                    help="positions per exact multi-token verify step in "
                    "the supplementary speculative-ceiling measurement "
                    "(0 disables)")
    args = ap.parse_args()

    from xkv_tpu.engine import InferenceEngine

    if args.quick and args.mla:
        ap.error("--quick and --mla are mutually exclusive (ADVICE r1)")
    kind = "quick" if args.quick else ("mla" if args.mla else "8b")
    # Default = the north-star context (BASELINE.md: 64K, 8x compression).
    ctx = args.ctx or (1024 if args.quick else 65536)
    steps = 8 if args.quick else args.steps
    vsteps = 4  # chained verify steps in the speculative-ceiling extra
    want_verify = args.verify_ql > 0 and not (args.quick or args.matched
                                              or args.only or args.mla)
    # One tail serves both measurements: steps single-token rows or
    # vsteps verify blocks of verify_ql rows (a few extra masked tail rows
    # are noise next to the 64K factored segment).
    tail = max(steps, vsteps * args.verify_ql if want_verify else 0) + 8

    if args.mla:
        # Round 2: MLA decode has a fused rank-space kernel
        # (mla_rankspace_decode_attention); prefill still runs the
        # blockwise XLA path (engine handles the split internally).
        attention_impl = (
            args.attention_impl
            or ("pallas" if jax.default_backend() == "tpu" else "xla")
        )
    elif args.attention_impl is None:
        attention_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    else:
        attention_impl = args.attention_impl

    # Serving defaults (v5e 16 GB, 8-layer 8B geometry): the dense cache
    # (2.1 GB/seq @64K) + weights tops out at batch 4; the int8 factored
    # cache (~0.17 GB/seq) runs batch 48 (~12 GB with weights). Both scale
    # inversely with context. Decode is compute-bound on factor
    # reconstruction past ~batch 16, so the extra slots buy only a few
    # percent — but they are real serving capacity.
    if args.quick:
        b_fact = args.batch_factored or 8
        b_dense = args.batch_dense or 8
    elif args.mla:
        # MLA latent cache is compact even uncompressed (576 elems/token
        # vs 2048 for GQA): dense tops out ~batch 16 @64K on 16 GB; the
        # ~3x factored cache runs 48.
        b_fact = args.batch_factored or max(8, 96 * 32768 // ctx)
        b_dense = args.batch_dense or max(1, 32 * 32768 // ctx)
    else:
        b_fact = args.batch_factored or max(8, 96 * 32768 // ctx)
        b_dense = args.batch_dense or max(1, 8 * 32768 // ctx)
    if args.matched:
        b_fact = b_dense = args.batch or 1

    # Supplementary: MLA (DeepSeek-V2) serving measured FIRST, on an
    # empty chip (VERDICT r4 #5): the 64K MLA caches did not fit after
    # ~10 llama modes' programs/buffers even with cache clearing (the
    # remote allocator does not defragment) — running it before anything
    # else allocates is the robust order. Fields merge into the record
    # after the headline is measured.
    mla_fields = {}
    if not (args.quick or args.matched or args.only or args.mla
            or args.no_mla_extra):
        try:
            mcfg, mxkv, mparams, mprompt = build(
                "mla", ctx, args.layers, tail
            )
            mla_impl = (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
            b_mf = max(8, 96 * 32768 // ctx)
            b_md = max(1, 32 * 32768 // ctx)
            eng_mf = InferenceEngine(
                mparams, mcfg, xkv=mxkv, mode="factored", tail_max=tail,
                attention_impl=mla_impl, donate_cache=False,
                factor_dtype=(args.factor_dtype if args.factor_dtype
                              in ("int8", "int4") else jnp.bfloat16),
                prefill_logits="last",
            )
            prepped_mf = prep_cache(eng_mf, mprompt, b_mf)
            cost_mf = step_cost(mcfg, mxkv, prepped_mf[0], mparams, b_mf)
            tps_mf = measure_decode(eng_mf, mprompt, b_mf, steps,
                                    prepped=prepped_mf)
            del eng_mf, prepped_mf
            eng_md = InferenceEngine(
                mparams, mcfg, mode="none", tail_max=tail,
                attention_impl=mla_impl, donate_cache=False,
                prefill_logits="last",
            )
            tps_md = measure_decode(eng_md, mprompt, b_md, steps)
            del eng_md, mparams, mprompt
            mla_fields["mla_tokens_per_s"] = round(tps_mf, 2)
            mla_fields["mla_dense_latent_tokens_per_s"] = round(tps_md, 2)
            mla_fields["mla_vs_baseline"] = round(tps_mf / tps_md, 3)
            mla_fields["mla_batch_vs_dense"] = [b_mf, b_md]
            mla_fields["mla_accuracy_gated"] = False
            steps_per_s = tps_mf / b_mf
            mla_fields["hbm_util_mla"] = round(
                cost_mf[0] * steps_per_s / (args.peak_hbm_gbps * 1e9), 3)
            f_i8 = cost_mf[2] if len(cost_mf) > 2 else 0.0
            mla_fields["mfu_mla"] = round(
                ((cost_mf[1] - f_i8) + f_i8 / 2.0) * steps_per_s
                / (args.peak_tflops * 1e12), 3)
            mla_fields["step_gb_mla"] = round(cost_mf[0] / 1e9, 3)
        except Exception as e:
            # never lose the headline record to a supplementary
            mla_fields["mla_error"] = (
                type(e).__name__ + ": " + str(e).splitlines()[0][:110]
                if str(e) else type(e).__name__
            )
        import gc

        gc.collect()
        jax.clear_caches()

    cfg, xkv, params, prompt = build(kind, ctx, args.layers, tail,
                                     rope_mode=args.rope_mode)

    factor_dtype = (args.factor_dtype if args.factor_dtype
                    in ("int8", "int4") else jnp.bfloat16)
    tps_fact = tps_none = tps_verify = None
    prefill_fact_s = prefill_none_s = None
    want_prefill = not (args.quick or args.matched)
    if args.only in (None, "factored"):
        eng_fact = InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype=factor_dtype, prefill_logits="last",
            sparse_topk=args.sparse, sparse_block=args.sparse_block,
        )
        prepped = prep_cache(eng_fact, prompt, b_fact)
        cost_fact = step_cost(cfg, xkv, prepped[0], params, b_fact)
        tps_fact = measure_decode(eng_fact, prompt, b_fact, steps,
                                  prepped=prepped)
        if want_verify:
            tps_verify = measure_verify(
                eng_fact, prepped[0], prepped[1], prepped[2], b_fact,
                args.verify_ql, vsteps,
            )
        del prepped
        if want_prefill and args.only is None:
            prefill_fact_s = measure_prefill(eng_fact, ctx, cfg.vocab_size)
        del eng_fact
    if args.only in (None, "none"):
        eng_none = InferenceEngine(
            params, cfg, mode="none", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            prefill_logits="last",
        )
        prepped_none = prep_cache(eng_none, prompt, b_dense)
        cost_none = step_cost(cfg, None, prepped_none[0], params, b_dense)
        tps_none = measure_decode(eng_none, prompt, b_dense, steps,
                                  prepped=prepped_none)
        del prepped_none
        if want_prefill and args.only is None:
            prefill_none_s = measure_prefill(eng_none, ctx, cfg.vocab_size)

    if args.only:
        tps = tps_fact if args.only == "factored" else tps_none
        b = b_fact if args.only == "factored" else b_dense
        print(json.dumps({"mode": args.only, "batch": b,
                          "tokens_per_s": round(tps, 2)}))
        return

    mode_desc = (
        f"matched batch {b_fact}" if args.matched
        else f"serving, batch {b_fact} vs dense max {b_dense}"
    )
    compress_desc = "~3x MLA latent compression" if kind == "mla" \
        else "8x KV compression"
    rope_desc = "" if kind == "mla" else f"rope={args.rope_mode}, "
    record = {
        "metric": f"decode tokens/s/chip @ {ctx} ctx, {compress_desc} "
        f"({kind} geometry, {cfg.num_layers} layers, {attention_impl}, "
        f"{args.factor_dtype} factors, {rope_desc}{mode_desc})",
        "value": round(tps_fact, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps_fact / tps_none, 3),
    }
    # Roofline anchoring (VERDICT r2 #8): per-step bytes/FLOPs from the
    # actual cache + params pytrees -> HBM utilization and MFU at the
    # measured step rate. steps/s = tokens/s / batch. Suppressed in --quick
    # (tiny-shape timings are dispatch-noise-dominated on this tunnel).
    def roofline_fields(tag, cost, tps, b):
        """Per-mode roofline (VERDICT r3 #8). MFU uses a dtype-correct
        denominator: FLOPs on the int8 MXU path (cost[2]) count at HALF
        the bf16-peak time (v5e: 394 vs 197 TOP/s), so mfu is a true <=1
        fraction of the compute roofline (VERDICT r4 #4 — the old
        bf16-only peak reported mfu_pre = 1.21)."""
        steps_per_s = tps / b
        bytes_m, flops = cost[0], cost[1]
        f_i8 = cost[2] if len(cost) > 2 else 0.0
        record[f"hbm_util_{tag}"] = round(
            bytes_m * steps_per_s / (args.peak_hbm_gbps * 1e9), 3)
        roofline_time_flops = (flops - f_i8) + f_i8 / 2.0
        record[f"mfu_{tag}"] = round(
            roofline_time_flops * steps_per_s / (args.peak_tflops * 1e12), 3)
        record[f"step_gb_{tag}"] = round(cost[0] / 1e9, 3)

    if not args.quick:
        roofline_fields("fact", cost_fact, tps_fact, b_fact)
        roofline_fields("dense", cost_none, tps_none, b_dense)
    record["peak_hbm_gbps"] = args.peak_hbm_gbps
    record["peak_tflops"] = args.peak_tflops
    if prefill_fact_s is not None:
        # Supplementary TTFT: prefill + SVD compression vs dense prefill.
        record["prefill_compress_s"] = round(prefill_fact_s, 3)
        record["prefill_dense_s"] = round(prefill_none_s, 3)
        # Compression adds (compress - dense) chip-seconds to TTFT; each
        # decoded token then costs (1/tps_dense - 1/tps_fact) fewer
        # chip-seconds at serving throughput. Payback = generated tokens
        # until the SVD overhead is repaid in chip time.
        delta = prefill_fact_s - prefill_none_s
        record["ttft_delta_s"] = round(delta, 3)
        gain = 1.0 / tps_none - 1.0 / tps_fact
        if gain > 0:
            record["ttft_payback_tokens"] = round(delta / gain, 1)
    if want_verify and tps_verify is not None:
        # Supplementary speculative ceiling: exact multi-token verify
        # positions/s (ql query rows share one factor reconstruction).
        # Speculative serving at acceptance a emits ~a*(ql-1)+1 exact
        # tokens per round; this is the a=1 bound of the verify side.
        record["verify_mt_positions_per_s"] = round(tps_verify, 2)
        record["verify_mt_vs_baseline"] = round(tps_verify / tps_none, 3)
        record["verify_ql"] = args.verify_ql
        # exact attention — greedy output is bit-identical to plain decode
        record["verify_mt_accuracy_gated"] = False
    # Supplementary: opt-in approximate sparse top-k decode at the same
    # batch (headline value/vs_baseline stay EXACT factored attention).
    sp_k = args.sparse or 8
    if not (args.quick or args.matched or args.no_sparse_extra or args.mla):
        eng_sp = InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype=factor_dtype, prefill_logits="last",
            sparse_topk=sp_k, sparse_block=args.sparse_block,
        )
        prepped_sp = prep_cache(eng_sp, prompt, b_fact)
        cost_sp = step_cost(
            cfg, xkv, prepped_sp[0], params, b_fact,
            rope_mode=args.rope_mode, sparse_rows=sp_k * args.sparse_block,
        )
        tps_sp = measure_decode(eng_sp, prompt, b_fact, steps,
                                prepped=prepped_sp)
        record["sparse_topk_tokens_per_s"] = round(tps_sp, 2)
        record["sparse_topk_vs_baseline"] = round(tps_sp / tps_none, 3)
        # ALL-layers sparse selection is known to lose retrieval accuracy
        # at layers whose Quest bounds are uninformative (measured on the
        # offline RULER suite, docs/RULER_OFFLINE.md:113-146) — this mode
        # needs per-deployment gating; the accuracy-correct configuration
        # is sparse_mixed below (VERDICT r4 #2).
        record["sparse_topk_accuracy_gated"] = True
        roofline_fields("sparse", cost_sp, tps_sp, b_fact)
        del eng_sp, prepped_sp
        # Supplementary: the ACCURACY-CORRECT sparse configuration —
        # per-layer sparse/dense mixing (`sparse_layers`) at sparse_topk=4.
        # The RULER study's fix: the retrieval layer reads the factored
        # cache EXACTLY while the rest stay sparse, restoring single-needle
        # retrieval to baseline. Here the deepest layer of each SVD group
        # reads exactly (the study's retrieval layer was its model's
        # deepest); probe per deployment with
        # `python -m xkv_tpu.cli.eval_acc --probe_sparse_layers`.
        mixed_k = 4
        mixed_layers = frozenset(
            l for l in range(cfg.num_layers) if (l + 1) % 4 != 0
        )
        eng_mx = InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype=factor_dtype, prefill_logits="last",
            sparse_topk=mixed_k, sparse_block=args.sparse_block,
            sparse_layers=mixed_layers,
        )
        prepped_mx = prep_cache(eng_mx, prompt, b_fact)
        cost_mx = step_cost(
            cfg, xkv, prepped_mx[0], params, b_fact,
            rope_mode=args.rope_mode,
            sparse_rows=mixed_k * args.sparse_block,
            sparse_layers=mixed_layers,
        )
        tps_mx = measure_decode(eng_mx, prompt, b_fact, steps,
                                prepped=prepped_mx)
        record["sparse_mixed_tokens_per_s"] = round(tps_mx, 2)
        record["sparse_mixed_vs_baseline"] = round(tps_mx / tps_none, 3)
        record["sparse_mixed_topk"] = mixed_k
        record["sparse_mixed_exact_layers"] = sorted(
            set(range(cfg.num_layers)) - mixed_layers
        )
        record["sparse_mixed_accuracy_gated"] = False
        roofline_fields("sparse_mixed", cost_mx, tps_mx, b_fact)
        del eng_mx, prepped_mx
    # Supplementary: mixed int8+int4 packed factors at the same batch
    # (docs/ROPE_MODES.md — accuracy-neutral at the operating compression
    # on the offline gate; ~26x total KV compression).
    if (args.rope_mode == "post" and args.factor_dtype == "int8"
            and not (args.quick or args.matched or args.only or args.mla)):
        eng_i4 = InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype="int4", prefill_logits="last",
        )
        prepped_i4 = prep_cache(eng_i4, prompt, b_fact)
        cost_i4 = step_cost(cfg, xkv, prepped_i4[0], params, b_fact)
        tps_i4 = measure_decode(eng_i4, prompt, b_fact, steps,
                                prepped=prepped_i4)
        record["int4_tokens_per_s"] = round(tps_i4, 2)
        record["int4_vs_baseline"] = round(tps_i4 / tps_none, 3)
        # accuracy-neutral at the operating compression on the offline
        # induction gate (docs/ROPE_MODES.md) — not approximate attention
        record["int4_accuracy_gated"] = False
        roofline_fields("int4", cost_i4, tps_i4, b_fact)
        del eng_i4, prepped_i4
    # Supplementary: the reference-semantics pre-RoPE scheme at the same
    # serving batch (reconstruction kernel), when the headline is post —
    # plus its sparse-gated composition (VERDICT r4 #1: Quest selection
    # gates the reconstruction GEMM, so only selected chunks reconstruct).
    if (args.rope_mode == "post" and not args.no_pre_extra
            and not (args.quick or args.matched or args.only or args.mla)):
        from xkv_tpu.configs import generate_consecutive_xkv_config

        xkv_pre = generate_consecutive_xkv_config(
            num_layers=cfg.num_layers, end_layer=-1, group_size=4,
            rank_k=512, rank_v=768, extra_kwargs={"rope_mode": "pre"},
        )
        eng_pre = InferenceEngine(
            params, cfg, xkv=xkv_pre, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype=factor_dtype, prefill_logits="last",
        )
        prepped_pre = prep_cache(eng_pre, prompt, b_fact)
        cost_pre = step_cost(cfg, xkv_pre, prepped_pre[0], params, b_fact,
                             rope_mode="pre")
        tps_pre = measure_decode(eng_pre, prompt, b_fact, steps,
                                 prepped=prepped_pre)
        record["rope_pre_tokens_per_s"] = round(tps_pre, 2)
        record["rope_pre_vs_baseline"] = round(tps_pre / tps_none, 3)
        record["rope_pre_accuracy_gated"] = False  # exact attention
        roofline_fields("pre", cost_pre, tps_pre, b_fact)
        if want_verify:
            # Exact multi-token verify in PRE mode: ql query rows share one
            # reconstruction pass, so per-position recon FLOPs divide by ql
            # — the speculative-serving ceiling for the compute-bound
            # reference-semantics mode (outputs stay bit-exact greedy; the
            # sparse-pre kernel is the draft side).
            tps_pre_v = measure_verify(
                eng_pre, prepped_pre[0], prepped_pre[1], prepped_pre[2],
                b_fact, args.verify_ql, vsteps,
            )
            record["rope_pre_verify_mt_positions_per_s"] = round(tps_pre_v, 2)
            record["rope_pre_verify_mt_vs_baseline"] = round(
                tps_pre_v / tps_none, 3)
        del eng_pre, prepped_pre
        eng_pre_sp = InferenceEngine(
            params, cfg, xkv=xkv_pre, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype=factor_dtype, prefill_logits="last",
            sparse_topk=sp_k, sparse_block=args.sparse_block,
        )
        prepped_psp = prep_cache(eng_pre_sp, prompt, b_fact)
        cost_psp = step_cost(
            cfg, xkv_pre, prepped_psp[0], params, b_fact, rope_mode="pre",
            sparse_rows=sp_k * args.sparse_block,
        )
        tps_psp = measure_decode(eng_pre_sp, prompt, b_fact, steps,
                                 prepped=prepped_psp)
        record["rope_pre_sparse_tokens_per_s"] = round(tps_psp, 2)
        record["rope_pre_sparse_vs_baseline"] = round(tps_psp / tps_none, 3)
        # all-layers sparse selection: same accuracy caveat as sparse_topk
        record["rope_pre_sparse_accuracy_gated"] = True
        roofline_fields("pre_sparse", cost_psp, tps_psp, b_fact)
        del eng_pre_sp, prepped_psp
    # Supplementary: the accuracy-parity serving point — post at rank
    # 768/1024 + int8 recovers near-baseline accuracy on the
    # production-geometry gate (docs/ROPE_MODES.md round-3 study) at
    # ~9x KV compression; this measures what that recovery costs in
    # throughput at the same serving batch.
    if (args.rope_mode == "post" and args.factor_dtype == "int8"
            and not (args.quick or args.matched or args.only or args.mla)):
        from xkv_tpu.configs import generate_consecutive_xkv_config

        xkv_hi = generate_consecutive_xkv_config(
            num_layers=cfg.num_layers, end_layer=-1, group_size=4,
            rank_k=768, rank_v=1024, extra_kwargs={"rope_mode": "post"},
        )
        eng_hi = InferenceEngine(
            params, cfg, xkv=xkv_hi, mode="factored", tail_max=tail,
            attention_impl=attention_impl, donate_cache=False,
            factor_dtype="int8", prefill_logits="last",
        )
        # rank 768/1024 factors are 1.4x wider than 512/768 -> scale the
        # serving batch to the same HBM footprint.
        b_hi = max(8, int(b_fact * (512 + 768) / (768 + 1024)))
        prepped_hi = prep_cache(eng_hi, prompt, b_hi)
        cost_hi = step_cost(cfg, xkv_hi, prepped_hi[0], params, b_hi)
        tps_hi = measure_decode(eng_hi, prompt, b_hi, steps,
                                prepped=prepped_hi)
        record["rank768_tokens_per_s"] = round(tps_hi, 2)
        record["rank768_batch"] = b_hi
        record["rank768_vs_baseline"] = round(tps_hi / tps_none, 3)
        record["rank768_accuracy_gated"] = False
        roofline_fields("rank768", cost_hi, tps_hi, b_hi)
        del eng_hi, prepped_hi
    # Supplementary: depth-scaling sweep (VERDICT r3 #3) — validates that
    # the 8-layer headline extrapolates with depth. The dense baseline's
    # max batch shrinks super-linearly with depth (weights + 2.1 GB/seq
    # cache at 64K), so vs_baseline should be stable-or-GROWING; at L=16
    # the dense cache fits batch 1 only, and full-depth Llama-3.1-8B
    # (L=32, 16 GB bf16 weights alone) cannot serve 64K dense at all —
    # which is the serving story the factored cache exists to fix.
    if not (args.quick or args.matched or args.only or args.mla
            or args.no_depth_sweep):
        sweep = [
            {"layers": args.layers, "batch_fact": b_fact,
             "batch_dense": b_dense, "tokens_per_s": record["value"],
             "dense_tokens_per_s": round(tps_none, 2),
             "vs_baseline": record["vs_baseline"]},
        ]
        # free the main-measurement objects first: the sweep's 16-layer
        # weights (7.8 GB bf16) plus leftovers OOM'd the first r4 run
        del eng_none, params, prompt
        import gc

        gc.collect()
        # ALSO drop the global jit compilation caches: by this point the
        # run has compiled ~10 modes x (prefill + 2 decode scans) and the
        # executables' program memory lives on the chip — with the round-5
        # sparse_mixed/MLA additions that tipped the sweep's batch-96
        # 4-layer point into OOM (r5 full-run regression).
        jax.clear_caches()
        # Depths past 8 are where the capacity story becomes a measurement
        # (VERDICT r4 #3): the monolithic factored prefill graph holds
        # EVERY layer's dense K/V until build_cache consumes it (10.6 GB
        # of HLO temps at 12 layers / 64K — compile-time HBM OOM), so
        # deep points run the STAGED per-group prefill (engine
        # staged_prefill=True: compress each group as its layers complete,
        # peak K/V = one group). The dense baseline still runtime-OOMs —
        # error_dense alongside a live factored tokens/s IS the story.
        # deepest first: 16-layer weight init needs the largest
        # contiguous block, so it gets the freshest allocator state
        for L in (16, 12, 4):
            if L == args.layers:
                continue
            # HBM-budget batch model (v5e, ~12 GB with headroom for
            # activations/tail/logits): weights ~0.47 GB/layer + 0.26
            # embed; dense cache 0.268 GB/layer/seq @64K; int8 factored
            # ~0.021 GB/layer/seq.
            w_gb = 0.47 * L + 0.26
            dense_seq = 0.268 * L * ctx / 65536
            fact_seq = 0.021 * L * ctx / 65536
            b_d = max(1, int((12.0 - w_gb) / dense_seq))
            b_f = max(8, min(96, int((12.0 - w_gb) / fact_seq)))
            point = {"layers": L, "batch_fact": b_f, "batch_dense": b_d}
            # Per-iteration cache flush: each depth compiles a fresh set of
            # prefill/decode programs whose HBM accumulates across
            # iterations (the 16-layer weight init OOM'd after the
            # 12-layer iteration's programs piled up).
            gc.collect()
            jax.clear_caches()
            # ADVICE r4: reset per-iteration so a build() failure can never
            # leak the PREVIOUS depth's cfg/params into this point's dense
            # measurement (mislabelled throughput / masked real error).
            cfg_L = params_L = prompt_L = None
            try:  # each mode separately: at L=16 the dense baseline may
                # simply not fit 64K on the chip — that asymmetry IS the
                # serving story, so record whichever side runs.
                cfg_L, xkv_L, params_L, prompt_L = build(
                    kind, ctx, L, tail, rope_mode=args.rope_mode)
            except Exception as e:
                point["error_build"] = (type(e).__name__ + ": " + str(e).splitlines()[0][:110] if str(e) else type(e).__name__)
            if params_L is not None:
                try:
                    e_f = InferenceEngine(
                        params_L, cfg_L, xkv=xkv_L, mode="factored",
                        tail_max=tail,
                        attention_impl=attention_impl, donate_cache=False,
                        factor_dtype=factor_dtype, prefill_logits="last",
                        staged_prefill=(L > 8),
                    )
                    point["staged_prefill"] = L > 8
                    point["tokens_per_s"] = round(
                        measure_decode(e_f, prompt_L, b_f, steps), 2)
                    del e_f
                except Exception as e:
                    point["error_fact"] = (type(e).__name__ + ": " + str(e).splitlines()[0][:110] if str(e) else type(e).__name__)
                try:
                    e_d = InferenceEngine(
                        params_L, cfg_L, mode="none", tail_max=tail,
                        attention_impl=attention_impl, donate_cache=False,
                        prefill_logits="last",
                    )
                    point["dense_tokens_per_s"] = round(
                        measure_decode(e_d, prompt_L, b_d, steps), 2)
                    del e_d
                except Exception as e:
                    point["error_dense"] = (type(e).__name__ + ": " + str(e).splitlines()[0][:110] if str(e) else type(e).__name__)
                del params_L
            if "tokens_per_s" in point and "dense_tokens_per_s" in point:
                point["vs_baseline"] = round(
                    point["tokens_per_s"] / point["dense_tokens_per_s"], 3)
            sweep.append(point)
            # drop every per-iteration device reference — an except path
            # above leaves e_f/e_d bound, and the LAST iteration's
            # leftovers (16-layer weights + cache) otherwise survive into
            # the MLA section and OOM the chip (seen in the r5 full run)
            e_f = e_d = cfg_L = xkv_L = params_L = prompt_L = None
        record["depth_sweep"] = sorted(sweep, key=lambda p: p["layers"])
    record.update(mla_fields)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
