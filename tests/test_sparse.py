"""Sparse top-k factored decode: landmark selection + gathered attention.

When n_select covers every chunk the sparse path must match the full
factored path exactly; selection must rank a planted high-similarity chunk
first and always keep the sink and recency chunks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params

# In-suite model training / long end-to-end generations (fast tier: -m 'not slow')
pytestmark = pytest.mark.slow

CFG = tiny_llama_config()


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def xkv_cfg(rank=24):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=rank, rank_v=rank, extra_kwargs={"svd_method": "exact"},
    )


def make_engine(params, **kw):
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("factor_dtype", jnp.float32)
    kw.setdefault("tail_max", 16)
    kw.setdefault("donate_cache", False)
    return InferenceEngine(params, CFG, **kw)


def test_sparse_full_coverage_matches_dense_selection(params):
    """n_select == n_chunks -> the gather is a permutation of all rows, so
    sparse output must equal the full factored path exactly."""
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, CFG.vocab_size, size=(2, 32)).astype(np.int32)
    xkv = xkv_cfg()
    eng_full = make_engine(params, xkv=xkv, mode="factored")
    eng_sparse = make_engine(
        params, xkv=xkv, mode="factored", sparse_topk=4, sparse_block=8
    )  # 32/8 = 4 chunks, all selected
    out_full = np.asarray(eng_full.generate(prompt, 8))
    out_sparse = np.asarray(eng_sparse.generate(prompt, 8))
    np.testing.assert_array_equal(out_sparse, out_full)


def test_sparse_subset_close_to_full(params):
    """Dropping low-score chunks must still track the full path's output
    distribution closely on short synthetic prompts (greedy tokens on the
    first steps usually agree; we check logits correlation instead of
    token equality to avoid near-tie flakiness)."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 32)).astype(np.int32)
    xkv = xkv_cfg()
    eng_full = make_engine(params, xkv=xkv, mode="factored")
    eng_sparse = make_engine(
        params, xkv=xkv, mode="factored", sparse_topk=3, sparse_block=8
    )
    _, cache_f = eng_full.prefill(prompt)
    _, cache_s = eng_sparse.prefill(prompt)
    tok = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.asarray(32, jnp.int32)
    lf, _ = eng_full.decode_step(cache_f, tok, pos)
    ls, _ = eng_sparse.decode_step(cache_s, tok, pos)
    lf = np.asarray(lf[0, -1])
    ls = np.asarray(ls[0, -1])
    corr = np.corrcoef(lf, ls)[0, 1]
    assert corr > 0.98, corr


def test_select_topk_chunks_ranks_planted_chunk():
    """A single high-similarity key planted inside one chunk must rank that
    chunk's upper bound above chunks of random keys (the failure mode of
    mean landmarks)."""
    from xkv_tpu.engine.compression import chunk_bounds
    from xkv_tpu.ops.attention import select_topk_chunks

    rng = np.random.default_rng(2)
    b, hq, hkv, hd, nc, blk = 1, 4, 2, 16, 6, 4
    q = jnp.asarray(rng.standard_normal((b, hq, 1, hd)), jnp.float32)
    keys = 0.3 * rng.standard_normal((b, nc * blk, hkv * hd))
    # plant ONE key row (row 2 of chunk 3) matching q on both kv heads
    keys[0, 3 * blk + 2] = 3.0 * np.tile(np.asarray(q[0, 0, 0]), hkv)
    kmin, kmax = chunk_bounds(
        jnp.asarray(keys, jnp.float32), None, None, blk, hkv
    )
    ids = select_topk_chunks(
        q, kmin, kmax, n_select=3, num_kv_heads=hkv, block=blk
    )
    picked = set(np.asarray(ids)[0].tolist())
    assert 0 in picked  # sink
    assert nc - 1 in picked  # recency
    assert 3 in picked  # planted content chunk


def test_chunk_bounds_are_valid_bounds():
    """chunk_bounds(..., cos, sin) must bound every post-RoPE key row
    elementwise, including with a partial final chunk."""
    from xkv_tpu.engine.compression import chunk_bounds
    from xkv_tpu.ops.rope import apply_rope, rope_cos_sin

    rng = np.random.default_rng(3)
    b, hkv, hd, s, blk = 2, 2, 8, 21, 8  # 21 rows -> 3 chunks, last partial
    k_pre = jnp.asarray(rng.standard_normal((b, s, hkv * hd)), jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(s), hd, theta=10000.0)
    kmin, kmax = chunk_bounds(k_pre, cos, sin, blk, hkv)
    from xkv_tpu.compress.svd import heads_to_matrix, matrix_to_heads

    k_rot = heads_to_matrix(
        apply_rope(matrix_to_heads(k_pre, hkv), cos[None], sin[None])
    )
    for c in range(3):
        rows = np.asarray(k_rot[:, c * blk: (c + 1) * blk])
        assert (np.asarray(kmin)[:, c][:, None] <= rows + 1e-6).all()
        assert (np.asarray(kmax)[:, c][:, None] >= rows - 1e-6).all()


def test_sparse_int8_runs(params):
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 32)).astype(np.int32)
    eng = make_engine(
        params, xkv=xkv_cfg(), mode="factored", factor_dtype="int8",
        sparse_topk=3, sparse_block=8,
    )
    out = np.asarray(eng.generate(prompt, 4))
    assert out.shape == (1, 4)


def test_sparse_survives_refactorization(params):
    """Refactorization recomputes the landmark means; sparse decode keeps
    working across fold boundaries."""
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 32)).astype(np.int32)
    eng = make_engine(
        params, xkv=xkv_cfg(), mode="factored", tail_max=4,
        sparse_topk=4, sparse_block=8,
    )
    out = np.asarray(eng.generate(prompt, 10))  # > 2 folds
    assert out.shape == (1, 10)
    assert np.isfinite(out).all()


# ------------------------------------------------- sparse x sliding window
def _win_engine(params_w, cfg, xkv, sparse, **kw):
    skw = dict(sparse_topk=kw.pop("sparse_topk", 4),
               sparse_block=kw.pop("sparse_block", 8)) if sparse else {}
    return InferenceEngine(
        params_w, cfg, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        donate_cache=False, **skw, **kw,
    )


@pytest.mark.parametrize("mode_kw", [{}, {"rope_mode": "post"}])
def test_sparse_window_full_coverage_matches_windowed(mode_kw):
    """sparse_topk covering every chunk + sliding window == plain windowed
    factored decode exactly (VERDICT r3 #4: sparse x window composition —
    the Quest selection gets a window lower bound and the sparse kernels
    column-mask below it)."""
    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params_w = init_params(cfg, jax.random.PRNGKey(10), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24,
        extra_kwargs={"svd_method": "exact", **mode_kw},
    )
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, size=(2, 32)).astype(np.int32)
    out_full = np.asarray(
        _win_engine(params_w, cfg, xkv, False).generate(prompt, 6))
    out_sparse = np.asarray(
        _win_engine(params_w, cfg, xkv, True).generate(prompt, 6))
    np.testing.assert_array_equal(out_sparse, out_full)


@pytest.mark.parametrize("mode_kw", [{}, {"rope_mode": "post"}])
def test_sparse_window_budget_skips_dead_chunks(mode_kw):
    """With window 10 over a 32-token prompt only the last 1-2 chunks hold
    live rows; a selection budget of 2 must therefore reproduce windowed
    decode EXACTLY — dead chunks below the window never spend budget."""
    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params_w = init_params(cfg, jax.random.PRNGKey(12), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24,
        extra_kwargs={"svd_method": "exact", **mode_kw},
    )
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 32)).astype(np.int32)
    out_full = np.asarray(
        _win_engine(params_w, cfg, xkv, False).generate(prompt, 5))
    out_sparse = np.asarray(
        _win_engine(params_w, cfg, xkv, True, sparse_topk=2).generate(
            prompt, 5))
    np.testing.assert_array_equal(out_sparse, out_full)


def test_sparse_window_pallas_interpret_matches_xla():
    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params_w = init_params(cfg, jax.random.PRNGKey(14), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(15)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 32)).astype(np.int32)
    outs = {}
    for impl in ("xla", "pallas"):
        outs[impl] = np.asarray(
            _win_engine(params_w, cfg, xkv, True,
                        attention_impl=impl).generate(prompt, 5))
    np.testing.assert_array_equal(outs["pallas"], outs["xla"])


def test_batched_sparse_window_matches_single():
    """Batched sparse decode applies the per-slot window bound."""
    from xkv_tpu.engine.batching import BatchedEngine

    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params_w = init_params(cfg, jax.random.PRNGKey(16), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
               for n in (16, 12)]
    n_new = 4
    singles = [
        np.asarray(
            _win_engine(params_w, cfg, xkv, True).generate(p[None, :], n_new)
        )[0].tolist()
        for p in prompts
    ]
    be = BatchedEngine(
        params_w, cfg, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32, sparse_topk=4, sparse_block=8,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    results = {r.request_id: r.generated for r in be.run()}
    for rid, expect in zip(ids, singles):
        assert results[rid] == expect


def test_batched_sparse_full_coverage_matches_dense_selection(params):
    """Batched engine with sparse decode covering all chunks == batched
    engine without sparsity."""
    from xkv_tpu.engine.batching import BatchedEngine

    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
               for n in (16, 12)]
    n_new = 4

    def run(sparse):
        kw = {}
        if sparse:
            kw = dict(sparse_topk=4, sparse_block=8)  # 32/8=4 chunks: all
        be = BatchedEngine(
            params, CFG, xkv=xkv_cfg(), num_slots=2, s_max=32, tail_max=8,
            prefill_buckets=[16, 32], cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, **kw,
        )
        ids = [be.submit(p, n_new) for p in prompts]
        return ids, {r.request_id: r.generated for r in be.run()}

    ids_d, dense = run(False)
    ids_s, sparse = run(True)
    for i_d, i_s in zip(ids_d, ids_s):
        assert sparse[i_s] == dense[i_d]


# ------------------------------------------------------------ sparse x int4
def _mk_int4_engine(params, cfg, xkv, sparse=None, block=8):
    kw = {}
    if sparse is not None:
        kw = dict(sparse_topk=sparse, sparse_block=block)
    return InferenceEngine(
        params, cfg, xkv=xkv, mode="factored", tail_max=8,
        attention_impl="xla", donate_cache=False,
        cache_dtype=jnp.float32, factor_dtype="int4",
        prefill_logits="last", **kw,
    )


def test_sparse_int4_full_coverage_matches_exact():
    """sparse x mixed-int4 (round 4): with every chunk selected, the
    gathered rank-space path must equal the exact mixed4 decode."""
    cfg = tiny_llama_config(
        num_layers=2, num_q_heads=4, num_kv_heads=2, head_dim=16,
        hidden_size=64, intermediate_size=128,
    )
    # rank 512+ tiles are production; tiny test ranks keep an even int4
    # tail (engine/compression.py:int4_rank_hi)
    xkv = generate_consecutive_xkv_config(
        num_layers=2, end_layer=-1, group_size=2, rank_k=16, rank_v=16,
        extra_kwargs={"rope_mode": "post", "int4_rank_frac": 0.5},
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, size=(2, 64)).astype(np.int32)

    eng_exact = _mk_int4_engine(params, cfg, xkv)
    out_exact = np.asarray(eng_exact.generate(prompt, max_new_tokens=6))

    # 64 rows / block 8 = 8 chunks; select all 8 -> identical coverage
    eng_sp = _mk_int4_engine(params, cfg, xkv, sparse=8, block=8)
    out_sp = np.asarray(eng_sp.generate(prompt, max_new_tokens=6))
    np.testing.assert_array_equal(out_sp, out_exact)


def test_sparse_int4_partial_coverage_runs():
    cfg = tiny_llama_config(
        num_layers=2, num_q_heads=4, num_kv_heads=2, head_dim=16,
        hidden_size=64, intermediate_size=128,
    )
    xkv = generate_consecutive_xkv_config(
        num_layers=2, end_layer=-1, group_size=2, rank_k=16, rank_v=16,
        extra_kwargs={"rope_mode": "post", "int4_rank_frac": 0.5},
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 64)).astype(np.int32)
    eng = _mk_int4_engine(params, cfg, xkv, sparse=3, block=8)
    out = np.asarray(eng.generate(prompt, max_new_tokens=4))
    assert out.shape == (1, 4)


def test_batched_sparse_int4_full_coverage_matches_exact():
    """BatchedEngine: sparse x int4 with full chunk coverage == exact
    batched int4 decode (slot layout carries the Quest bounds)."""
    from xkv_tpu.engine.batching import BatchedEngine

    cfg = tiny_llama_config(
        num_layers=2, num_q_heads=4, num_kv_heads=2, head_dim=16,
        hidden_size=64, intermediate_size=128,
    )
    xkv = generate_consecutive_xkv_config(
        num_layers=2, end_layer=-1, group_size=2, rank_k=16, rank_v=16,
        extra_kwargs={"rope_mode": "post", "int4_rank_frac": 0.5},
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
               for n in (32, 24)]

    def run(sparse):
        kw = dict(sparse_topk=4, sparse_block=8) if sparse else {}
        be = BatchedEngine(
            params, cfg, xkv=xkv, num_slots=2, s_max=32, tail_max=8,
            prefill_buckets=[32], cache_dtype=jnp.float32,
            factor_dtype="int4", attention_impl="xla", **kw,
        )
        ids = [be.submit(p, 4) for p in prompts]
        return ids, {r.request_id: r.generated for r in be.run()}

    ids_d, exact = run(False)
    ids_s, sparse = run(True)
    for i_d, i_s in zip(ids_d, ids_s):
        assert sparse[i_s] == exact[i_d]


# ------------------------------------------------------- per-layer mixing
def test_sparse_layers_mixing(params):
    """Per-layer sparse/dense mixing (round 4): layers outside
    sparse_layers read the factored cache exactly, so an empty set equals
    exact decode bit-wise, and a subset runs."""
    cfg = xkv_cfg()
    prompt = np.random.default_rng(8).integers(
        0, CFG.vocab_size, size=(2, 32)
    ).astype(np.int32)
    exact = np.asarray(InferenceEngine(
        params, CFG, xkv=cfg, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        donate_cache=False,
    ).generate(prompt, max_new_tokens=6))
    # empty set: sparse machinery on, but every layer exact
    eng_none = InferenceEngine(
        params, CFG, xkv=cfg, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        donate_cache=False, sparse_topk=2, sparse_block=8,
        sparse_layers=(),
    )
    np.testing.assert_array_equal(
        np.asarray(eng_none.generate(prompt, max_new_tokens=6)), exact
    )
    # subset: runs, and full-coverage selection still equals exact
    eng_mix = InferenceEngine(
        params, CFG, xkv=cfg, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        donate_cache=False, sparse_topk=4, sparse_block=8,
        sparse_layers=(0, 1),
    )
    np.testing.assert_array_equal(
        np.asarray(eng_mix.generate(prompt, max_new_tokens=6)), exact
    )


# ---------------------------------------------------------- sparse probe
def test_probe_sparse_layers_mechanics(params):
    """The automated sparse-layer probe (VERDICT r4 #9): returns a valid
    recommendation, full-coverage selection probes as already-agreeing
    (recommended = all layers sparse), and the leave-one-out gains cover
    every layer when the all-sparse config disagrees."""
    from xkv_tpu.evalharness.sparse_probe import probe_sparse_layers

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(1, 48)).astype(np.int32)
        for _ in range(2)
    ]
    kw = dict(cache_dtype=jnp.float32, factor_dtype=jnp.float32)

    # full coverage (n_select >= n_chunks): sparse == exact, so the probe
    # must recommend everything stays sparse without running the sweep
    rep = probe_sparse_layers(
        params, CFG, xkv_cfg(), prompts, sparse_topk=64, sparse_block=8,
        gen_len=4, threshold=0.99, engine_kwargs=kw,
    )
    assert rep["recommended_sparse_layers"] == list(range(CFG.num_layers))
    assert rep["agreement_all_sparse"] >= 0.99

    # tight budget: if agreement < threshold the sweep runs; whatever it
    # recommends must be a subset of layers and improve-or-match agreement
    rep2 = probe_sparse_layers(
        params, CFG, xkv_cfg(), prompts, sparse_topk=1, sparse_block=8,
        gen_len=4, threshold=1.0, engine_kwargs=kw,
    )
    assert set(rep2["recommended_sparse_layers"]) <= set(range(CFG.num_layers))
    assert rep2["agreement_final"] >= rep2["agreement_all_sparse"] - 1e-9
    if rep2["agreement_all_sparse"] < 1.0:
        assert len(rep2["per_layer_gain"]) == CFG.num_layers


# ------------------------------------------------------- adaptive budget
def test_adaptive_hot_chunks_counts():
    """One dominant chunk -> hot count 1; many near-max chunks -> large
    hot count (the multi-answer signature driving sparse_topk_max)."""
    from xkv_tpu.ops.attention import adaptive_hot_chunks

    live = jnp.ones((1, 8), bool)
    single = jnp.asarray([[10.0, 1, 1, 1, 1, 1, 1, 1]], jnp.float32)
    assert int(adaptive_hot_chunks(single, live)[0]) == 1
    multi = jnp.asarray([[10.0, 9.9, 9.8, 9.9, 1, 1, 1, 1]], jnp.float32)
    assert int(adaptive_hot_chunks(multi, live)[0]) == 4
    # dead chunks are excluded
    live2 = jnp.asarray([[True] * 4 + [False] * 4])
    multi2 = jnp.asarray([[10.0, 9.9, 1, 1, 99, 99, 99, 99]], jnp.float32)
    assert int(adaptive_hot_chunks(multi2, live2)[0]) == 2


def test_adaptive_budget_step_matches_one_branch(params):
    """A decode step with sparse_topk_max must produce logits identical to
    EITHER the low-budget or the high-budget static engine (lax.cond picks
    one of exactly those two computations)."""
    xkv = xkv_cfg()
    prompt = np.random.default_rng(21).integers(
        0, CFG.vocab_size, size=(2, 64)).astype(np.int32)

    def step_logits(**kw):
        eng = make_engine(params, xkv=xkv, mode="factored",
                          sparse_block=8, **kw)
        lg, cache = eng.prefill(prompt)
        tok = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        out, _ = eng.decode_step(cache, tok, jnp.asarray(64, jnp.int32))
        return np.asarray(out)

    lo = step_logits(sparse_topk=3)
    hi = step_logits(sparse_topk=6)
    ad = step_logits(sparse_topk=3, sparse_topk_max=6)
    match_lo = np.allclose(ad, lo, rtol=1e-5, atol=1e-5)
    match_hi = np.allclose(ad, hi, rtol=1e-5, atol=1e-5)
    assert match_lo or match_hi


def test_adaptive_budget_validation(params):
    with pytest.raises(ValueError, match="requires sparse_topk"):
        make_engine(params, xkv=xkv_cfg(), mode="factored",
                    sparse_topk_max=8)
    with pytest.raises(ValueError, match="must exceed"):
        make_engine(params, xkv=xkv_cfg(), mode="factored",
                    sparse_topk=4, sparse_topk_max=4)


def test_adaptive_budget_full_coverage_exact(params):
    """When the high budget covers every chunk AND the trigger fires, the
    adaptive step equals exact decode; in all cases generation runs."""
    xkv = xkv_cfg()
    prompt = np.random.default_rng(22).integers(
        0, CFG.vocab_size, size=(1, 64)).astype(np.int32)
    eng = make_engine(params, xkv=xkv, mode="factored",
                      sparse_topk=2, sparse_topk_max=8, sparse_block=8)
    out = np.asarray(eng.generate(prompt, max_new_tokens=4))
    assert out.shape == (1, 4) and np.isfinite(out).all()
