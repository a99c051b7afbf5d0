"""Compact MiniCache (SLERP) storage: shared direction + norms + exception
rows — the memory saving the reference's fake path never realizes
(`fake_layer_merge_dynamic_cache.py:93-100` stores both layers dense).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.compress.slerp import (
    compact_pair,
    compact_reconstruct,
    minicache_merge_heads,
)
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


def slerp_cfg(gamma=0.05, **extra):
    return generate_consecutive_xkv_config(
        layer_merge_impl="slerp",
        num_layers=CFG.num_layers,
        end_layer=CFG.num_layers - 1,
        group_size=2,
        slerp_t=0.5,
        slerp_gamma=gamma,
        extra_kwargs={"slerp_compact": True, **extra},
    )


def make_engine(params, mode, xkv=None, **kw):
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("factor_dtype", jnp.float32)
    kw.setdefault("tail_max", 16)
    kw.setdefault("donate_cache", False)
    return InferenceEngine(params, CFG, xkv=xkv, mode=mode, **kw)


def test_compact_pair_roundtrip_full_budget():
    """keep == s stores every row exactly."""
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((2, 3, 16, 8)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 3, 16, 8)), jnp.float32)
    sc = compact_pair(x1, x2, keep=16)
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 0)), np.asarray(x1),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 1)), np.asarray(x2),
        rtol=1e-5, atol=1e-5,
    )


def test_compact_pair_merged_rows_free():
    """Rows where x2 is a positive scalar multiple of x1 (the MiniCache
    divergent/merged case) reconstruct exactly without exception budget."""
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((1, 2, 12, 8)), jnp.float32)
    scale2 = jnp.asarray(rng.uniform(0.5, 2.0, (1, 2, 12, 1)), jnp.float32)
    x2 = x1 * scale2  # all rows parallel
    sc = compact_pair(x1, x2, keep=1)
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 0)), np.asarray(x1),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 1)), np.asarray(x2),
        rtol=1e-5, atol=1e-5,
    )


def test_compact_pair_budget_protects_divergent_rows():
    """With a partial budget, the most-divergent (largest-angle) rows are
    the ones stored exactly."""
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((1, 1, 8, 6)), jnp.float32)
    x2 = x1 * 1.3  # parallel everywhere ...
    x2 = x2.at[0, 0, 5].set(-x1[0, 0, 5] + 0.3)  # ... except row 5
    sc = compact_pair(x1, x2, keep=2)
    assert 5 in np.asarray(sc.keep_idx)[0, 0].tolist()
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 1)), np.asarray(x2),
        rtol=1e-5, atol=1e-5,
    )


def test_compact_engine_matches_fake_slerp(params):
    """Compact factored slerp generation == the reference-parity fake slerp
    path (budget covers the non-divergent rows)."""
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)
    cfg_compact = slerp_cfg(slerp_keep_frac=0.5)
    cfg_fake = slerp_cfg()  # flag ignored in fake mode
    eng_fake = make_engine(params, "fake", cfg_fake)
    eng_compact = make_engine(params, "factored", cfg_compact)
    out_f = np.asarray(eng_fake.generate(prompt, max_new_tokens=6))
    out_c = np.asarray(eng_compact.generate(prompt, max_new_tokens=6))
    np.testing.assert_array_equal(out_c, out_f)


def test_compact_saves_memory(params):
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 64)).astype(np.int32)
    eng_c = make_engine(params, "factored", slerp_cfg(slerp_keep_frac=0.125))
    eng_d = make_engine(params, "fake", slerp_cfg())
    _, cache_c = eng_c.prefill(prompt)
    _, cache_d = eng_d.prefill(prompt)
    ratio = cache_d.num_cache_bytes() / cache_c.num_cache_bytes()
    assert ratio > 1.4, f"compact slerp saved too little: {ratio:.2f}x"
    assert cache_c.compression_ratio(CFG) > 1.4


def test_compact_survives_refactorization(params):
    """Generation across tail folds: compact refold keeps previously-kept
    originals and all tail rows exact, so output still matches fake slerp
    (whose refactorization is an exact dense concat)."""
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 24)).astype(np.int32)
    eng_fake = make_engine(params, "fake", slerp_cfg(), tail_max=16)
    eng_compact = make_engine(
        params, "factored", slerp_cfg(slerp_keep_frac=0.5), tail_max=4
    )  # 10 new tokens with tail 4 -> 2 refolds
    out_f = np.asarray(eng_fake.generate(prompt, max_new_tokens=10))
    out_c = np.asarray(eng_compact.generate(prompt, max_new_tokens=10))
    np.testing.assert_array_equal(out_c, out_f)


def test_batched_compact_matches_single_stream(params):
    """Compact MiniCache through the batched scheduler (VERDICT r2 #2):
    slot insertion pads the exception budget with duplicated entries and
    decode reconstructs per slot; tokens match the single-stream compact
    engine."""
    from xkv_tpu.engine.batching import BatchedEngine

    xkv = slerp_cfg(slerp_keep_frac=0.5)
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, CFG.vocab_size, size=(16,)).astype(np.int32)
               for _ in range(2)]
    n_new = 4
    singles = []
    for p in prompts:
        eng = make_engine(params, "factored", xkv, tail_max=n_new + 2)
        singles.append(np.asarray(eng.generate(p[None, :], n_new))[0].tolist())

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, expected in zip(ids, singles):
        assert by_id[rid] == expected
    assert all(g.slerp_k is not None and g.slerp_v is not None
               for g in be.batch_cache.groups)


def test_batched_compact_refold_continues(params):
    """Compact slots fold tails in place at a fixed exception budget and
    keep generating; with budget >= kept + tail rows the fold is lossless,
    so output matches the (growing-budget) single-stream compact engine."""
    from xkv_tpu.engine.batching import BatchedEngine

    xkv = slerp_cfg(slerp_keep_frac=0.5)
    rng = np.random.default_rng(14)
    prompt = rng.integers(0, CFG.vocab_size, size=(12,)).astype(np.int32)
    n_new = 8  # tail_max=4 -> at least one in-place refold
    eng = make_engine(params, "factored", xkv, tail_max=n_new + 2)
    expected = np.asarray(eng.generate(prompt[None, :], n_new))[0].tolist()

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=1, s_max=32, tail_max=4,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32,
    )
    be.submit(prompt, n_new)
    done = be.run()
    assert done[0].generated == expected


def test_minicache_merge_then_compact_consistent():
    """End-to-end math check: fake merge output == compact reconstruction
    of the same merge when budget covers all non-parallel rows."""
    rng = np.random.default_rng(6)
    k1 = jnp.asarray(rng.standard_normal((1, 2, 20, 8)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((1, 2, 20, 8)), jnp.float32)
    m1, m2 = minicache_merge_heads(k1, k2, t=0.5, gamma=0.05)
    sc = compact_pair(m1, m2, keep=20)
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 0)), np.asarray(m1),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(compact_reconstruct(sc, 1)), np.asarray(m2),
        rtol=1e-5, atol=1e-5,
    )
