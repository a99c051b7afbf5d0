"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates the GSPMD TP/DP path: sharded engine output == unsharded output,
factor pspecs are consistent, and the driver's dryrun entry works.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params
from xkv_tpu.parallel.mesh import make_mesh
from xkv_tpu.parallel.sharding import param_pspecs, shard_params

pytestmark = [
    pytest.mark.skipif(
        jax.device_count() < 8, reason="needs 8 virtual devices"
    ),
    # mesh engines compile slowly; the driver dryrun re-checks this wiring
    # every round (fast tier: -m 'not slow')
    pytest.mark.slow,
]

CFG = tiny_llama_config(
    num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=16,
    hidden_size=128, intermediate_size=256,
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def test_param_pspecs_cover_tree(params):
    specs = param_pspecs(params)
    p_leaves = jax.tree_util.tree_leaves(params)
    s_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    assert len(p_leaves) == len(s_leaves)


def test_shard_params_distributes(params):
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh)
    wq = sharded["layers"][0]["attn"]["wq"]
    # wq sharded on output dim over 2 model shards
    assert len(wq.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(wq), np.asarray(params["layers"][0]["attn"]["wq"])
    )


def test_sharded_engine_matches_unsharded(params):
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, CFG.vocab_size, size=(4, 24)).astype(np.int32)

    common = dict(
        xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    eng_single = InferenceEngine(params, CFG, **common)
    eng_mesh = InferenceEngine(
        params, CFG, mesh=make_mesh(data=4, model=2), **common
    )

    out_s = np.asarray(eng_single.generate(prompt, max_new_tokens=4))
    out_m = np.asarray(eng_mesh.generate(prompt, max_new_tokens=4))
    np.testing.assert_array_equal(out_s, out_m)


def test_dryrun_multichip_entry(monkeypatch):
    # Bound the test to the CORE dryrun (~45 s): a tight budget makes the
    # production-geometry variants skip gracefully — exercising the
    # round-5 budget/skip path itself. The driver runs the full-budget
    # dryrun (all four variants) every round; keeping them here would put
    # this file well past the 5-minute slow-file bound (VERDICT r4 #8).
    monkeypatch.setenv("XKV_DRYRUN_BUDGET_S", "60")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_engine_pallas_tp_matches_unsharded(params):
    """attention_impl='pallas' under a mesh routes the decode through the
    shard_map TP kernel (interpret mode on CPU); output must match the
    single-device engine."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)
    common = dict(
        xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    eng_single = InferenceEngine(params, CFG, attention_impl="xla", **common)
    eng_tp = InferenceEngine(
        params, CFG, attention_impl="pallas",
        mesh=make_mesh(data=2, model=4), **common,
    )
    out_s = np.asarray(eng_single.generate(prompt, max_new_tokens=4))
    out_t = np.asarray(eng_tp.generate(prompt, max_new_tokens=4))
    np.testing.assert_array_equal(out_s, out_t)


def test_flash_attention_tp_matches_single_device():
    """Head-sharded TP prefill flash attention == single-device kernel
    (interpret mode on the virtual mesh)."""
    from xkv_tpu.ops.pallas.flash_attention import (
        flash_attention_fwd,
        flash_attention_tp,
    )

    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(7)
    b, hq, hkv, s, hd = 2, 8, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, hq, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, hd)), jnp.float32)
    ref = flash_attention_fwd(q, k, v, scale=0.25, causal=True, interpret=True)
    tp = flash_attention_tp(mesh, q, k, v, scale=0.25, causal=True,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_engine_pallas_prefill_matches_unsharded(params):
    """Engine under a mesh with attention_impl='pallas' now drives prefill
    through flash_attention_tp; logits must match the unsharded engine."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)
    eng_ref = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    mesh = make_mesh(data=2, model=4)
    eng_tp = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
        attention_impl="pallas", mesh=mesh,
    )
    l_ref, _ = eng_ref.prefill(prompt)
    l_tp, _ = eng_tp.prefill(prompt)
    np.testing.assert_allclose(
        np.asarray(l_tp), np.asarray(l_ref), rtol=2e-4, atol=2e-4
    )


def test_sparse_tp_full_coverage_matches_unsharded(params):
    """Sparse decode under the TP mesh (per-shard Quest selection +
    scalar-prefetch kernel in shard_map) with n_select == n_chunks must
    equal the unsharded NON-sparse engine exactly (all chunks attended)."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, CFG.vocab_size, size=(2, 32)).astype(np.int32)
    common = dict(
        xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    eng_ref = InferenceEngine(params, CFG, attention_impl="xla", **common)
    eng_sp = InferenceEngine(
        params, CFG, attention_impl="pallas",
        mesh=make_mesh(data=2, model=4),
        sparse_topk=4, sparse_block=8,  # 32/8 = 4 chunks: full coverage
        **common,
    )
    out_r = np.asarray(eng_ref.generate(prompt, max_new_tokens=4))
    out_s = np.asarray(eng_sp.generate(prompt, max_new_tokens=4))
    np.testing.assert_array_equal(out_s, out_r)


def test_sparse_tp_subset_runs(params):
    """Per-shard selection with a chunk budget below full coverage runs and
    produces finite tokens."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(10)
    prompt = rng.integers(0, CFG.vocab_size, size=(2, 32)).astype(np.int32)
    eng = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
        attention_impl="pallas", mesh=make_mesh(data=2, model=4),
        sparse_topk=3, sparse_block=8,
    )
    out = np.asarray(eng.generate(prompt, max_new_tokens=4))
    assert out.shape == (2, 4) and np.isfinite(out).all()


# ---------------------------------------------------- batched serving + mesh
