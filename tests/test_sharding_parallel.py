"""Parallelism-strategy tests on the 8-device virtual CPU mesh:
ring/sequence-parallel attention, expert parallelism, pipeline
parallelism (forward + decode), batched serving over the mesh, and the
SP-prefill overlap evidence.

Split out of test_sharding.py (VERDICT r4 #8) so no single slow file
exceeds ~5 minutes on a dev box; the core TP/DP engine + dryrun wiring
stays in test_sharding.py.
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

pytestmark = [
    pytest.mark.skipif(
        jax.device_count() < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,
]

CFG = tiny_llama_config(
    num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=16,
    hidden_size=128, intermediate_size=256,
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def test_ring_attention_matches_reference():
    """Sequence-parallel ring attention over the data axis == single-device
    causal attention."""
    from xkv_tpu.ops.attention import mha_reference
    from xkv_tpu.ops.ring_attention import ring_attention
    import math

    mesh = make_mesh(data=4, model=2)
    b, hq, hkv, s, hd = 2, 4, 2, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, hq, s, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, s, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, s, hd))
    scale = 1 / math.sqrt(hd)
    ref = mha_reference(q, k, v, scale, causal=True)
    got = ring_attention(q, k, v, mesh=mesh, axis_name="data", scale=scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )



def test_ring_attention_sliding_window():
    from xkv_tpu.ops.attention import mha_reference
    from xkv_tpu.ops.ring_attention import ring_attention
    import math

    mesh = make_mesh(data=8, model=1)
    b, h, s, hd = 1, 2, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(3), (b, h, s, hd))
    k = jax.random.normal(jax.random.PRNGKey(4), (b, h, s, hd))
    v = jax.random.normal(jax.random.PRNGKey(5), (b, h, s, hd))
    scale = 1 / math.sqrt(hd)
    ref = mha_reference(q, k, v, scale, causal=True, window=20)
    got = ring_attention(
        q, k, v, mesh=mesh, axis_name="data", scale=scale, window=20
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )



def test_expert_parallel_moe_matches_dense():
    from xkv_tpu.models import deepseek
    from tests.test_deepseek_mla import MOE_CFG

    params = deepseek.init_params(MOE_CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    mlp = params["layers"][MOE_CFG.first_k_dense_replace]["mlp"]
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, MOE_CFG.hidden_size))
    dense_out = deepseek._moe(mlp, MOE_CFG, x)
    mesh = make_mesh(data=2, model=4)  # 4 experts over 4 shards
    ep_out = deepseek.moe_expert_parallel(mlp, MOE_CFG, x, mesh, axis_name="model")
    np.testing.assert_allclose(
        np.asarray(ep_out), np.asarray(dense_out), rtol=2e-4, atol=2e-5
    )



def test_pipeline_parallel_forward_matches_reference():
    """GPipe-style stage-sharded forward == plain prefill logits."""
    from xkv_tpu.parallel.pipeline import pipelined_forward
    from xkv_tpu.models.llama import prefill as plain_prefill

    cfg = tiny_llama_config(
        num_layers=4, num_q_heads=4, num_kv_heads=2, head_dim=16,
        hidden_size=64, intermediate_size=128,
    )
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    rng = np.random.default_rng(11)
    tokens = rng.integers(0, cfg.vocab_size, size=(4, 16)).astype(np.int32)

    ref, _ = plain_prefill(params, cfg, jnp.asarray(tokens))

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = jax.sharding.Mesh(devices, ("pipe",))
    got = pipelined_forward(
        params, cfg, jnp.asarray(tokens), mesh, axis_name="pipe",
        num_microbatches=2,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )



@pytest.mark.parametrize(
    "attention_impl,factor_dtype",
    [("xla", jnp.float32), ("pallas", jnp.float32), ("xla", "int8")],
)
def test_batched_engine_mesh_matches_single(params, attention_impl,
                                            factor_dtype):
    """Continuous batching over a DP(slots) x TP(heads/rank) mesh produces
    the same tokens as the single-device batched engine — the north star's
    multi-chip serving shape (sharded factors + continuous batching)."""
    from xkv_tpu.engine.batching import BatchedEngine

    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(11)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (16, 11, 14, 9, 16)
    ]
    n_new = 4
    common = dict(
        xkv=xkv, num_slots=4, s_max=16, tail_max=8, prefill_buckets=[16],
        cache_dtype=jnp.float32, factor_dtype=factor_dtype,
        attention_impl=attention_impl,
    )
    be_ref = BatchedEngine(params, CFG, **common)
    ref_ids = [be_ref.submit(p, n_new) for p in prompts]
    ref = {r.request_id: r.generated for r in be_ref.run()}

    be_mesh = BatchedEngine(
        params, CFG, mesh=make_mesh(data=4, model=2), **common
    )
    ids = [be_mesh.submit(p, n_new) for p in prompts]
    got = {r.request_id: r.generated for r in be_mesh.run()}
    assert sorted(got) == sorted(ids)
    for rid_m, rid_r in zip(ids, ref_ids):
        assert got[rid_m] == ref[rid_r]



def test_batched_engine_mesh_rejects_indivisible_slots(params):
    from xkv_tpu.engine.batching import BatchedEngine

    with pytest.raises(ValueError, match="multiple of the"):
        BatchedEngine(
            params, CFG, xkv=None, num_slots=3, s_max=16, tail_max=8,
            mesh=make_mesh(data=4, model=2),
        )



def test_batched_speculative_mesh_matches_single(params):
    """Batched speculative decoding on the DP(slots) x TP(heads) mesh:
    sparse TP drafts + one exact TP multi-token verify per round, per-slot
    acceptance — same tokens as the plain single-device batched engine."""
    from xkv_tpu.engine.batching import BatchedEngine

    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(13)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (16, 12, 15, 10)
    ]
    n_new = 6
    common = dict(
        xkv=xkv, num_slots=4, s_max=16, tail_max=10, prefill_buckets=[16],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        attention_impl="pallas",
    )
    be_ref = BatchedEngine(params, CFG, **common)
    ref_ids = [be_ref.submit(p, n_new) for p in prompts]
    ref = {r.request_id: r.generated for r in be_ref.run()}

    be_spec = BatchedEngine(
        params, CFG, mesh=make_mesh(data=4, model=2),
        sparse_topk=2, sparse_block=8, speculative_k=3, **common
    )
    ids = [be_spec.submit(p, n_new) for p in prompts]
    got = {r.request_id: r.generated for r in be_spec.run()}
    for rid_m, rid_r in zip(ids, ref_ids):
        assert got[rid_m] == ref[rid_r]



def test_moe_expert_parallel_in_engine():
    """EP wired into the DeepSeek forward (VERDICT r2 #4): with a mesh
    whose model axis divides the expert count, prefill and decode route
    MoE through moe_expert_parallel — outputs match the unsharded engine."""
    from tests.test_deepseek_mla import MOE_CFG, latent_xkv
    from xkv_tpu.models import deepseek

    params = deepseek.init_params(MOE_CFG, jax.random.PRNGKey(7),
                                  dtype=jnp.float32)
    xkv = latent_xkv(group_size=2, rank=24)
    rng = np.random.default_rng(17)
    prompt = rng.integers(0, MOE_CFG.vocab_size, size=(2, 16)).astype(np.int32)

    eng_plain = InferenceEngine(
        params, MOE_CFG, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    out_plain = np.asarray(eng_plain.generate(prompt, max_new_tokens=4))

    mesh = make_mesh(data=2, model=4)
    assert MOE_CFG.n_routed_experts % mesh.shape["model"] == 0
    eng_mesh = InferenceEngine(
        params, MOE_CFG, xkv=xkv, mode="factored", tail_max=8, mesh=mesh,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    out_mesh = np.asarray(eng_mesh.generate(prompt, max_new_tokens=4))
    np.testing.assert_array_equal(out_mesh, out_plain)



def test_ring_attention_noncausal_matches_reference():
    """Non-causal ring attention (VERDICT r2 #10) == full bidirectional
    attention."""
    import math

    from xkv_tpu.ops.attention import mha_reference
    from xkv_tpu.ops.ring_attention import ring_attention

    mesh = make_mesh(data=4, model=2)
    b, hq, hkv, s, hd = 2, 4, 2, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(6), (b, hq, s, hd))
    k = jax.random.normal(jax.random.PRNGKey(7), (b, hkv, s, hd))
    v = jax.random.normal(jax.random.PRNGKey(8), (b, hkv, s, hd))
    scale = 1 / math.sqrt(hd)
    ref = mha_reference(q, k, v, scale, causal=False)
    got = ring_attention(
        q, k, v, mesh=mesh, axis_name="data", scale=scale, causal=False
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )



def test_ring_attention_skips_masked_blocks():
    """Causal ring skips fully-masked (future) K blocks: over an n-shard
    ring only n*(n+1)/2 of n^2 block computations run (VERDICT r2 #10)."""
    import math

    import xkv_tpu.ops.ring_attention as ring_mod

    mesh = make_mesh(data=8, model=1)
    n = 8
    b, h, s, hd = 1, 2, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(9), (b, h, s, hd))
    k = jax.random.normal(jax.random.PRNGKey(10), (b, h, s, hd))
    v = jax.random.normal(jax.random.PRNGKey(11), (b, h, s, hd))

    calls = []
    orig = ring_mod._local_block_attention

    def counting(*a, **kw):
        jax.debug.callback(lambda: calls.append(1))
        return orig(*a, **kw)

    ring_mod._local_block_attention = counting
    try:
        out = ring_mod.ring_attention(
            q, k, v, mesh=mesh, axis_name="data", scale=1 / math.sqrt(hd)
        )
        jax.block_until_ready(out)
    finally:
        ring_mod._local_block_attention = orig
    # lax.cond executes the compute branch only for live blocks
    assert len(calls) == n * (n + 1) // 2, len(calls)



def test_sequence_parallel_prefill_matches_single_device(params):
    """SP prefill through the ENGINE (VERDICT r2 #9): sequence sharded
    over the data axis, ring attention, factors built from the sharded
    K/V — logits, compressed cache, and a decode step all match the
    unsharded engine."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(23)
    s = 8 * 16  # 8 shards x 16 rows
    prompt = rng.integers(0, CFG.vocab_size, size=(1, s)).astype(np.int32)

    eng_ref = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    out_ref = np.asarray(eng_ref.generate(prompt, max_new_tokens=5))

    mesh = make_mesh(data=8, model=1)
    eng_sp = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=8, mesh=mesh,
        sequence_parallel=True,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    out_sp = np.asarray(eng_sp.generate(prompt, max_new_tokens=5))
    np.testing.assert_array_equal(out_sp, out_ref)

    # logits parity too (not just argmax)
    lg_ref, _ = eng_ref.prefill(prompt)
    lg_sp, _ = eng_sp.prefill(prompt)
    np.testing.assert_allclose(
        np.asarray(lg_sp), np.asarray(lg_ref), rtol=2e-4, atol=2e-4
    )



def test_pipelined_decode_step_matches_reference(params):
    """Decode-time PP (VERDICT r3 #9): one decode step through the
    factored cache with stage-local factors/tail matches
    models/llama.decode_step bitwise-close, including the tail rows it
    writes, across chained steps and with int8 factors."""
    from xkv_tpu.models.llama import decode_step
    from xkv_tpu.parallel.pipeline import pipelined_decode_step

    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"rope_mode": "post"},
    )
    rng = np.random.default_rng(31)
    b = 4
    prompt = rng.integers(0, CFG.vocab_size, size=(b, 32)).astype(np.int32)
    # CFG has 4 layers in groups of 2 -> 2 stages of one group each
    pipe_mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:2]).reshape(2), ("pipe",)
    )
    for fd in (jnp.float32, "int8"):
        eng = InferenceEngine(
            params, CFG, xkv=xkv, mode="factored", tail_max=8,
            cache_dtype=jnp.float32, factor_dtype=fd,
            attention_impl="xla", donate_cache=False,
        )
        logits, cache = eng.prefill(prompt)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        pos = jnp.asarray(32, jnp.int32)
        cos_sin = eng._prefill_cos_sin(cache.prefill_len)
        r1, rc = decode_step(params, CFG, xkv, cache, tok, pos, cos_sin,
                             attention_impl="xla")
        p1, pc = pipelined_decode_step(params, CFG, xkv, cache, tok, pos,
                                       pipe_mesh, num_microbatches=2)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(r1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pc.tail_k),
                                   np.asarray(rc.tail_k),
                                   rtol=1e-5, atol=1e-5)
        assert int(pc.tail_len) == int(rc.tail_len)
        # chained second step (tail threading), different microbatching
        tok2 = jnp.argmax(r1[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        r2, _ = decode_step(params, CFG, xkv, rc, tok2, pos + 1, cos_sin,
                            attention_impl="xla")
        p2, _ = pipelined_decode_step(params, CFG, xkv, pc, tok2, pos + 1,
                                      pipe_mesh, num_microbatches=4)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(r2),
                                   rtol=1e-5, atol=1e-5)



def test_pipelined_decode_step_rejects_bad_layouts(params):
    from xkv_tpu.parallel.pipeline import pipelined_decode_step

    pipe_mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:4]).reshape(4), ("pipe",)
    )
    xkv_pre = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"rope_mode": "pre"},
    )
    eng = InferenceEngine(
        params, CFG, xkv=xkv_pre, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
        attention_impl="xla", donate_cache=False,
    )
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, CFG.vocab_size, size=(4, 32)).astype(np.int32)
    _, cache = eng.prefill(prompt)
    tok = jnp.zeros((4, 1), jnp.int32)
    with pytest.raises(ValueError, match="rope_mode"):
        pipelined_decode_step(params, CFG, xkv_pre, cache, tok,
                              jnp.asarray(32, jnp.int32), pipe_mesh)



def test_sp_prefill_collectives_have_overlap_window(params):
    """North-star overlap evidence (VERDICT r3 #5): every collective in
    the compiled SP prefill has a non-empty set of compute instructions
    with no dependency path to or from it — the legal window the TPU
    latency-hiding scheduler overlaps it with (group g's all-gather is
    independent of group g-1's SVD by construction)."""
    from xkv_tpu.parallel.overlap import collective_overlap_report

    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16,
    )
    mesh = make_mesh(data=4, model=2)
    eng = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=8, mesh=mesh,
        sequence_parallel=True,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    tokens = jnp.zeros((1, 64), jnp.int32)
    txt = eng._prefill_fn.lower(eng.params, tokens).compile().as_text()
    rep = collective_overlap_report(txt)
    assert rep["collectives"] > 0
    assert rep["compute"] > 0
    min_indep = min(
        p["independent_compute"] for p in rep["per_collective"]
    )
    assert min_indep >= 1, (
        "collective with empty overlap window: "
        f"{[p for p in rep['per_collective'] if p['independent_compute'] == 0]}"
    )
