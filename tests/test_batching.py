"""Continuous-batching scheduler tests: parity with the single-sequence
engine, mixed lengths, slot reuse, EOS retirement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.engine.batching import BatchedEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params

# In-suite model training / long end-to-end generations (fast tier: -m 'not slow')
pytestmark = pytest.mark.slow

CFG = tiny_llama_config()


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def xkv_cfg():
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )


def reference_outputs(params, prompts, n_new, xkv=None):
    mode = "factored" if xkv is not None else "none"
    outs = []
    for p in prompts:
        eng = InferenceEngine(
            params, CFG, xkv=xkv, mode=mode, tail_max=n_new + 2,
            cache_dtype=jnp.float32, factor_dtype=jnp.float32,
            donate_cache=False,
        )
        outs.append(np.asarray(eng.generate(p[None, :], n_new))[0].tolist())
    return outs


def test_batched_matches_single_sequence_uncompressed(params):
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (12, 19, 7)
    ]
    n_new = 5
    expected = reference_outputs(params, prompts, n_new)

    be = BatchedEngine(
        params, CFG, xkv=None, num_slots=2, s_max=24, tail_max=8,
        prefill_buckets=[8, 16, 24],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    done = be.run()
    by_id = {r.request_id: r.generated for r in done}
    assert sorted(by_id.keys()) == sorted(ids)
    for rid, p_exp in zip(ids, expected):
        assert by_id[rid] == p_exp, f"request {rid}: {by_id[rid]} != {p_exp}"


def test_batched_matches_single_sequence_factored(params):
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (16, 16)
    ]
    n_new = 4
    xkv = xkv_cfg()
    expected = reference_outputs(params, prompts, n_new, xkv=xkv)

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    done = be.run()
    by_id = {r.request_id: r.generated for r in done}
    for rid, p_exp in zip(ids, expected):
        assert by_id[rid] == p_exp


def test_more_requests_than_slots(params):
    """Slot reuse: 5 requests through 2 slots."""
    rng = np.random.default_rng(2)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(10,)).astype(np.int32)
        for _ in range(5)
    ]
    be = BatchedEngine(
        params, CFG, xkv=None, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    for p in prompts:
        be.submit(p, 3)
    done = be.run()
    assert len(done) == 5
    assert all(len(r.generated) == 3 for r in done)


def test_batched_int8_factors(params):
    """Int8-quantized factors work through the batched scheduler and match
    the single-stream int8 engine."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, CFG.vocab_size, size=(16,)).astype(np.int32)
               for _ in range(2)]
    n_new = 4
    xkv = xkv_cfg()
    singles = []
    for p in prompts:
        eng = InferenceEngine(
            params, CFG, xkv=xkv, mode="factored", tail_max=n_new + 2,
            cache_dtype=jnp.float32, factor_dtype="int8", donate_cache=False,
        )
        singles.append(np.asarray(eng.generate(p[None, :], n_new))[0].tolist())

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32, factor_dtype="int8",
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, expected in zip(ids, singles):
        assert by_id[rid] == expected


def test_batched_mla_matches_single_stream():
    """MLA (DeepSeek-V2) through the batched scheduler matches the
    single-stream MLA engine."""
    from tests.test_deepseek_mla import CFG as MLA_CFG, latent_xkv
    from xkv_tpu.models import deepseek

    params = deepseek.init_params(MLA_CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    xkv = latent_xkv(group_size=2, rank=24)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, MLA_CFG.vocab_size, size=(n,)).astype(np.int32)
               for n in (16, 12)]
    n_new = 4

    singles = []
    for p in prompts:
        eng = InferenceEngine(
            params, MLA_CFG, xkv=xkv, mode="factored", tail_max=n_new + 2,
            cache_dtype=jnp.float32, factor_dtype=jnp.float32,
            donate_cache=False,
        )
        singles.append(np.asarray(eng.generate(p[None, :], n_new))[0].tolist())

    be = BatchedEngine(
        params, MLA_CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, expected in zip(ids, singles):
        assert by_id[rid] == expected
    # The batched cache must carry the latent inv-rms so decode takes the
    # rank-space absorbed path, not the legacy reconstruct-the-latent
    # fallback (ADVICE r2: k_rnorm was silently dropped in batching).
    assert all(g.k_rnorm is not None for g in be.batch_cache.groups)


def test_batched_refactorization_extends_generation(params):
    """When a slot's tail fills, the tail folds back into the slot's
    factors in place (rows beyond prefill_len are free zero rows) and
    generation continues. With a full-rank (lossless) factorization the
    output must match the uncompressed baseline across fold boundaries."""
    full_rank = 2 * CFG.num_kv_heads * CFG.head_dim  # lossless for group of 2
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=full_rank, rank_v=full_rank, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, CFG.vocab_size, size=(12,)).astype(np.int32)
               for _ in range(2)]
    n_new = 10  # > 2 folds at tail_max=4

    expected = reference_outputs(params, prompts, n_new)  # uncompressed

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=32, tail_max=4,
        prefill_buckets=[16], cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, exp in zip(ids, expected):
        assert len(by_id[rid]) == n_new
        assert by_id[rid] == exp


def test_batched_capacity_finish(params):
    """A slot whose row capacity is exhausted finishes early instead of
    corrupting rows (plen + tail_max would exceed s_max)."""
    xkv = xkv_cfg()
    rng = np.random.default_rng(12)
    prompt = rng.integers(0, CFG.vocab_size, size=(16,)).astype(np.int32)
    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=1, s_max=16, tail_max=4,
        prefill_buckets=[16], cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    be.submit(prompt, 50)  # wants far more than capacity
    done = be.run()
    assert len(done) == 1
    # prefill fills s_max exactly -> no fold possible -> tail only
    assert len(done[0].generated) <= 1 + be.tail_max


def test_chunked_admission_matches_monolithic(params):
    """Chunked prefill admission (one chunk per scheduler step, interleaved
    with decode) produces exactly the same tokens as monolithic admission."""
    xkv = xkv_cfg()
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
               for n in (15, 9, 16)]
    n_new = 5

    def run_engine(chunk):
        be = BatchedEngine(
            params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
            prefill_buckets=[16], cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, prefill_chunk=chunk,
        )
        ids = [be.submit(p, n_new) for p in prompts]
        return ids, {r.request_id: r.generated for r in be.run()}

    ids_m, mono = run_engine(None)
    ids_c, chunked = run_engine(4)
    for im, ic in zip(ids_m, ids_c):
        assert chunked[ic] == mono[im]


def test_chunked_admission_validation(params):
    with pytest.raises(ValueError, match="not multiples"):
        BatchedEngine(
            params, CFG, xkv=xkv_cfg(), num_slots=1, s_max=16, tail_max=4,
            prefill_buckets=[12], prefill_chunk=5,
        )


def test_mla_chunked_admission_matches_monolithic():
    """Chunked MLA prefill admission (deepseek.prefill_chunk) produces the
    same tokens as monolithic admission."""
    from tests.test_deepseek_mla import CFG as MLA_CFG, latent_xkv
    from xkv_tpu.models import deepseek

    params = deepseek.init_params(MLA_CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    xkv = latent_xkv(group_size=2, rank=24)
    rng = np.random.default_rng(22)
    prompts = [rng.integers(0, MLA_CFG.vocab_size, size=(n,)).astype(np.int32)
               for n in (15, 9)]
    n_new = 4

    def run_engine(chunk):
        be = BatchedEngine(
            params, MLA_CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
            prefill_buckets=[16], cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, prefill_chunk=chunk,
        )
        ids = [be.submit(p, n_new) for p in prompts]
        return ids, {r.request_id: r.generated for r in be.run()}

    ids_m, mono = run_engine(None)
    ids_c, chunked = run_engine(4)
    for im, ic in zip(ids_m, ids_c):
        assert chunked[ic] == mono[im]


def test_batched_speculative_matches_plain(params):
    """Batched speculative decoding (sparse drafts, one exact multi-token
    verify per round, per-slot acceptance) emits EXACTLY the tokens of the
    plain batched engine — regardless of how often the drafts are right."""
    xkv = xkv_cfg()
    rng = np.random.default_rng(31)
    prompts = [rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
               for n in (16, 12, 9)]
    n_new = 9

    def run(spec):
        kw = dict(sparse_topk=2, sparse_block=8)
        if spec:
            kw["speculative_k"] = 3
        be = BatchedEngine(
            params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=12,
            prefill_buckets=[16], cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, **kw,
        )
        ids = [be.submit(p, n_new) for p in prompts]
        return ids, {r.request_id: r.generated for r in be.run()}

    # The plain engine here runs WITHOUT sparse_topk: emitted tokens must be
    # exact either way (speculation's sparse path only shapes the drafts).
    be_plain = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=12,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32,
    )
    ids_p = [be_plain.submit(p, n_new) for p in prompts]
    plain = {r.request_id: r.generated for r in be_plain.run()}

    ids_s, spec = run(True)
    for ip, isp in zip(ids_p, ids_s):
        assert spec[isp] == plain[ip], (spec[isp], plain[ip])
        assert len(spec[isp]) == n_new


def test_batched_speculative_with_refactorization(params):
    """Speculative rounds interleave with tail refactorization: when a
    slot's tail can't hold a full round, it tops up with plain steps, folds
    the tail into the factors, and speculation resumes. Lossless ranks pin
    the output to the uncompressed baseline."""
    full_rank = 2 * CFG.num_kv_heads * CFG.head_dim
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=full_rank, rank_v=full_rank, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(32)
    prompts = [rng.integers(0, CFG.vocab_size, size=(12,)).astype(np.int32)
               for _ in range(2)]
    n_new = 11  # multiple folds at tail_max=6

    expected = reference_outputs(params, prompts, n_new)  # uncompressed

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=48, tail_max=6,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32, sparse_topk=2, sparse_block=8,
        speculative_k=3,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, exp in zip(ids, expected):
        assert by_id[rid] == exp


def test_batched_speculative_validation(params):
    xkv = xkv_cfg()
    with pytest.raises(ValueError, match="requires sparse_topk"):
        BatchedEngine(params, CFG, xkv=xkv, num_slots=1, s_max=16,
                      tail_max=8, speculative_k=3)
    with pytest.raises(ValueError, match="tail_max"):
        BatchedEngine(params, CFG, xkv=xkv, num_slots=1, s_max=16,
                      tail_max=3, sparse_topk=2, sparse_block=8,
                      speculative_k=3)


def test_batched_mla_speculative_matches_plain():
    """Batched MLA speculative serving (rank-truncated latent drafts, one
    exact multi-token verify per round) matches the plain batched MLA
    engine token-for-token."""
    from tests.test_deepseek_mla import CFG as MLA_CFG, latent_xkv
    from xkv_tpu.models import deepseek

    params = deepseek.init_params(MLA_CFG, jax.random.PRNGKey(3),
                                  dtype=jnp.float32)
    xkv = latent_xkv(group_size=2, rank=24)
    rng = np.random.default_rng(33)
    prompts = [rng.integers(0, MLA_CFG.vocab_size, size=(n,)).astype(np.int32)
               for n in (16, 12, 10)]
    n_new = 7

    def run(**kw):
        be = BatchedEngine(
            params, MLA_CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=10,
            prefill_buckets=[16], cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, **kw,
        )
        ids = [be.submit(p, n_new) for p in prompts]
        return ids, {r.request_id: r.generated for r in be.run()}

    ids_p, plain = run()
    ids_s, spec = run(speculative_k=3, draft_rank=8)
    for ip, isp in zip(ids_p, ids_s):
        assert spec[isp] == plain[ip], (spec[isp], plain[ip])
        assert len(spec[isp]) == n_new


def _post_int4_xkv(rank=16):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=rank, rank_v=rank,
        extra_kwargs={"svd_method": "exact", "rope_mode": "post"},
    )


def test_batched_int4_matches_single_stream(params):
    """factor_dtype='int4' through the batched scheduler: slot allocation,
    insertion and decode carry the packed int4 tail and match the
    single-stream int4 engine bit-for-bit (VERDICT r2 #2)."""
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, CFG.vocab_size, size=(16,)).astype(np.int32)
               for _ in range(2)]
    n_new = 4
    xkv = _post_int4_xkv()

    singles = []
    for p in prompts:
        eng = InferenceEngine(
            params, CFG, xkv=xkv, mode="factored", tail_max=n_new + 2,
            cache_dtype=jnp.float32, factor_dtype="int4",
            donate_cache=False,
        )
        singles.append(np.asarray(eng.generate(p[None, :], n_new))[0].tolist())

    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32, factor_dtype="int4",
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, expected in zip(ids, singles):
        assert by_id[rid] == expected
    for g in be.batch_cache.groups:
        assert g.k_us4 is not None and g.v_us4 is not None
        assert g.k_vt4 is not None and g.k_scale4 is not None


def test_batched_int4_refactorization_continues(params):
    """Int4 slots fold their tails in place (refactorize_slot_cache already
    re-quantizes the mixed layout) and keep generating finite tokens."""
    rng = np.random.default_rng(22)
    prompt = rng.integers(0, CFG.vocab_size, size=(12,)).astype(np.int32)
    be = BatchedEngine(
        params, CFG, xkv=_post_int4_xkv(), num_slots=1, s_max=32, tail_max=4,
        prefill_buckets=[16], cache_dtype=jnp.float32, factor_dtype="int4",
    )
    be.submit(prompt, 10)  # > 2 folds at tail_max=4
    done = be.run()
    assert len(done) == 1 and len(done[0].generated) == 10
    assert all(0 <= t < CFG.vocab_size for t in done[0].generated)


def test_batched_int4_validation(params):
    import pytest

    xkv_pre = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )
    with pytest.raises(ValueError, match="rope_mode"):
        BatchedEngine(params, CFG, xkv=xkv_pre, num_slots=1, s_max=16,
                      factor_dtype="int4")
    # sparse x int4 composes since round 4 (tests/test_sparse.py parity);
    # batched speculation x int4 remains guarded.
    BatchedEngine(params, CFG, xkv=_post_int4_xkv(), num_slots=1,
                  s_max=16, factor_dtype="int4", sparse_topk=2,
                  sparse_block=8)
    with pytest.raises(ValueError, match="speculation"):
        BatchedEngine(params, CFG, xkv=_post_int4_xkv(), num_slots=1,
                      s_max=16, factor_dtype="int4", sparse_topk=2,
                      sparse_block=8, speculative_k=2)
