"""Speculative decoding: sparse-draft / exact-verify.

The contract is EXACTNESS: every emitted token comes from the exact verify
pass, so generate_speculative must equal plain exact greedy generation
bit-for-bit regardless of how good the sparse drafts are.
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


def xkv_cfg():
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )


def make_engine(params, **kw):
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("factor_dtype", jnp.float32)
    kw.setdefault("tail_max", 16)
    kw.setdefault("donate_cache", False)
    return InferenceEngine(params, CFG, xkv=xkv_cfg(), mode="factored", **kw)


def test_speculative_matches_exact_greedy(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 32)).astype(np.int32)
    eng_exact = make_engine(params)
    eng_spec = make_engine(params, sparse_topk=3, sparse_block=8)
    out_e = np.asarray(eng_exact.generate(prompt, max_new_tokens=12))
    out_s = np.asarray(eng_spec.generate_speculative(
        prompt, max_new_tokens=12, draft_k=4
    ))
    np.testing.assert_array_equal(out_s, out_e)


def test_speculative_across_refactorization(params):
    """max_new_tokens beyond tail capacity: the top-up + fold path keeps
    the output identical to exact generation (which folds on its own
    schedule)."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 32)).astype(np.int32)
    eng_exact = make_engine(params, tail_max=8)
    eng_spec = make_engine(params, tail_max=8, sparse_topk=3, sparse_block=8)
    out_e = np.asarray(eng_exact.generate(prompt, max_new_tokens=20))
    out_s = np.asarray(eng_spec.generate_speculative(
        prompt, max_new_tokens=20, draft_k=3
    ))
    np.testing.assert_array_equal(out_s, out_e)


def test_speculative_draft_acceptance_on_trained_model():
    """On the trained induction model (sparse drafts nearly exact), rounds
    accept multiple tokens — the speedup mechanism is real, not just the
    fallback path emitting one token per round."""
    from tests.test_accuracy_gate import CFG as T_CFG, M, make_batch
    from xkv_tpu.train.lm import train_lm

    rng = np.random.default_rng(2)
    params = init_params(T_CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    params, hist = train_lm(
        params, T_CFG, lambda i: make_batch(rng, 64), steps=300, lr=2e-3,
        log_every=100,
    )
    assert hist[-1] < 0.05
    full_rank = 2 * T_CFG.num_kv_heads * T_CFG.head_dim
    xkv = generate_consecutive_xkv_config(
        num_layers=T_CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=full_rank, rank_v=full_rank,
        extra_kwargs={"svd_method": "exact"},
    )
    x = rng.integers(2, T_CFG.vocab_size, size=(1, M)).astype(np.int32)
    prompt = np.concatenate(
        [np.ones((1, 1), np.int32), x, x[:, :4]], axis=1
    )
    eng_exact = InferenceEngine(
        params, T_CFG, xkv=xkv, mode="factored", tail_max=M,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    eng_spec = InferenceEngine(
        params, T_CFG, xkv=xkv, mode="factored", tail_max=M,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
        sparse_topk=3, sparse_block=8,
    )
    out_e = np.asarray(eng_exact.generate(prompt, max_new_tokens=M - 4))
    out_s, stats = eng_spec.generate_speculative(
        prompt, max_new_tokens=M - 4, draft_k=4, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(out_s), out_e)
    # retrieval succeeded (the model actually predicts the second copy)
    assert (out_e[0] == x[0, 4:]).mean() > 0.9
    # the drafts actually get accepted: >2 tokens per exact-attention round
    # on the predictable continuation (max possible is draft_k + 1 = 5)
    assert stats["tokens_per_round"] > 2.0, stats


def test_speculative_requires_sparse(params):
    eng = make_engine(params)
    with pytest.raises(ValueError, match="sparse_topk"):
        eng.generate_speculative(np.zeros((1, 8), np.int32), 4)


def test_speculative_pallas_verify_matches_exact(params):
    """attention_impl='pallas' routes the multi-token verify through the
    ql>1 fused kernel (interpret mode on CPU); output must still match the
    exact XLA engine bit-for-bit."""
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 32)).astype(np.int32)
    eng_exact = make_engine(params)  # xla
    eng_spec = make_engine(
        params, sparse_topk=3, sparse_block=8, attention_impl="pallas"
    )
    out_e = np.asarray(eng_exact.generate(prompt, max_new_tokens=10))
    out_s = np.asarray(eng_spec.generate_speculative(
        prompt, max_new_tokens=10, draft_k=4
    ))
    np.testing.assert_array_equal(out_s, out_e)


def test_batched_multitoken_with_sparse_falls_back_to_exact(params):
    """A 2-D (multi-token) decode_step_batched call with sparse_select set
    must not route into the single-token sparse kernels; it falls back to
    exact attention and matches the sparse-free call bit-for-bit."""
    from xkv_tpu.engine.batching import BatchedEngine

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, CFG.vocab_size, size=(16,)).astype(np.int32)
    xkv = xkv_cfg()
    be = BatchedEngine(
        params, CFG, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32, sparse_topk=2, sparse_block=8,
    )
    be.submit(prompt, 1)
    be._admit()
    from xkv_tpu.models import llama

    bc = be.batch_cache
    toks = jnp.tile(jnp.asarray([[3, 5, 7]], jnp.int32), (be.num_slots, 1))
    pos = jnp.asarray(be.pos, jnp.int32)
    plen = jnp.asarray(be.prefill_len, jnp.int32)
    tlen = jnp.asarray(be.tail_len, jnp.int32)
    logits_sparse, _ = llama.decode_step_batched(
        params, CFG, xkv, bc, toks, pos, plen, tlen, be._cos_sin,
        sparse_select=2, sparse_block=8,
    )
    logits_exact, _ = llama.decode_step_batched(
        params, CFG, xkv, bc, toks, pos, plen, tlen, be._cos_sin,
    )
    np.testing.assert_allclose(
        np.asarray(logits_sparse), np.asarray(logits_exact), rtol=0, atol=0
    )
