"""Offline accuracy gate: a trained induction model measures the real
accuracy impact of KV compression.

No network -> no Llama checkpoints, so instead a tiny model is trained in
the test (~1 min on CPU) on the induction task: sequences are
``[bos, x_1..x_m, x_1..x_m]`` and the model learns to continue the second
copy by attending back to the first — pure KV-cache retrieval, the
mechanism RULER's niah measures. Generation must recover the rest of the
sequence by reading the (compressed) prefill cache, so we can assert:

  * uncompressed and full-rank factored decode retain trained accuracy;
  * moderate-rank xKV compression stays close;
  * extreme compression degrades (the knob is real).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params
from xkv_tpu.train.lm import train_lm

# In-suite model training / long end-to-end generations (fast tier: -m 'not slow')
pytestmark = pytest.mark.slow

M = 24  # repeated-segment length
CFG = tiny_llama_config(
    vocab_size=64,
    hidden_size=96,
    intermediate_size=192,
    num_layers=3,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=24,
)
FULL_RANK = 2 * CFG.num_kv_heads * CFG.head_dim  # group of 2 -> lossless


def make_batch(rng: np.random.Generator, batch: int):
    x = rng.integers(2, CFG.vocab_size, size=(batch, M)).astype(np.int32)
    tokens = np.concatenate([np.ones((batch, 1), np.int32), x, x], axis=1)
    mask = np.zeros_like(tokens, np.float32)
    mask[:, M + 1 :] = 1.0  # score the entire second copy
    return tokens, mask


@pytest.fixture(scope="module")
def trained_params():
    rng = np.random.default_rng(0)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    params, history = train_lm(
        params, CFG, lambda i: make_batch(rng, 64), steps=300, lr=2e-3,
        log_every=100,
    )
    assert history[-1] < 0.05, f"induction task did not train: {history}"
    return params


def make_engine(params, mode, xkv=None, **kw):
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("factor_dtype", jnp.float32)
    return InferenceEngine(
        params, CFG, xkv=xkv, mode=mode, tail_max=M, donate_cache=False, **kw
    )


def recall_accuracy(engine, n: int = 32, seed: int = 123, keep: int = 4) -> float:
    """Prompt = bos + x + x[:keep]; greedy-generate the remaining M - keep
    tokens and score exact-match per token."""
    rng = np.random.default_rng(seed)
    x = rng.integers(2, CFG.vocab_size, size=(n, M)).astype(np.int32)
    prompts = np.concatenate([np.ones((n, 1), np.int32), x, x[:, :keep]], axis=1)
    expected = x[:, keep:]
    out = np.asarray(engine.generate(prompts, max_new_tokens=M - keep))
    return float((out == expected).mean())


def xkv_with_rank(rank):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=-1, group_size=2,
        rank_k=rank, rank_v=rank, extra_kwargs={"svd_method": "exact"},
    )


def test_compression_accuracy_gate(trained_params):
    acc_base = recall_accuracy(make_engine(trained_params, "none"))
    assert acc_base > 0.95, f"base model failed induction: {acc_base}"

    acc_full = recall_accuracy(
        make_engine(trained_params, "factored", xkv_with_rank(FULL_RANK))
    )
    assert acc_full == acc_base, "lossless factorization changed accuracy"

    acc_half = recall_accuracy(
        make_engine(trained_params, "factored", xkv_with_rank(FULL_RANK // 2))
    )
    assert acc_half >= acc_base - 0.10, (
        f"2x compression lost too much: {acc_base} -> {acc_half}"
    )

    acc_tiny = recall_accuracy(
        make_engine(trained_params, "factored", xkv_with_rank(2))
    )
    assert acc_tiny < acc_base - 0.2, "rank-2 compression should degrade recall"
    print(
        f"\naccuracy gate: base={acc_base:.3f} full={acc_full:.3f} "
        f"half={acc_half:.3f} rank2={acc_tiny:.3f}"
    )


def test_int8_factors_accuracy(trained_params):
    acc_base = recall_accuracy(make_engine(trained_params, "none"))
    acc_q = recall_accuracy(
        make_engine(
            trained_params, "factored", xkv_with_rank(FULL_RANK // 2),
            factor_dtype="int8",
        )
    )
    assert acc_q >= acc_base - 0.12, f"int8 factors lost accuracy: {acc_q}"


def test_sparse_topk_accuracy(trained_params):
    """Sparse top-k decode on the retrieval task: full chunk coverage is
    exact; dropping a quarter of the chunks must keep recall close (the
    landmark scores are content-matched — precisely the induction-head
    query — so the needed chunk ranks high)."""
    xkv = xkv_with_rank(FULL_RANK)
    acc_full = recall_accuracy(make_engine(trained_params, "factored", xkv))
    # prompt len = 1 + M + keep = 29 -> 4 chunks of 8
    acc_all = recall_accuracy(
        make_engine(
            trained_params, "factored", xkv, sparse_topk=4, sparse_block=8
        )
    )
    assert acc_all == acc_full, "full-coverage sparse changed accuracy"
    acc_3of4 = recall_accuracy(
        make_engine(
            trained_params, "factored", xkv, sparse_topk=3, sparse_block=8
        )
    )
    assert acc_3of4 >= acc_full - 0.10, (
        f"sparse 3/4 lost too much recall: {acc_full} -> {acc_3of4}"
    )
    print(f"\nsparse gate: full={acc_full:.3f} all={acc_all:.3f} "
          f"3of4={acc_3of4:.3f}")


def test_fake_mode_matches_factored_accuracy(trained_params):
    """Reference-parity fake mode and the real factored cache agree on
    task accuracy at the same rank."""
    xkv = xkv_with_rank(FULL_RANK // 2)
    acc_fake = recall_accuracy(make_engine(trained_params, "fake", xkv))
    acc_fact = recall_accuracy(make_engine(trained_params, "factored", xkv))
    assert abs(acc_fake - acc_fact) <= 0.05
