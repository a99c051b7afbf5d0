"""Induction-retrieval accuracy gate for rope_mode="post".

Same offline methodology as tests/test_accuracy_gate.py (trained tiny
model, recall of a repeated segment through the compressed cache — pure
KV retrieval, the mechanism RULER's niah measures). Pins the shape of
the pre-vs-post accuracy trade measured in scripts/rope_mode_study.py
(docs/ROPE_MODES.md):

  * at the xKV operating compression (~8-12x here), post-RoPE
    factorization retains retrieval accuracy (parity with pre);
  * well beyond it (24x), post degrades FASTER than pre — the
    higher post-domain truncation error is real, it just doesn't bite
    until far past the operating point.

NOTE (round 3): at PRODUCTION geometry (head_dim 128, 8 KV heads,
group 4, 16K rows) the post-mode cost appears already at the 8x
operating point (-0.10 ordered recall) while pre stays exactly free —
scripts/rope_mode_study_production.py and docs/ROPE_MODES.md carry the
full study. This toy gate still pins the qualitative ordering.
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

M = 24
CFG = tiny_llama_config(
    vocab_size=64, hidden_size=96, intermediate_size=192,
    num_layers=3, num_q_heads=4, num_kv_heads=2, head_dim=24,
)


def make_batch(rng, batch):
    x = rng.integers(2, CFG.vocab_size, size=(batch, M)).astype(np.int32)
    tokens = np.concatenate([np.ones((batch, 1), np.int32), x, x], axis=1)
    mask = np.zeros_like(tokens, np.float32)
    mask[:, M + 1:] = 1.0
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


def recall(params, rank, mode, n=32, seed=123, keep=4):
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
        group_size=2, rank_k=rank, rank_v=rank,
        extra_kwargs={"svd_method": "exact", "rope_mode": mode},
    )
    eng = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored", tail_max=M,
        donate_cache=False, cache_dtype=jnp.float32,
        factor_dtype=jnp.float32,
    )
    rng = np.random.default_rng(seed)
    x = rng.integers(2, CFG.vocab_size, size=(n, M)).astype(np.int32)
    prompts = np.concatenate(
        [np.ones((n, 1), np.int32), x, x[:, :keep]], axis=1
    )
    out = np.asarray(eng.generate(prompts, max_new_tokens=M - keep))
    return float((out == x[:, keep:]).mean())


def test_post_parity_at_operating_compression(trained_params):
    """~12x compression (rank 8 of 96): post matches pre within noise."""
    a_pre = recall(trained_params, 8, "pre")
    a_post = recall(trained_params, 8, "post")
    assert a_post >= 0.9, f"post recall collapsed: {a_post}"
    assert a_post >= a_pre - 0.05, f"post {a_post} vs pre {a_pre}"


def test_post_degrades_faster_past_operating_point(trained_params):
    """24x compression (rank 4): the post-domain rank penalty is real —
    both degrade, post faster (the knob measures something)."""
    a_pre = recall(trained_params, 4, "pre")
    a_post = recall(trained_params, 4, "post")
    assert a_pre < 0.9 and a_post < 0.9  # both clearly degraded
    assert a_post <= a_pre + 0.05  # post never mysteriously better here


def test_int4_mixed_accuracy_neutral_at_operating_point(trained_params):
    """Mixed int8+int4 factors at ~12x rank compression: within noise of
    fp32 factors (the int4 tail holds the lowest singular energy —
    docs/ROPE_MODES.md table, measured 2026-08-21)."""
    a_f32 = recall(trained_params, 8, "post")
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
        group_size=2, rank_k=8, rank_v=8,
        extra_kwargs={"svd_method": "exact", "rope_mode": "post"},
    )
    eng = InferenceEngine(
        params=trained_params, cfg=CFG, xkv=xkv, mode="factored",
        tail_max=M, donate_cache=False, cache_dtype=jnp.float32,
        factor_dtype="int4",
    )
    rng = np.random.default_rng(123)
    x = rng.integers(2, CFG.vocab_size, size=(32, M)).astype(np.int32)
    prompts = np.concatenate(
        [np.ones((32, 1), np.int32), x, x[:, :4]], axis=1
    )
    out = np.asarray(eng.generate(prompts, max_new_tokens=M - 4))
    a_i4 = float((out == x[:, 4:]).mean())
    assert a_i4 >= a_f32 - 0.05, f"int4 {a_i4} vs f32 {a_f32}"
