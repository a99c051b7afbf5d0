"""rope_mode="post" — post-RoPE factored cache (rank-space decode).

The TPU decode-optimal scheme rotates keys at their prefill positions
BEFORE the cross-layer SVD (configs.py:rope_mode), so decode attention
runs entirely in rank space with no per-step reconstruction. These tests
pin its correctness:

  1. Full-rank post-mode factored decode == uncompressed decode (the
     factorization of the rotated group matrix is lossless at full rank).
  2. factored == fake in post mode (the read path computes exactly what
     the fake path materializes).
  3. The rank-space absorbed formulation == reconstruct-then-attend over
     the same post-RoPE factors.
  4. Tail refactorization round-trips in post mode (tail keys join the
     factors without un-rotation).
  5. Int8-quantized post factors stay close.
  6. Sparse top-k decode works over post-RoPE factors.
  7. Config validation + YAML round-trip of rope_mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import XKVConfig, generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params

# In-suite model training / long end-to-end generations (fast tier: -m 'not slow')
pytestmark = pytest.mark.slow

CFG = tiny_llama_config()  # 4 layers, 4 q heads, 2 kv heads, hd 16
FULL_RANK_K = 2 * CFG.num_kv_heads * CFG.head_dim  # group of 2, lossless


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(1)
    return rng.integers(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)


def make_engine(params, mode, xkv=None, **kw):
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("factor_dtype", jnp.float32)
    kw.setdefault("tail_max", 16)
    kw.setdefault("donate_cache", False)
    return InferenceEngine(params, CFG, xkv=xkv, mode=mode, **kw)


def xkv_cfg(rope_mode="post", group_size=2, rank_k=FULL_RANK_K,
            rank_v=FULL_RANK_K, **extra):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers,
        end_layer=CFG.num_layers - 1,
        group_size=group_size,
        rank_k=rank_k,
        rank_v=rank_v,
        extra_kwargs={"svd_method": "exact", "rope_mode": rope_mode, **extra},
    )


def test_full_rank_post_matches_uncompressed(params, prompt):
    out_none = np.asarray(
        make_engine(params, "none").generate(prompt, max_new_tokens=8)
    )
    out_post = np.asarray(
        make_engine(params, "factored", xkv_cfg()).generate(
            prompt, max_new_tokens=8
        )
    )
    np.testing.assert_array_equal(out_none, out_post)


def test_factored_matches_fake_post_mode(params, prompt):
    cfg = xkv_cfg(rank_k=12, rank_v=12)
    lf, cf = make_engine(params, "factored", cfg).prefill(prompt)
    lk, ck = make_engine(params, "fake", cfg).prefill(prompt)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lk), atol=1e-5)

    eng_f = make_engine(params, "factored", cfg)
    eng_k = make_engine(params, "fake", cfg)
    tok = jnp.argmax(lf[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    df, _ = eng_f.decode_step(cf, tok, pos)
    dk, _ = eng_k.decode_step(ck, tok, pos)
    np.testing.assert_allclose(
        np.asarray(df[:, -1]), np.asarray(dk[:, -1]), rtol=2e-4, atol=2e-4
    )


def test_rankspace_equals_reconstruct_oracle():
    """(q.vt^T).us^T == q.(us.vt)^T over random factors, incl. lse."""
    from xkv_tpu.ops.attention import (
        factored_decode_attention_xla,
        rankspace_decode_attention_xla,
    )

    rng = jax.random.PRNGKey(2)
    b, hq, hkv, hd, s, rk, rv = 2, 4, 2, 16, 40, 12, 10
    m = hkv * hd
    ks = jax.random.split(rng, 6)
    q = jax.random.normal(ks[0], (b, hq, 1, hd), jnp.float32)
    k_us = jax.random.normal(ks[1], (b, s, rk), jnp.float32)
    k_vt = jax.random.normal(ks[2], (b, rk, m), jnp.float32)
    v_us = jax.random.normal(ks[3], (b, s, rv), jnp.float32)
    v_vt = jax.random.normal(ks[4], (b, rv, m), jnp.float32)
    zeros = jnp.zeros((s, hd), jnp.float32)
    lengths = jnp.asarray([s, s - 7], jnp.int32)

    ref = factored_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, zeros, zeros, 0.25, hkv,
        valid_len=lengths, pre_rotated=True,
    )
    got = rankspace_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, 0.25, hkv, valid_len=lengths
    )
    np.testing.assert_allclose(
        np.asarray(got.out), np.asarray(ref.out), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.lse), np.asarray(ref.lse), rtol=1e-4, atol=1e-4
    )


def test_refactorize_post_mode(params, prompt):
    """Filling the tail then folding it back must preserve greedy output
    at full rank (tail keys join the rotated factors without un-rotation)."""
    cfg = xkv_cfg()
    eng = make_engine(params, "factored", cfg, tail_max=4)
    out = np.asarray(eng.generate(prompt, max_new_tokens=10))
    out_none = np.asarray(
        make_engine(params, "none", tail_max=16).generate(
            prompt, max_new_tokens=10
        )
    )
    np.testing.assert_array_equal(out, out_none)


def test_int8_post_factors_close(params, prompt):
    cfg = xkv_cfg()
    out_f32 = np.asarray(
        make_engine(params, "factored", cfg).generate(prompt, max_new_tokens=6)
    )
    eng8 = make_engine(params, "factored", cfg, factor_dtype="int8")
    out_i8 = np.asarray(eng8.generate(prompt, max_new_tokens=6))
    assert (out_f32 == out_i8).mean() >= 0.8


def test_sparse_post_mode_runs(params, prompt):
    """Sparse top-k over post-RoPE factors: with every chunk selected the
    result equals the dense rank-space path."""
    cfg = xkv_cfg()
    eng_d = make_engine(params, "factored", cfg)
    eng_s = make_engine(
        params, "factored", cfg, sparse_topk=64, sparse_block=8
    )
    out_d = np.asarray(eng_d.generate(prompt, max_new_tokens=6))
    out_s = np.asarray(eng_s.generate(prompt, max_new_tokens=6))
    np.testing.assert_array_equal(out_d, out_s)


def test_post_pallas_engine_matches_xla(params, prompt):
    """attention_impl='pallas' (interpret on CPU) routes through the
    rank-space kernel and must match the XLA rank-space path."""
    cfg = xkv_cfg(rank_k=12, rank_v=12)
    out_x = np.asarray(
        make_engine(params, "factored", cfg, attention_impl="xla").generate(
            prompt, max_new_tokens=6
        )
    )
    out_p = np.asarray(
        make_engine(params, "factored", cfg, attention_impl="pallas").generate(
            prompt, max_new_tokens=6
        )
    )
    np.testing.assert_array_equal(out_x, out_p)


def test_post_speculative_bit_exact(params, prompt):
    """Speculative decoding in post mode: sparse drafts + exact rank-space
    verify == plain greedy decode."""
    cfg = xkv_cfg()
    eng = make_engine(
        params, "factored", cfg, sparse_topk=2, sparse_block=8, tail_max=16
    )
    plain = np.asarray(
        make_engine(params, "factored", cfg).generate(
            prompt[:1], max_new_tokens=10
        )
    )
    spec = np.asarray(
        eng.generate_speculative(prompt[:1], max_new_tokens=10, draft_k=4)
    )
    np.testing.assert_array_equal(plain[0, :spec.shape[1]], spec[0])


def test_post_batched_matches_single_stream(params):
    """Continuous batching in post mode == single-sequence engine."""
    from xkv_tpu.engine.batching import BatchedEngine

    rng = np.random.default_rng(3)
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(16,)).astype(np.int32)
        for _ in range(2)
    ]
    n_new = 4
    cfg = xkv_cfg(rank_k=24, rank_v=24)
    expected = []
    for p in prompts:
        eng = make_engine(params, "factored", cfg, tail_max=n_new + 2)
        expected.append(
            np.asarray(eng.generate(p[None, :], n_new))[0].tolist()
        )
    be = BatchedEngine(
        params, CFG, xkv=cfg, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    done = be.run()
    by_id = {r.request_id: r.generated for r in done}
    for rid, p_exp in zip(ids, expected):
        assert by_id[rid] == p_exp


def test_rope_mode_validation_and_yaml(tmp_path):
    cfg = xkv_cfg(rank_k=12, rank_v=12)
    assert cfg.rope_mode == "post"
    p = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(p)
    loaded = XKVConfig.from_yaml(p)
    assert loaded.rope_mode == "post"
    assert [g.layers for g in loaded.layer_groups] == [
        g.layers for g in cfg.layer_groups
    ]

    bad = generate_consecutive_xkv_config(
        layer_merge_impl="slerp",
        num_layers=CFG.num_layers,
        end_layer=CFG.num_layers - 1,
        group_size=2,
        extra_kwargs={"rope_mode": "post"},
    )
    with pytest.raises(ValueError, match="svd scheme"):
        _ = bad.rope_mode
    with pytest.raises(ValueError, match="pre.*post|post.*pre"):
        _ = generate_consecutive_xkv_config(
            num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
            group_size=2, rank_k=8, rank_v=8,
            extra_kwargs={"rope_mode": "sideways"},
        ).rope_mode


def test_post_batched_refactorization_extends_generation(params):
    """Slot-level tail folds in post mode: the post-RoPE tail joins the
    rotated factors with no un-rotation; at full rank the output must
    match the uncompressed baseline across fold boundaries."""
    from xkv_tpu.engine.batching import BatchedEngine

    cfg = xkv_cfg()  # full rank, post
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, CFG.vocab_size, size=(12,)).astype(np.int32)
               for _ in range(2)]
    n_new = 10  # > 2 folds at tail_max=4

    expected = []
    for p in prompts:
        eng = make_engine(params, "none", tail_max=n_new + 2)
        expected.append(
            np.asarray(eng.generate(p[None, :], n_new))[0].tolist()
        )
    be = BatchedEngine(
        params, CFG, xkv=cfg, num_slots=2, s_max=32, tail_max=4,
        prefill_buckets=[16],
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, exp in zip(ids, expected):
        assert by_id[rid] == exp


def test_int4_mixed_factors_close(params, prompt):
    """factor_dtype='int4' (mixed int8 top ranks + packed int4 tail):
    greedy output stays close to fp32 factors; XLA == pallas kernel; the
    stored cache is smaller than int8."""
    cfg = xkv_cfg()
    out_f32 = np.asarray(
        make_engine(params, "factored", cfg).generate(prompt, max_new_tokens=6)
    )
    eng4 = make_engine(params, "factored", cfg, factor_dtype="int4")
    out_i4 = np.asarray(eng4.generate(prompt, max_new_tokens=6))
    assert (out_f32 == out_i4).mean() >= 0.7

    eng4p = make_engine(
        params, "factored", cfg, factor_dtype="int4",
        attention_impl="pallas",
    )
    out_i4p = np.asarray(eng4p.generate(prompt, max_new_tokens=6))
    np.testing.assert_array_equal(out_i4, out_i4p)

    # The sequence-proportional us stream (what decode bandwidth pays for)
    # shrinks; the duplicated small vt/scale bases are s-independent.
    # Explicit rank below the row count so factorize doesn't clip the
    # int4 tail away at this tiny sequence length.
    cfg16 = xkv_cfg(rank_k=16, rank_v=16)
    _, c4 = make_engine(
        params, "factored", cfg16, factor_dtype="int4"
    ).prefill(prompt)
    _, c8 = make_engine(
        params, "factored", cfg16, factor_dtype="int8"
    ).prefill(prompt)

    def us_bytes(c):
        g = c.groups[0]
        total = 0
        for f in (g.k_us, g.k_us4, g.v_us, g.v_us4):
            if f is not None:
                total += f.size * f.dtype.itemsize
        return total

    assert us_bytes(c4) < 0.7 * us_bytes(c8)


def test_int4_refactorize_runs(params, prompt):
    """Tail folds re-quantize into the mixed format and generation
    continues (same rank split)."""
    cfg = xkv_cfg()
    eng = make_engine(params, "factored", cfg, factor_dtype="int4",
                      tail_max=4)
    out = np.asarray(eng.generate(prompt, max_new_tokens=10))
    assert out.shape == (2, 10)


def test_int4_validation():
    params_l = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    pre_cfg = xkv_cfg(rope_mode="pre")
    with pytest.raises(ValueError, match="rope_mode='post'"):
        make_engine(params_l, "factored", pre_cfg, factor_dtype="int4")
    cfg = xkv_cfg()
    # sparse x int4 composes since round 4 (rank-space gathered rows;
    # parity in tests/test_sparse.py) — construction must succeed.
    make_engine(params_l, "factored", cfg, factor_dtype="int4",
                sparse_topk=4)
    from xkv_tpu.engine.batching import BatchedEngine

    # Batched int4 is supported since round 3 (tests/test_batching.py);
    # remaining guard: admission buckets must not clamp the SVD rank below
    # the configured rank (packed layout alignment).
    with pytest.raises(ValueError, match="bucket"):
        BatchedEngine(params_l, CFG, xkv=cfg, num_slots=2, s_max=16,
                      tail_max=4, prefill_buckets=[16],
                      factor_dtype="int4")
