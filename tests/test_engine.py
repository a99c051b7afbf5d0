"""End-to-end engine correctness tests on a tiny random Llama.

Key invariants tested:
  1. Uncompressed decode == full-forward oracle (cache/RoPE/decode math).
  2. Prefill logits are identical across compression modes (the reference
     uses fresh local K for prefill attention, `xKV/attn_patch/llama.py:50`).
  3. factored mode == fake mode bit-near (the factored read path computes
     the same reconstruction the fake path materializes).
  4. Compression ratio accounting matches the configured ranks.
  5. SLERP mode runs end-to-end and gamma=1.0 equals no-compression.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params, prefill

CFG = tiny_llama_config()  # 4 layers, 4 q heads, 2 kv heads, hd 16


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(0)
    return rng.integers(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)


def make_engine(params, mode, xkv=None, **kw):
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("factor_dtype", jnp.float32)
    kw.setdefault("tail_max", 16)
    kw.setdefault("donate_cache", False)
    return InferenceEngine(params, CFG, xkv=xkv, mode=mode, **kw)


def xkv_cfg(group_size=2, rank_k=24, rank_v=24, **kw):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers,
        end_layer=CFG.num_layers - 1,
        group_size=group_size,
        rank_k=rank_k,
        rank_v=rank_v,
        extra_kwargs={"svd_method": "exact"},
        **kw,
    )


@pytest.mark.slow
def test_uncompressed_decode_matches_full_forward_oracle(params, prompt):
    """Greedy decode with the dense cache must match re-running the full
    prompt+generated prefix through the stateless forward."""
    eng = make_engine(params, "none")
    out = np.asarray(eng.generate(prompt, max_new_tokens=6))

    seq = np.asarray(prompt)
    for step in range(6):
        logits, _ = prefill(params, CFG, jnp.asarray(seq))
        expect = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        np.testing.assert_array_equal(out[:, step], expect)
        seq = np.concatenate([seq, expect[:, None].astype(np.int32)], axis=1)


def test_decode_step_logits_match_oracle(params, prompt):
    """Positionwise logits parity, not just argmax."""
    eng = make_engine(params, "none")
    logits_p, cache = eng.prefill(prompt)
    tok = jnp.argmax(logits_p[:, -1, :], axis=-1).astype(jnp.int32)
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    logits_d, cache = eng.decode_step(cache, tok[:, None], pos)

    full = np.concatenate([prompt, np.asarray(tok)[:, None]], axis=1)
    logits_full, _ = prefill(params, CFG, jnp.asarray(full))
    np.testing.assert_allclose(
        np.asarray(logits_d[:, -1]), np.asarray(logits_full[:, -1]), rtol=2e-4, atol=2e-4
    )


def test_prefill_logits_identical_across_modes(params, prompt):
    cfg = xkv_cfg()
    logits_none, _ = make_engine(params, "none").prefill(prompt)
    logits_fake, _ = make_engine(params, "fake", cfg).prefill(prompt)
    logits_fact, _ = make_engine(params, "factored", cfg).prefill(prompt)
    np.testing.assert_array_equal(np.asarray(logits_none), np.asarray(logits_fake))
    np.testing.assert_array_equal(np.asarray(logits_none), np.asarray(logits_fact))


def test_factored_matches_fake(params, prompt):
    """The real factored cache must reproduce the fake (dense-reconstruction)
    decode numerically: same factors, read lazily vs materialized."""
    cfg = xkv_cfg(group_size=2, rank_k=16, rank_v=20)
    eng_fake = make_engine(params, "fake", cfg)
    eng_fact = make_engine(params, "factored", cfg)

    logits_f, cache_f = eng_fake.prefill(prompt)
    logits_r, cache_r = eng_fact.prefill(prompt)
    tok = jnp.argmax(logits_f[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    pos = jnp.asarray(prompt.shape[1], jnp.int32)

    for _ in range(4):
        lf, cache_f = eng_fake.decode_step(cache_f, tok, pos)
        lr, cache_r = eng_fact.decode_step(cache_r, tok, pos)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=2e-3, atol=2e-3
        )
        tok = jnp.argmax(lf[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        pos = pos + 1


def test_single_svd_group_size_1(params, prompt):
    """Per-layer single SVD (reference comparison config, README.md:91-95)."""
    cfg = xkv_cfg(group_size=1, rank_k=8, rank_v=12)
    eng = make_engine(params, "factored", cfg)
    out = eng.generate(prompt, max_new_tokens=4)
    assert np.asarray(out).shape == (2, 4)


def test_merge_key_only(params, prompt):
    cfg = xkv_cfg(merge_value=False)
    eng = make_engine(params, "factored", cfg)
    _, cache = eng.prefill(prompt)
    assert cache.groups[0].k_us is not None
    assert cache.groups[0].v_us is None
    assert set(cache.dense_v.keys()) == set(range(CFG.num_layers))
    out = eng.generate(prompt, max_new_tokens=3)
    assert np.asarray(out).shape == (2, 3)


def test_partial_layer_coverage(params, prompt):
    """Groups covering only layers 1..2; others stay dense."""
    from xkv_tpu.configs import LayerGroup, XKVConfig

    cfg = XKVConfig(
        num_layers=CFG.num_layers,
        rank_k=16,
        rank_v=16,
        layer_groups=[LayerGroup(layers=[1, 2])],
        extra_kwargs={"svd_method": "exact"},
    )
    eng = make_engine(params, "factored", cfg)
    _, cache = eng.prefill(prompt)
    assert set(cache.dense_k.keys()) == {0, 3}
    out = eng.generate(prompt, max_new_tokens=3)
    assert np.asarray(out).shape == (2, 3)


def test_compression_ratio_accounting(params, prompt):
    s = prompt.shape[1]
    rank = 4
    cfg = xkv_cfg(group_size=2, rank_k=rank, rank_v=rank)
    _, cache = make_engine(params, "factored", cfg).prefill(prompt)
    b = prompt.shape[0]
    g_cols = 2 * CFG.num_kv_heads * CFG.head_dim
    per_group = 2 * (b * s * rank + b * rank * g_cols)  # K and V factors
    expected_elems = per_group * (CFG.num_layers // 2)
    assert cache.num_cache_bytes() == expected_elems * 4  # fp32 factors in tests
    dense = 2 * CFG.num_layers * b * CFG.num_kv_heads * s * CFG.head_dim
    # dense reference also at the cache dtype (fp32 here) -> same ratio
    assert abs(cache.compression_ratio(CFG) - dense / expected_elems) < 1e-6


@pytest.mark.slow
def test_slerp_gamma_one_equals_uncompressed(params, prompt):
    """gamma=1.0 -> no rows divergent -> merge is identity -> decode equals
    the uncompressed baseline."""
    cfg = generate_consecutive_xkv_config(
        layer_merge_impl="slerp",
        num_layers=CFG.num_layers,
        end_layer=CFG.num_layers - 1,
        group_size=2,
        slerp_t=0.5,
        slerp_gamma=1.0,
    )
    eng_slerp = make_engine(params, "fake", cfg)
    eng_none = make_engine(params, "none")
    out_s = np.asarray(eng_slerp.generate(prompt, max_new_tokens=5))
    out_n = np.asarray(eng_none.generate(prompt, max_new_tokens=5))
    np.testing.assert_array_equal(out_s, out_n)


def test_slerp_real_gamma_runs(params, prompt):
    cfg = generate_consecutive_xkv_config(
        layer_merge_impl="slerp",
        num_layers=CFG.num_layers,
        start_layer=2,
        end_layer=3,
        group_size=2,
        slerp_t=0.5,
        slerp_gamma=0.05,
    )
    eng = make_engine(params, "fake", cfg)
    out = eng.generate(prompt, max_new_tokens=4)
    assert np.asarray(out).shape == (2, 4)


def test_score_teacher_forcing_matches_oracle(params, prompt):
    """RNN-mode scoring equals full-forward log-softmax."""
    eng = make_engine(params, "none")
    _, cache = eng.prefill(prompt[:, :8])
    cont = prompt[:, 8:16]
    logprobs, _ = eng.score(cache, cont, jnp.asarray(8, jnp.int32))

    logits_full, _ = prefill(params, CFG, jnp.asarray(prompt[:, :16]))
    ref = jax.nn.log_softmax(logits_full[:, 8 - 1 + 1 :, :], axis=-1)
    # score() feeds cont[:, i] at pos 8+i and returns logprobs for the next
    # token; oracle position for cont[:, i] is logits at index 8+i.
    np.testing.assert_allclose(
        np.asarray(logprobs),
        np.asarray(jax.nn.log_softmax(logits_full[:, 8:16, :], axis=-1)),
        rtol=2e-4,
        atol=2e-4,
    )


@pytest.mark.slow
def test_pallas_attention_impl_matches_xla(params, prompt):
    """Full engine with attention_impl='pallas' (interpret mode on CPU) must
    match the XLA path: prefill flash kernel + fused low-rank decode kernel."""
    cfg = xkv_cfg(group_size=2, rank_k=16, rank_v=20)
    eng_xla = make_engine(params, "factored", cfg)
    eng_pl = make_engine(params, "factored", cfg, attention_impl="pallas")

    lx, cx = eng_xla.prefill(prompt)
    lp, cp = eng_pl.prefill(prompt)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=2e-3, atol=2e-3)

    tok = jnp.argmax(lx[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    for _ in range(3):
        ox, cx = eng_xla.decode_step(cx, tok, pos)
        op, cp = eng_pl.decode_step(cp, tok, pos)
        np.testing.assert_allclose(
            np.asarray(op), np.asarray(ox), rtol=5e-3, atol=5e-3
        )
        tok = jnp.argmax(ox[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        pos = pos + 1


def test_int8_factors_close_to_fp32(params, prompt):
    """Quantized factor cache: decode logits within int8 tolerance of the
    fp32 factored path; compression ratio doubles."""
    cfg = xkv_cfg(group_size=2, rank_k=24, rank_v=24)
    eng_f = make_engine(params, "factored", cfg)
    eng_q = make_engine(params, "factored", cfg, factor_dtype="int8")

    lf, cf = eng_f.prefill(prompt)
    lq, cq = eng_q.prefill(prompt)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lq))  # prefill clean

    assert cq.groups[0].k_us.dtype == jnp.int8
    assert cq.groups[0].k_scale is not None
    # int8 halves factor bytes vs fp32... ratio should be ~4x the fp32 one
    # (fp32 factors are 4B vs int8 1B + small scales)
    assert cq.compression_ratio(CFG) > 2 * cf.compression_ratio(CFG)

    tok = jnp.argmax(lf[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    of, cf = eng_f.decode_step(cf, tok, pos)
    oq, cq = eng_q.decode_step(cq, tok, pos)
    # int8 quantization error on logits: loose but meaningful bound
    err = np.max(np.abs(np.asarray(of) - np.asarray(oq)))
    ref = np.max(np.abs(np.asarray(of)))
    assert err < 0.1 * ref + 0.3, f"int8 drift too large: {err} vs {ref}"


@pytest.mark.slow
def test_int8_pallas_matches_int8_xla(params, prompt):
    cfg = xkv_cfg(group_size=2, rank_k=16, rank_v=16)
    eng_x = make_engine(params, "factored", cfg, factor_dtype="int8")
    eng_p = make_engine(
        params, "factored", cfg, factor_dtype="int8", attention_impl="pallas"
    )
    lx, cx = eng_x.prefill(prompt)
    lp, cp = eng_p.prefill(prompt)
    tok = jnp.argmax(lx[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    ox, _ = eng_x.decode_step(cx, tok, pos)
    op, _ = eng_p.decode_step(cp, tok, pos)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox), rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_refactorize_extends_generation(params, prompt):
    """A tiny tail (4) with refactorization generates 10 tokens; with a
    full-rank (lossless) factorization the output must match the
    uncompressed baseline even across refactorization boundaries."""
    full_rank = 2 * CFG.num_kv_heads * CFG.head_dim  # lossless for group of 2
    cfg = xkv_cfg(group_size=2, rank_k=full_rank, rank_v=full_rank)
    eng_f = make_engine(params, "factored", cfg, tail_max=4)
    eng_n = make_engine(params, "none", tail_max=16)
    out_f = np.asarray(eng_f.generate(prompt, max_new_tokens=10))
    out_n = np.asarray(eng_n.generate(prompt, max_new_tokens=10))
    np.testing.assert_array_equal(out_f, out_n)


def test_refactorize_grows_prefill_len(params, prompt):
    cfg = xkv_cfg(group_size=2, rank_k=16, rank_v=16)
    eng = make_engine(params, "factored", cfg, tail_max=4)
    _, cache = eng.prefill(prompt)
    s0 = cache.prefill_len
    # fill the tail
    tok = jnp.zeros((prompt.shape[0], 1), jnp.int32)
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    for i in range(4):
        _, cache = eng.decode_step(cache, tok, pos + i)
    cache2 = eng.refactorize(cache)
    assert cache2.prefill_len == s0 + 4
    assert int(jax.device_get(cache2.tail_len)) == 0
    # still decodable
    logits, _ = eng.decode_step(cache2, tok, pos + 4)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_refactorize_int8_roundtrip(params, prompt):
    """Refactorization dequantizes, re-SVDs, and requantizes int8 factors."""
    cfg = xkv_cfg(group_size=2, rank_k=24, rank_v=24)
    eng = make_engine(params, "factored", cfg, tail_max=4, factor_dtype="int8")
    _, cache = eng.prefill(prompt)
    tok = jnp.zeros((prompt.shape[0], 1), jnp.int32)
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    for i in range(4):
        _, cache = eng.decode_step(cache, tok, pos + i)
    cache2 = eng.refactorize(cache)
    assert cache2.groups[0].k_us.dtype == jnp.int8
    assert cache2.groups[0].k_scale is not None
    assert cache2.prefill_len == prompt.shape[1] + 4
    logits, _ = eng.decode_step(cache2, tok, pos + 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_cache_save_load_roundtrip(params, prompt, tmp_path):
    """Persisted compressed cache resumes decoding with identical logits."""
    from xkv_tpu.engine.cache_io import load_cache, save_cache

    cfg = xkv_cfg(group_size=2, rank_k=16, rank_v=16)
    eng = make_engine(params, "factored", cfg)
    _, cache = eng.prefill(prompt)
    path = str(tmp_path / "session.npz")
    save_cache(cache, path, metadata={"prompt_len": int(prompt.shape[1])})

    # fresh engine in a "new process"
    eng2 = make_engine(params, "factored", cfg)
    _, like = eng2.prefill(prompt * 0)  # same shapes, different content
    restored, meta = load_cache(path, like)
    assert meta["prompt_len"] == prompt.shape[1]

    tok = jnp.zeros((prompt.shape[0], 1), jnp.int32)
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    l_orig, _ = eng.decode_step(cache, tok, pos)
    l_rest, _ = eng2.decode_step(restored, tok, pos)
    np.testing.assert_array_equal(np.asarray(l_orig), np.asarray(l_rest))


def test_cache_load_rejects_mismatched_config(params, prompt, tmp_path):
    from xkv_tpu.engine.cache_io import load_cache, save_cache

    cfg_a = xkv_cfg(group_size=2, rank_k=16, rank_v=16)
    eng_a = make_engine(params, "factored", cfg_a)
    _, cache_a = eng_a.prefill(prompt)
    path = str(tmp_path / "a.npz")
    save_cache(cache_a, path)

    cfg_b = xkv_cfg(group_size=2, rank_k=8, rank_v=8)
    eng_b = make_engine(params, "factored", cfg_b)
    _, like_b = eng_b.prefill(prompt)
    with pytest.raises(ValueError, match="mismatch"):
        load_cache(path, like_b)


def test_prefill_last_logits_matches_full(params, prompt):
    """prefill_logits='last' unembeds only the final position — identical
    values to the full unembed's last row, (b, 1, V)-shaped."""
    cfg = xkv_cfg()
    eng_all = make_engine(params, "factored", cfg)
    eng_last = make_engine(params, "factored", cfg, prefill_logits="last")
    la, ca = eng_all.prefill(prompt)
    ll, cl = eng_last.prefill(prompt)
    assert ll.shape == (prompt.shape[0], 1, la.shape[-1])
    np.testing.assert_allclose(np.asarray(ll[:, 0]), np.asarray(la[:, -1]),
                               rtol=1e-6, atol=1e-6)
    # caches are unaffected
    np.testing.assert_allclose(np.asarray(cl.groups[0].k_us),
                               np.asarray(ca.groups[0].k_us), rtol=1e-6)


@pytest.mark.slow
def test_sliding_window_perplexity_matches_manual(params):
    """score_text_sliding_window == token-weighted aggregate of per-window
    score_text_tokens (reference eval_perplexity_rnn.py:138-181 semantics),
    and a short sequence scored windowed with max_length >= len equals the
    plain path."""
    from xkv_tpu.evalharness.perplexity import (
        score_text_sliding_window,
        score_text_tokens,
    )

    rng = np.random.default_rng(7)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 40)).astype(np.int32)
    eng = make_engine(params, "none")

    win = score_text_sliding_window(eng, ids, max_length=16, stride=12)
    total_ll = total_tok = 0.0
    for begin in range(0, 40, 12):
        end = min(begin + 16, 40)
        r = score_text_tokens(eng, ids[:, begin:end])
        total_ll += r["avg_log_likelihood"] * r["total_tokens"]
        total_tok += r["total_tokens"]
        if end == 40:
            break
    assert win["total_tokens"] == total_tok
    np.testing.assert_allclose(
        win["perplexity"], np.exp(-total_ll / total_tok), rtol=1e-6
    )

    whole = score_text_tokens(eng, ids)
    one_win = score_text_sliding_window(eng, ids, max_length=64, stride=64)
    np.testing.assert_allclose(
        one_win["perplexity"], whole["perplexity"], rtol=1e-6
    )


# ------------------------------------------------------------ staged prefill
def _staged_pair(params, xkv, **kw):
    mono = make_engine(params, "factored", xkv, prefill_logits="last", **kw)
    staged = make_engine(params, "factored", xkv, prefill_logits="last",
                         staged_prefill=True, **kw)
    return mono, staged


@pytest.mark.parametrize("rope_mode", ["pre", "post"])
def test_staged_prefill_matches_monolithic(params, prompt, rope_mode):
    """Per-group staged prefill (depth-scaling path, VERDICT r4 #3) must
    reproduce the monolithic prefill: same logits, same cache, same decode
    trajectory — it runs the SAME `_prefill_layer` body and
    `compress_svd_group`, just one jit per group."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
        group_size=2, rank_k=16, rank_v=20,
        extra_kwargs={"svd_method": "exact", "rope_mode": rope_mode},
    )
    mono, staged = _staged_pair(params, xkv)

    lm, cm = mono.prefill(prompt)
    ls, cs = staged.prefill(prompt)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ls),
                               rtol=1e-4, atol=1e-4)
    assert len(cm.groups) == len(cs.groups)
    for gm, gs in zip(cm.groups, cs.groups):
        for f in ("k_us", "k_vt", "v_us", "v_vt"):
            am, as_ = getattr(gm, f), getattr(gs, f)
            assert (am is None) == (as_ is None)
            if am is not None:
                np.testing.assert_allclose(
                    np.asarray(am), np.asarray(as_), rtol=1e-3, atol=1e-3
                )

    tok = jnp.argmax(lm[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    for _ in range(3):
        dm, cm = mono.decode_step(cm, tok, pos)
        ds, cs = staged.decode_step(cs, tok, pos)
        np.testing.assert_allclose(np.asarray(dm), np.asarray(ds),
                                   rtol=2e-3, atol=2e-3)
        tok = jnp.argmax(dm[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        pos = pos + 1


def test_staged_prefill_int8_and_sparse_bounds(params, prompt):
    """int8 factors + Quest chunk bounds flow through the staged path."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
        group_size=2, rank_k=16, rank_v=20,
        extra_kwargs={"svd_method": "exact", "rope_mode": "post"},
    )
    mono, staged = _staged_pair(
        params, xkv, factor_dtype="int8", sparse_topk=2, sparse_block=8,
    )
    lm, cm = mono.prefill(prompt)
    ls, cs = staged.prefill(prompt)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ls),
                               rtol=1e-4, atol=1e-4)
    for gm, gs in zip(cm.groups, cs.groups):
        assert gm.k_us.dtype == gs.k_us.dtype == jnp.int8
        assert gs.k_cmin is not None and gs.k_cmax is not None
        np.testing.assert_allclose(
            np.asarray(gm.k_cmin), np.asarray(gs.k_cmin),
            rtol=1e-3, atol=1e-3,
        )


def test_staged_prefill_partial_coverage(params, prompt):
    """Ungrouped (dense) layers interleave correctly with grouped spans."""
    xkv = generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=1, group_size=2,
        rank_k=16, rank_v=20, extra_kwargs={"svd_method": "exact"},
    )
    mono, staged = _staged_pair(params, xkv)
    lm, cm = mono.prefill(prompt)
    ls, cs = staged.prefill(prompt)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(ls),
                               rtol=1e-4, atol=1e-4)
    assert sorted(cs.dense_k) == sorted(cm.dense_k)
    for l in cm.dense_k:
        np.testing.assert_allclose(
            np.asarray(cm.dense_k[l]), np.asarray(cs.dense_k[l]),
            rtol=1e-4, atol=1e-4,
        )


def test_staged_prefill_rejects_unsupported(params):
    with pytest.raises(ValueError):
        make_engine(params, "none", staged_prefill=True)
    with pytest.raises(ValueError):
        make_engine(params, "factored", xkv_cfg(), staged_prefill=True,
                    prefill_logits="all")
