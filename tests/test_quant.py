"""Unit tests for int8 / mixed int8+int4 factor quantization
(`xkv_tpu/compress/quant.py`) — the storage format behind the factored
decode kernels. Reference parity target is the bf16 factored cache; these
pin the quantization error budget that the engine-level agreement tests
ride on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.compress.quant import (
    dequantize_k,
    dequantize_k_mixed,
    dequantize_v,
    quantize_k_factors,
    quantize_k_factors_mixed,
    quantize_v_factors,
)


@pytest.fixture
def factors():
    """Random factors with an SVD-like decaying spectrum on the rank dim."""
    rng = np.random.default_rng(1)
    b, s, r, m = 2, 96, 32, 64
    sigma = np.exp(-np.arange(r) / 10.0).astype(np.float32)
    us = rng.standard_normal((b, s, r)).astype(np.float32) * sigma
    vt = rng.standard_normal((b, r, m)).astype(np.float32) * 0.05
    return jnp.asarray(us), jnp.asarray(vt)


def _rel_err(approx, exact):
    return float(
        np.linalg.norm(np.asarray(approx) - np.asarray(exact))
        / np.linalg.norm(np.asarray(exact))
    )


def test_int8_k_roundtrip_error(factors):
    us, vt = factors
    exact = np.einsum("bsr,brm->bsm", np.asarray(us), np.asarray(vt))
    qf = quantize_k_factors(us, vt)
    assert qf.us_q.dtype == jnp.int8 and qf.vt_q.dtype == jnp.int8
    assert _rel_err(dequantize_k(qf), exact) < 0.02


def test_v_roundtrip_error(factors):
    us, vt = factors
    exact = np.einsum("bsr,brm->bsm", np.asarray(us), np.asarray(vt))
    qf = quantize_v_factors(us, vt)
    # v keeps vt in bf16; error budget dominated by int8 us + bf16 vt
    assert _rel_err(dequantize_v(qf), exact) < 0.02


def test_mixed_k_dtypes_and_shapes(factors):
    us, vt = factors
    r_hi = 8
    qf = quantize_k_factors_mixed(us, vt, r_hi=r_hi)
    assert qf.us8_q.shape[-1] == r_hi and qf.us8_q.dtype == jnp.int8
    assert qf.us4_q.shape[-1] == us.shape[-1] - r_hi
    assert qf.us4_q.dtype == jnp.int4 and qf.vt4_q.dtype == jnp.int4
    assert qf.out_scale.shape == (2, 1, vt.shape[-1])
    assert qf.lo_ratio.shape == (2, 1, vt.shape[-1])


def test_mixed_k_error_between_int8_and_int4(factors):
    """Mixed top-int8/tail-int4 error lands between all-int8 and a pure
    int4 tail-everything baseline, and stays small in absolute terms
    because the int4 ranks carry the small singular values."""
    us, vt = factors
    exact = np.einsum("bsr,brm->bsm", np.asarray(us), np.asarray(vt))
    e8 = _rel_err(dequantize_k(quantize_k_factors(us, vt)), exact)
    e_mixed = _rel_err(
        dequantize_k_mixed(quantize_k_factors_mixed(us, vt, r_hi=8)), exact
    )
    e4 = _rel_err(
        dequantize_k_mixed(quantize_k_factors_mixed(us, vt, r_hi=0)), exact
    )
    assert e8 <= e_mixed <= e4 * 1.05  # tiny slack for rounding luck
    # this fixture's spectrum decays slowly (exp(-r/10) over 32 ranks), so
    # the int4 tail still carries real mass — real xKV factors decay much
    # faster; the engine-level agreement gates are the accuracy arbiter
    assert e_mixed < 0.09
    # all-int4 (r_hi=0) is the worst case: dominant ranks at 4 bits
    assert e4 < 0.25


def test_mixed_k_r_hi_full_matches_int8(factors):
    """r_hi == r degenerates to the plain int8 path (empty int4 tail)."""
    us, vt = factors
    r = us.shape[-1]
    qf = quantize_k_factors_mixed(us, vt, r_hi=r)
    q8 = quantize_k_factors(us, vt)
    np.testing.assert_array_equal(np.asarray(qf.us8_q), np.asarray(q8.us_q))
    assert qf.us4_q.shape[-1] == 0
    np.testing.assert_allclose(
        np.asarray(dequantize_k_mixed(qf)),
        np.asarray(dequantize_k(q8)),
        rtol=1e-5, atol=1e-5,
    )


def test_mixed4_packed_matches_unpacked_mixed():
    """The packed-nibble kernel format reconstructs EXACTLY what the
    jnp.int4 math format does (same quantizer, different storage)."""
    import jax
    import jax.numpy as jnp
    from xkv_tpu.compress.quant import (
        dequantize_k_mixed,
        dequantize_k_mixed4,
        quantize_k_factors_mixed,
        quantize_k_factors_mixed4,
    )

    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    us = jax.random.normal(ks[0], (2, 40, 16), jnp.float32)
    vt = jax.random.normal(ks[1], (2, 16, 24), jnp.float32)
    a = dequantize_k_mixed(quantize_k_factors_mixed(us, vt, r_hi=8))
    b = dequantize_k_mixed4(quantize_k_factors_mixed4(us, vt, r_hi=8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mixed4_v_reconstruction_close():
    """Mixed V factors: error sits between full int8 and nothing; the
    int4 tail on the low-energy ranks costs little when ranks are
    singular-ordered."""
    import jax
    import jax.numpy as jnp
    from xkv_tpu.compress.quant import (
        dequantize_v,
        dequantize_v_mixed4,
        quantize_v_factors,
        quantize_v_factors_mixed4,
    )

    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    # singular-ordered: decay the tail ranks like an SVD us would
    decay = jnp.exp(-0.3 * jnp.arange(16))[None, None, :]
    us = jax.random.normal(ks[0], (2, 40, 16), jnp.float32) * decay
    vt = jax.random.normal(ks[1], (2, 16, 24), jnp.float32)
    exact = jnp.einsum("bsr,brm->bsm", us, vt)
    e8 = float(jnp.linalg.norm(
        dequantize_v(quantize_v_factors(us, vt)) - exact))
    e4 = float(jnp.linalg.norm(
        dequantize_v_mixed4(quantize_v_factors_mixed4(us, vt, r_hi=8))
        - exact))
    n = float(jnp.linalg.norm(exact))
    assert e8 / n < 0.02
    assert e4 / n < 0.05  # int4 tail: small extra error on decayed ranks


def _one_side_engines(mk, mv, factor_dtype):
    from xkv_tpu.configs import generate_consecutive_xkv_config
    from xkv_tpu.engine import InferenceEngine
    from xkv_tpu.models.config import tiny_llama_config
    from xkv_tpu.models.llama import init_params

    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1,
        group_size=2, rank_k=24, rank_v=24,
        merge_key=mk, merge_value=mv,
        extra_kwargs={"svd_method": "exact", "rope_mode": "post"},
    )
    eng = InferenceEngine(
        params, cfg, xkv=xkv, mode="factored",
        factor_dtype=factor_dtype, cache_dtype=jnp.float32,
        donate_cache=False, tail_max=8,
    )
    return cfg, eng


@pytest.mark.slow
def test_int4_one_side_merge_close_to_fp32():
    """merge-one-side with factor_dtype='int4' (VERDICT r3 #4): the mixed
    dense/factored fallback carries the packed int4 tail, so one-sided
    int4 decode logits track the fp32-factor one-sided engine closely
    (quantization noise only)."""
    rng = np.random.default_rng(20)
    for mk, mv in ((True, False), (False, True)):
        cfg, eng4 = _one_side_engines(mk, mv, "int4")
        _, engf = _one_side_engines(mk, mv, jnp.float32)
        prompt = rng.integers(0, cfg.vocab_size, size=(1, 32)).astype(
            np.int32)
        _, c4 = eng4.prefill(prompt)
        _, cf = engf.prefill(prompt)
        tok = jnp.zeros((1, 1), jnp.int32)
        pos = jnp.asarray(32, jnp.int32)
        l4, _ = eng4.decode_step(c4, tok, pos)
        lf, _ = engf.decode_step(cf, tok, pos)
        l4 = np.asarray(l4[0, -1])
        lf = np.asarray(lf[0, -1])
        corr = np.corrcoef(l4, lf)[0, 1]
        assert corr > 0.995, (mk, mv, corr)


def test_int4_one_side_tail_contributes():
    """Zeroing the packed int4 tail must CHANGE one-sided decode logits —
    proof the mixed fallback reads the tail (the round-2 bug dropped it
    silently)."""
    rng = np.random.default_rng(21)
    cfg, eng4 = _one_side_engines(True, False, "int4")
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 32)).astype(np.int32)
    _, cache = eng4.prefill(prompt)
    assert cache.groups[0].k_us4 is not None  # packed tail exists
    groups0 = tuple(
        g.replace(k_us4=jnp.zeros_like(g.k_us4)) for g in cache.groups
    )
    cache0 = cache.replace(groups=groups0)
    tok = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.asarray(32, jnp.int32)
    l_full, _ = eng4.decode_step(cache, tok, pos)
    l_zero, _ = eng4.decode_step(cache0, tok, pos)
    assert np.abs(np.asarray(l_full) - np.asarray(l_zero)).max() > 1e-4


def test_int4_one_side_batched_still_refused():
    """The batched slot allocator only lays out int4 for fully merged
    groups; one-sided int4 stays single-stream-engine-only."""
    import pytest

    from xkv_tpu.configs import generate_consecutive_xkv_config
    from xkv_tpu.engine.batching import BatchedEngine
    from xkv_tpu.models.config import tiny_llama_config
    from xkv_tpu.models.llama import init_params

    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1,
        group_size=2, rank_k=24, rank_v=24, merge_key=True,
        merge_value=False,
        extra_kwargs={"svd_method": "exact", "rope_mode": "post"},
    )
    with pytest.raises(ValueError, match="merge_key.*merge_value"):
        BatchedEngine(
            params, cfg, xkv=xkv, num_slots=2, s_max=32, tail_max=8,
            factor_dtype="int4", cache_dtype=jnp.float32,
        )


@pytest.mark.slow
def test_int4_rank_frac_sub_tile_tail_refused():
    """An int4 tail below the 256-rank lane tile at rank>=512 cannot be
    realized under lane alignment; build_cache must refuse rather than
    silently move int8 ranks down to int4 (ADVICE r2)."""
    import pytest

    from xkv_tpu.configs import generate_consecutive_xkv_config
    from xkv_tpu.engine.compression import build_cache
    from xkv_tpu.models.config import tiny_llama_config
    from xkv_tpu.models.llama import init_params, prefill
    from xkv_tpu.ops.rope import rope_cos_sin

    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    seq = 640
    tokens = jnp.zeros((1, seq), jnp.int32)
    _, kvs = prefill(params, cfg, tokens)
    cos_p, sin_p = rope_cos_sin(
        jnp.arange(seq), cfg.head_dim, cfg.rope_theta, cfg.rope_scaling
    )
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=512, rank_v=512,
        extra_kwargs={"svd_method": "exact", "rope_mode": "post",
                      "int4_rank_frac": 0.9},
    )
    with pytest.raises(ValueError, match="int4_rank_frac"):
        build_cache(kvs, xkv, cfg, cos_p, sin_p, tail_max=8,
                    factor_dtype="int4", cache_dtype=jnp.float32)
