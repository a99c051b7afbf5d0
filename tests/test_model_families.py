"""Mistral (sliding window) and Qwen2 (qkv bias) family coverage, plus the
HF safetensors loader round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import ModelConfig, tiny_llama_config
from xkv_tpu.models.llama import init_params, prefill


def test_qwen2_bias_engine_runs():
    cfg = tiny_llama_config(attention_bias=True, model_type="qwen2")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert "bq" in params["layers"][0]["attn"]
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=-1, group_size=2,
        rank_k=16, rank_v=16, extra_kwargs={"svd_method": "exact"},
    )
    eng = InferenceEngine(
        params, cfg, xkv=xkv, mode="factored", tail_max=8,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32, donate_cache=False,
    )
    prompt = np.arange(20, dtype=np.int32)[None] % cfg.vocab_size
    out = eng.generate(prompt, max_new_tokens=4)
    assert np.asarray(out).shape == (1, 4)


def test_mistral_sliding_window_changes_prefill():
    cfg_full = tiny_llama_config(model_type="mistral")
    cfg_win = tiny_llama_config(model_type="mistral", sliding_window=8)
    params = init_params(cfg_full, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = jnp.arange(24, dtype=jnp.int32)[None] % cfg_full.vocab_size
    logits_full, _ = prefill(params, cfg_full, prompt)
    logits_win, _ = prefill(params, cfg_win, prompt)
    # early positions (< window) identical; late positions differ
    np.testing.assert_allclose(
        np.asarray(logits_full[:, :8]), np.asarray(logits_win[:, :8]),
        rtol=1e-5, atol=1e-5,
    )
    assert np.abs(np.asarray(logits_full[:, -1]) - np.asarray(logits_win[:, -1])).max() > 1e-4


def test_hf_config_parsing_families():
    qwen = ModelConfig.from_hf_config(
        {
            "model_type": "qwen2", "vocab_size": 1000, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "sliding_window": 512,
        }
    )
    assert qwen.attention_bias and qwen.sliding_window == 512
    assert qwen.head_dim == 16

    ds = ModelConfig.from_hf_config(
        {
            "model_type": "deepseek_v2", "vocab_size": 1000, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "kv_lora_rank": 32,
            "qk_rope_head_dim": 8, "qk_nope_head_dim": 16, "v_head_dim": 16,
            "n_routed_experts": 8, "moe_intermediate_size": 32,
        }
    )
    assert ds.kv_lora_rank == 32 and ds.qk_head_dim == 24


def test_safetensors_loader_roundtrip(tmp_path):
    from xkv_tpu.models.loader import load_llama_params, save_llama_params

    cfg = tiny_llama_config(attention_bias=True)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    mdir = str(tmp_path / "model")
    save_llama_params(params, cfg, mdir)
    loaded, loaded_cfg = load_llama_params(mdir, dtype=jnp.float32)
    assert loaded_cfg.num_layers == cfg.num_layers
    assert loaded_cfg.num_kv_heads == cfg.num_kv_heads

    prompt = jnp.arange(12, dtype=jnp.int32)[None] % cfg.vocab_size
    l1, _ = prefill(params, cfg, prompt)
    l2, _ = prefill(loaded, loaded_cfg, prompt)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["dense", "moe_qlora"])
@pytest.mark.slow
def test_deepseek_loader_roundtrip(tmp_path, variant):
    """Fabricate a local HF DeepSeek-V2 checkpoint (dense, and MoE + shared
    experts + q-LoRA), load it back through the routed entry point, assert
    identical prefill logits."""
    from tests.test_deepseek_mla import CFG, MOE_CFG
    from xkv_tpu.models.config import ModelConfig
    from xkv_tpu.models import deepseek
    from xkv_tpu.models.loader import load_params, save_deepseek_params

    if variant == "dense":
        MLA_CFG = CFG
    else:
        MLA_CFG = ModelConfig(**{**MOE_CFG.__dict__, "q_lora_rank": 24})
    params = deepseek.init_params(MLA_CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    mdir = str(tmp_path / "dsv2")
    save_deepseek_params(params, MLA_CFG, mdir)
    loaded, loaded_cfg = load_params(mdir, dtype=jnp.float32)
    assert loaded_cfg.model_type == "deepseek_v2"
    assert loaded_cfg.kv_lora_rank == MLA_CFG.kv_lora_rank
    assert loaded_cfg.n_routed_experts == MLA_CFG.n_routed_experts
    assert loaded_cfg.q_lora_rank == MLA_CFG.q_lora_rank

    prompt = jnp.arange(10, dtype=jnp.int32)[None] % MLA_CFG.vocab_size
    l1, _ = deepseek.prefill(params, MLA_CFG, prompt)
    l2, _ = deepseek.prefill(loaded, loaded_cfg, prompt)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)


def _window_oracle_generate(params, cfg, prompt, n_new):
    """Oracle: re-run prompt+prefix through the stateless prefill (whose
    attention applies the sliding window) each step."""
    seq = np.asarray(prompt)
    outs = []
    for _ in range(n_new):
        logits, _ = prefill(params, cfg, jnp.asarray(seq))
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        outs.append(nxt)
        seq = np.concatenate([seq, nxt[:, None].astype(np.int32)], axis=1)
    return np.stack(outs, axis=1)


@pytest.mark.parametrize("mode_kw", [
    {},                                           # pre-RoPE factored
    {"rope_mode": "post"},                        # rank-space decode
])
@pytest.mark.slow
def test_mistral_window_decode_matches_oracle(mode_kw):
    """Sliding-window DECODE (VERDICT r2 #6): the factored cache masks keys
    below pos-window in every decode path; full-rank factorization must
    match the stateless windowed forward bit-for... closely (fp32)."""
    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    full_rank = 2 * cfg.num_kv_heads * cfg.head_dim  # lossless for group 2
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=full_rank, rank_v=full_rank,
        extra_kwargs={"svd_method": "exact", **mode_kw},
    )
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, size=(2, 24)).astype(np.int32)
    n_new = 6  # window 10 < prompt 24: the bound moves through the prefix

    expected = _window_oracle_generate(params, cfg, prompt, n_new)
    for mode in ("none", "factored"):
        eng = InferenceEngine(
            params, cfg, xkv=xkv if mode == "factored" else None, mode=mode,
            tail_max=n_new + 2, cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, donate_cache=False,
        )
        out = np.asarray(eng.generate(prompt, max_new_tokens=n_new))
        np.testing.assert_array_equal(out, expected, err_msg=f"mode={mode}")


@pytest.mark.slow
def test_mistral_window_decode_pallas_interpret_matches_xla():
    """The Pallas kernels' window lower bound (interpret mode on CPU)
    agrees with the XLA oracle path."""
    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 24)).astype(np.int32)
    outs = {}
    for impl in ("xla", "pallas"):
        eng = InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=8,
            attention_impl=impl, cache_dtype=jnp.float32,
            factor_dtype=jnp.float32, donate_cache=False,
        )
        outs[impl] = np.asarray(eng.generate(prompt, max_new_tokens=5))
    np.testing.assert_array_equal(outs["pallas"], outs["xla"])


@pytest.mark.slow
def test_mistral_window_batched_matches_single():
    """Batched decode applies the per-slot window bound."""
    from xkv_tpu.engine.batching import BatchedEngine

    cfg = tiny_llama_config(model_type="mistral", sliding_window=10)
    params = init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    xkv = generate_consecutive_xkv_config(
        num_layers=cfg.num_layers, end_layer=cfg.num_layers - 1, group_size=2,
        rank_k=24, rank_v=24, extra_kwargs={"svd_method": "exact"},
    )
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, size=(n,)).astype(np.int32)
               for n in (16, 12)]
    n_new = 4
    singles = []
    for p in prompts:
        eng = InferenceEngine(
            params, cfg, xkv=xkv, mode="factored", tail_max=n_new + 2,
            cache_dtype=jnp.float32, factor_dtype=jnp.float32,
            donate_cache=False,
        )
        singles.append(np.asarray(eng.generate(p[None, :], n_new))[0].tolist())
    be = BatchedEngine(
        params, cfg, xkv=xkv, num_slots=2, s_max=16, tail_max=8,
        prefill_buckets=[16], cache_dtype=jnp.float32,
        factor_dtype=jnp.float32,
    )
    ids = [be.submit(p, n_new) for p in prompts]
    by_id = {r.request_id: r.generated for r in be.run()}
    for rid, exp in zip(ids, singles):
        assert by_id[rid] == exp
