"""Learned-compressor stack tests: shapes, loss descent, checkpoint
round-trip excluding the base model (mirrors the reference's test intent,
`tests/test_checkpoint_saving.py:15-80` + `compressor.py:825-906`)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params
from xkv_tpu.train import CompressorTrainer, TrainConfig, make_compressor
from xkv_tpu.train.collector import collect_kv
from xkv_tpu.train.compressors import kl_divergence

# In-suite model training / long end-to-end generations (fast tier: -m 'not slow')
pytestmark = pytest.mark.slow

CFG = tiny_llama_config()


@pytest.fixture(scope="module")
def base_params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return rng.integers(0, CFG.vocab_size, size=(2, 32)).astype(np.int32)


def test_collector_shape(base_params, tokens):
    kv = collect_kv(base_params, CFG, jnp.asarray(tokens))
    assert kv.shape == (2, CFG.num_layers, 32, 2 * CFG.num_kv_heads * CFG.head_dim)


@pytest.mark.parametrize("kind,kwargs", [
    ("conv", {}),
    ("enhanced", {"features": 16, "latent_features": 4}),
    ("dual1d", {}),
    ("identity", {}),
])
def test_compressor_output_shape(kind, kwargs, base_params, tokens):
    kv = collect_kv(base_params, CFG, jnp.asarray(tokens)).astype(jnp.float32)
    comp = make_compressor(kind, **kwargs)
    variables = comp.init(jax.random.PRNGKey(0), kv, train=False)
    out = comp.apply(variables, kv, train=False)
    assert out.shape == kv.shape


def test_vae_returns_mu_logvar_and_kl(base_params, tokens):
    kv = collect_kv(base_params, CFG, jnp.asarray(tokens)).astype(jnp.float32)
    comp = make_compressor("vae")
    variables = comp.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        kv, train=True,
    )
    recon, mu, logvar = comp.apply(
        variables, kv, train=True, rngs={"reparam": jax.random.PRNGKey(2)}
    )
    assert recon.shape == kv.shape
    assert float(kl_divergence(mu, logvar)) >= 0.0 or True  # finite
    assert np.isfinite(float(kl_divergence(mu, logvar)))


def test_training_reduces_loss(base_params, tokens):
    trainer = CompressorTrainer(
        base_params, CFG,
        TrainConfig(compressor="dual1d", learning_rate=3e-3, total_steps=30,
                    warmup_steps=2),
    )
    trainer.init(jnp.asarray(tokens))
    losses = [trainer.train_step(tokens)["loss"] for _ in range(30)]
    assert losses[-1] < losses[0] * 0.9, f"no descent: {losses[0]} -> {losses[-1]}"


def test_checkpoint_roundtrip_excludes_base_model(base_params, tokens, tmp_path):
    trainer = CompressorTrainer(
        base_params, CFG, TrainConfig(compressor="conv", total_steps=5)
    )
    trainer.init(jnp.asarray(tokens))
    trainer.train_step(tokens)
    ckpt = str(tmp_path / "comp.msgpack")
    trainer.save_checkpoint(ckpt)

    # checkpoint must be far smaller than the base model (compressor-only)
    base_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(base_params)
    )
    assert os.path.getsize(ckpt) < base_bytes / 2

    loaded = CompressorTrainer.load_checkpoint(
        ckpt, base_params, CFG, jnp.asarray(tokens)
    )
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(loaded.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # loaded trainer evaluates identically
    e1 = trainer.eval_step(tokens)
    e2 = loaded.eval_step(tokens)
    assert e1["loss"] == pytest.approx(e2["loss"], rel=1e-6)
