"""Accuracy-vs-compression demo, fully offline.

Trains a tiny induction model (sequences ``[bos, x, x]`` — continuing the
second copy requires attending back through the KV cache, the mechanism
RULER's needle tasks measure), then sweeps xKV rank and reports recall
accuracy through the real factored engine.

Run:  python examples/accuracy_demo.py        (~2 min on CPU)
"""

import numpy as np

import jax
import jax.numpy as jnp

from xkv_tpu.configs import generate_consecutive_xkv_config
from xkv_tpu.engine import InferenceEngine
from xkv_tpu.models.config import tiny_llama_config
from xkv_tpu.models.llama import init_params
from xkv_tpu.train.lm import train_lm

M = 24
CFG = tiny_llama_config(
    vocab_size=64, hidden_size=96, intermediate_size=192,
    num_layers=3, num_q_heads=4, num_kv_heads=2, head_dim=24,
)
FULL_RANK = 2 * CFG.num_kv_heads * CFG.head_dim


def make_batch(rng, batch):
    x = rng.integers(2, CFG.vocab_size, size=(batch, M)).astype(np.int32)
    tokens = np.concatenate([np.ones((batch, 1), np.int32), x, x], axis=1)
    mask = np.zeros_like(tokens, np.float32)
    mask[:, M + 1:] = 1.0
    return tokens, mask


def accuracy(engine, n=32, keep=4, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.integers(2, CFG.vocab_size, size=(n, M)).astype(np.int32)
    prompts = np.concatenate([np.ones((n, 1), np.int32), x, x[:, :keep]], axis=1)
    out = np.asarray(engine.generate(prompts, max_new_tokens=M - keep))
    return float((out == x[:, keep:]).mean())


def main():
    rng = np.random.default_rng(0)
    print("training induction model (300 steps)...")
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    params, hist = train_lm(
        params, CFG, lambda i: make_batch(rng, 64), steps=300, lr=2e-3,
        log_every=100, verbose=True,
    )

    base = InferenceEngine(
        params, CFG, mode="none", tail_max=M, donate_cache=False,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    print(f"\nuncompressed baseline accuracy: {accuracy(base):.3f}")
    print(f"{'rank':>6} {'compression':>12} {'recall acc':>11}")
    for rank in (FULL_RANK, FULL_RANK // 2, FULL_RANK // 4, 8, 4, 2):
        xkv = generate_consecutive_xkv_config(
            num_layers=CFG.num_layers, end_layer=-1, group_size=2,
            rank_k=rank, rank_v=rank, extra_kwargs={"svd_method": "exact"},
        )
        eng = InferenceEngine(
            params, CFG, xkv=xkv, mode="factored", tail_max=M,
            donate_cache=False, cache_dtype=jnp.float32,
            factor_dtype=jnp.float32,
        )
        _, cache = eng.prefill(np.ones((1, 2 * M + 1), np.int32))
        ratio = cache.compression_ratio(CFG)
        print(f"{rank:>6} {ratio:>11.2f}x {accuracy(eng):>11.3f}")


if __name__ == "__main__":
    main()
