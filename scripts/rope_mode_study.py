"""Accuracy study: pre-RoPE vs post-RoPE factorization (rope_mode).

Trains the offline induction model (tests/test_accuracy_gate.py — pure
KV-cache retrieval, the mechanism RULER's niah measures; no network, no
checkpoints needed) and measures, per rank:

  * greedy recall of the repeated segment through the compressed cache,
    scheme = pre (reference semantics) vs post (rank-space decode);
  * relative Frobenius reconstruction error of the stacked group-K matrix
    in each domain (how much the position rotation raises effective rank).

Usage:  python scripts/rope_mode_study.py [--ranks 96,64,48,32,24,16]

The table this printed on 2026-08-20 is recorded in docs/ROPE_MODES.md;
tests/test_rope_post_accuracy.py pins the qualitative conclusions.
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from xkv_tpu.configs import generate_consecutive_xkv_config  # noqa: E402
from xkv_tpu.engine import InferenceEngine  # noqa: E402
from xkv_tpu.models.config import tiny_llama_config  # noqa: E402
from xkv_tpu.models.llama import init_params, prefill  # noqa: E402
from xkv_tpu.train.lm import train_lm  # noqa: E402

M = 24
CFG = tiny_llama_config(
    vocab_size=64, hidden_size=96, intermediate_size=192,
    num_layers=3, num_q_heads=4, num_kv_heads=2, head_dim=24,
)
FULL_RANK = 2 * CFG.num_kv_heads * CFG.head_dim  # group of 2 -> 96


def make_batch(rng, batch):
    x = rng.integers(2, CFG.vocab_size, size=(batch, M)).astype(np.int32)
    tokens = np.concatenate([np.ones((batch, 1), np.int32), x, x], axis=1)
    mask = np.zeros_like(tokens, np.float32)
    mask[:, M + 1:] = 1.0
    return tokens, mask


def xkv_with(rank, mode):
    return generate_consecutive_xkv_config(
        num_layers=CFG.num_layers, end_layer=CFG.num_layers - 1,
        group_size=2, rank_k=rank, rank_v=rank,
        extra_kwargs={"svd_method": "exact", "rope_mode": mode},
    )


def recall(params, xkv, n=48, seed=123, keep=4):
    eng = InferenceEngine(
        params, CFG, xkv=xkv, mode="factored" if xkv else "none",
        tail_max=M, donate_cache=False,
        cache_dtype=jnp.float32, factor_dtype=jnp.float32,
    )
    rng = np.random.default_rng(seed)
    x = rng.integers(2, CFG.vocab_size, size=(n, M)).astype(np.int32)
    prompts = np.concatenate(
        [np.ones((n, 1), np.int32), x, x[:, :keep]], axis=1
    )
    out = np.asarray(eng.generate(prompts, max_new_tokens=M - keep))
    return float((out == x[:, keep:]).mean())


def svd_rel_err(mat, rank):
    """||M - M_r||_F / ||M||_F of the rank-r truncation (per batch mean)."""
    matf = np.asarray(mat, np.float64)
    errs = []
    for b in range(matf.shape[0]):
        u, s, vt = np.linalg.svd(matf[b], full_matrices=False)
        tail = s[rank:]
        errs.append(np.sqrt((tail ** 2).sum() / (s ** 2).sum()))
    return float(np.mean(errs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ranks", default="96,64,48,32,24,16")
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()
    ranks = [int(r) for r in args.ranks.split(",")]

    rng = np.random.default_rng(0)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    params, hist = train_lm(
        params, CFG, lambda i: make_batch(rng, 64), steps=args.steps,
        lr=2e-3, log_every=100,
    )
    print(f"train loss: {hist[-1]:.4f}")
    base = recall(params, None)
    print(f"uncompressed recall: {base:.3f}")

    # Reconstruction-error comparison on real prefill K states.
    from xkv_tpu.ops.rope import apply_rope, rope_cos_sin

    x = rng.integers(2, CFG.vocab_size, size=(8, M)).astype(np.int32)
    toks = np.concatenate([np.ones((8, 1), np.int32), x, x], axis=1)
    _, kvs = prefill(params, CFG, jnp.asarray(toks))
    s = toks.shape[1]
    cos, sin = rope_cos_sin(
        jnp.arange(s), CFG.head_dim, CFG.rope_theta, CFG.rope_scaling
    )

    def stack(ks):  # [(b, hkv, s, hd)] -> (b, s, g*hkv*hd)
        cat = jnp.concatenate(ks, axis=1)
        b, h, ss, hd = cat.shape
        return jnp.transpose(cat, (0, 2, 1, 3)).reshape(b, ss, h * hd)

    k01_pre = stack([kvs[0][0], kvs[1][0]])
    k01_post = stack([
        apply_rope(kvs[0][0], cos[None], sin[None]),
        apply_rope(kvs[1][0], cos[None], sin[None]),
    ])

    print(f"\n{'rank':>5} {'relerr_pre':>11} {'relerr_post':>12} "
          f"{'recall_pre':>11} {'recall_post':>12}")
    for r in ranks:
        e_pre = svd_rel_err(k01_pre, r)
        e_post = svd_rel_err(k01_post, r)
        a_pre = recall(params, xkv_with(r, "pre"))
        a_post = recall(params, xkv_with(r, "post"))
        print(f"{r:>5} {e_pre:>11.4f} {e_post:>12.4f} "
              f"{a_pre:>11.3f} {a_post:>12.3f}")


if __name__ == "__main__":
    main()
