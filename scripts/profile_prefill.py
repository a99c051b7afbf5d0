"""Time prefill+compress (TTFT path) on the real chip at bench geometry.

Paired timing with distinct prompts (tunnel memoization); prints prefill
seconds for mode=none vs mode=factored (randomized vs exact SVD).

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_prefill.py [ctx]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build  # noqa: E402

from xkv_tpu.engine import InferenceEngine  # noqa: E402


def time_prefill(eng, prompts):
    jax.device_get(eng.prefill(prompts[0])[0])  # compile
    ts = []
    for p in prompts[1:]:
        t0 = time.perf_counter()
        logits, cache = eng.prefill(p)
        jax.device_get(logits)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), cache)
        # block_until_ready does not wait on this tunnel; fetch one element
        for g in cache.groups:
            if g.k_us is not None:
                jax.device_get(g.k_us[0, 0, 0])
        for a in cache.dense_k.values():
            jax.device_get(a[0, 0, 0, 0])
            break
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    cfg, xkv, params, _ = build("8b", ctx, 8, 16)
    prompts = [
        jax.random.randint(jax.random.PRNGKey(i), (1, ctx), 0, cfg.vocab_size)
        for i in range(4)
    ]

    eng_none = InferenceEngine(
        params, cfg, mode="none", tail_max=16, attention_impl="pallas",
        donate_cache=False, prefill_logits="last",
    )
    t_none = time_prefill(eng_none, prompts)
    del eng_none
    eng_f = InferenceEngine(
        params, cfg, xkv=xkv, mode="factored", tail_max=16,
        attention_impl="pallas", donate_cache=False, factor_dtype="int8",
        prefill_logits="last",
    )
    t_fact = time_prefill(eng_f, prompts)
    print(f"ctx={ctx}: prefill none {t_none:.3f}s | "
          f"prefill+compress factored {t_fact:.3f}s | "
          f"svd overhead {t_fact - t_none:.3f}s")


if __name__ == "__main__":
    main()
