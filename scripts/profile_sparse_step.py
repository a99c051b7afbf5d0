"""Profile one sparse decode step on the real chip: per-op device totals.

Drives the same geometry as bench.py (8-layer 8B, 32K ctx, int8 factors,
sparse top-8 of 1024-row chunks) and prints the top device ops for one
n-step decode jit, to see where the step time goes (reconstruction GEMM vs
selection vs tail vs weights).

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_sparse_step.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build  # noqa: E402

from xkv_tpu.engine import InferenceEngine  # noqa: E402
from xkv_tpu.utils.profiling import device_op_times, trace  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    sparse = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = 8
    cfg, xkv, params, prompt = build("8b", 32768, 8, steps + 8)
    eng = InferenceEngine(
        params, cfg, xkv=xkv, mode="factored", tail_max=steps + 8,
        attention_impl="pallas", donate_cache=False, factor_dtype="int8",
        prefill_logits="last",
        sparse_topk=(sparse or None), sparse_block=1024,
    )
    logits, cache = eng.prefill(prompt)
    cache = cache.tile_batch(batch)
    jax.block_until_ready(cache)
    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    first = (first[0] + jnp.arange(batch, dtype=jnp.int32)) % cfg.vocab_size
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    cos_sin = eng._prefill_cos_sin(cache.prefill_len)

    fn = jax.jit(
        lambda c, p, t, po, cs: eng._generate_impl(c, p, t, po, cs,
                                                   n_steps=steps)[0]
    )
    jax.device_get(fn(cache, eng.params, first, pos, cos_sin))  # compile
    with trace("/tmp/sparse_trace"):
        jax.device_get(fn(cache, eng.params, (first + 1) % cfg.vocab_size,
                          pos, cos_sin))
    times = device_op_times("/tmp/sparse_trace")
    total = sum(times.values())
    print(f"batch={batch} sparse={sparse} steps={steps} "
          f"device total {total * 1e3:.2f} ms "
          f"({total / steps * 1e3:.2f} ms/step)")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {t * 1e3:9.3f} ms  {100 * t / total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
