"""Device-op breakdown of the headline serving decode step.

Builds the exact bench.py configuration (8B geometry truncated to N layers,
xKV-4 ranks, int8 factors, batch B at 64K ctx), traces a chained scan of
decode steps on the real chip, and prints per-op device totals — the data
behind kernel tuning decisions (docs/DESIGN.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=65536)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--mode", default="factored", choices=["factored", "none"])
    ap.add_argument("--factor-dtype", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--trace-dir", default="/tmp/decode_trace")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from xkv_tpu.engine import InferenceEngine
    from xkv_tpu.utils.profiling import device_op_times, trace

    tail = args.steps + 8
    cfg, xkv, params, prompt = bench.build("8b", args.ctx, args.layers, tail)
    eng = InferenceEngine(
        params, cfg, xkv=xkv if args.mode == "factored" else None,
        mode=args.mode, tail_max=tail, attention_impl="pallas",
        donate_cache=False, prefill_logits="last",
        factor_dtype="int8" if args.factor_dtype == "int8" else jnp.bfloat16,
    )
    logits, cache = eng.prefill(prompt)
    first1 = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    if args.batch > 1:
        cache = cache.tile_batch(args.batch)
    jax.block_until_ready(cache)
    first = (first1[0] + jnp.arange(args.batch, dtype=jnp.int32)) % cfg.vocab_size
    pos = jnp.asarray(prompt.shape[1], jnp.int32)
    cos_sin = eng._prefill_cos_sin(cache.prefill_len)

    fn = jax.jit(
        lambda c, p, t, po, cs: eng._generate_impl(c, p, t, po, cs,
                                                   n_steps=args.steps)[0]
    )
    jax.device_get(fn(cache, eng.params, first, pos, cos_sin))  # compile
    with trace(args.trace_dir):
        jax.device_get(fn(cache, eng.params, (first + 1) % cfg.vocab_size,
                          pos, cos_sin))
    times = device_op_times(args.trace_dir)
    total = sum(times.values())
    print(f"total device time: {total * 1e3:.2f} ms for {args.steps} steps "
          f"({total * 1e3 / args.steps:.2f} ms/step, "
          f"{args.batch * args.steps / total:.1f} tok/s)")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t * 1e3:9.3f} ms  {100 * t / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
