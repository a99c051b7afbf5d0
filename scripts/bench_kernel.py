"""Microbenchmark: per-call decode-attention time on the real chip.

Isolates one layer's decode attention (the hot op of the factored-cache
system, `ops/pallas/lowrank_attention.py`) and times it against the dense
XLA baseline at Llama-3.1-8B geometry.

Methodology (docs/DESIGN.md "Benchmark methodology warnings"): the axon
tunnel memoizes identical (executable, args) executions and
block_until_ready does not wait, so each measurement is a *paired-length*
wall timing — one jitted call chains N kernel invocations sequentially
(each step's query is derived from the previous step's output, so XLA
cannot hoist or parallelize), and per-call time is (t(2N) - t(N)) / N with
a device_get forcing completion. Distinct initial queries keep every timed
call un-memoized.

Usage:
  python scripts/bench_kernel.py --ctx 32768 --impls dense,bf16,int8 \
      --block-s 1024,2048
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HKV, HQ, HD = 8, 32, 128
RK, RV = 512, 768


def _chain(step_fn, q0, n):
    def body(q, _):
        out = step_fn(q)
        # Derive the next query from the output: forces sequential
        # execution and keeps magnitudes bounded.
        nxt = (out / (1.0 + jnp.abs(out))).astype(q.dtype)
        return nxt, ()

    q_last, _ = jax.lax.scan(body, q0, None, length=n)
    return q_last


def timed_per_call(step_fn, q0_base, n: int) -> float:
    f = jax.jit(functools.partial(_chain, step_fn), static_argnames=("n",))

    def run(seed: int, steps: int) -> float:
        q0 = q0_base + 1e-3 * seed
        t0 = time.perf_counter()
        out = f(q0, n=steps)
        jax.device_get(out)
        return time.perf_counter() - t0

    run(0, n)        # compile N
    run(1, 2 * n)    # compile 2N
    t1 = min(run(2 + i, n) for i in range(4))
    t2 = min(run(6 + i, 2 * n) for i in range(4))
    return max(t2 - t1, 0.0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n", type=int, default=32, help="chain length")
    ap.add_argument("--impls", default="dense,bf16,int8")
    ap.add_argument("--block-s", default="1024")
    args = ap.parse_args()

    from xkv_tpu.ops.attention import dense_decode_attention_xla
    from xkv_tpu.ops.pallas.lowrank_attention import lowrank_decode_attention
    from xkv_tpu.ops.rope import rope_cos_sin

    b, s = args.batch, args.ctx
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    scale = HD ** -0.5

    q0 = jax.random.normal(ks[0], (b, HQ, 1, HD), jnp.bfloat16)
    cos_p, sin_p = rope_cos_sin(jnp.arange(s), HD, 500000.0, None)
    cos_t, sin_t = (
        jnp.broadcast_to(x, (b, HD))
        for x in rope_cos_sin(jnp.asarray([s]), HD, 500000.0, None)
    )

    results = {}
    impls = args.impls.split(",")

    if "dense" in impls:
        k_dense = jax.random.normal(ks[1], (b, HKV, s, HD), jnp.bfloat16)
        v_dense = jax.random.normal(ks[2], (b, HKV, s, HD), jnp.bfloat16)

        def dense_step(q):
            part = dense_decode_attention_xla(q, k_dense, v_dense, scale)
            return part.out

        results["dense_xla"] = timed_per_call(dense_step, q0, args.n)

    k_us_f = jax.random.normal(ks[3], (b, s, RK), jnp.float32)
    k_vt_f = jax.random.normal(ks[4], (b, RK, HKV * HD), jnp.float32) * 0.03
    v_us_f = jax.random.normal(ks[5], (b, s, RV), jnp.float32)
    v_vt_f = jax.random.normal(ks[6], (b, RV, HKV * HD), jnp.float32) * 0.03

    for bs_str in args.block_s.split(","):
        bs = int(bs_str)
        if "bf16" in impls:
            k_us, k_vt = k_us_f.astype(jnp.bfloat16), k_vt_f.astype(jnp.bfloat16)
            v_us, v_vt = v_us_f.astype(jnp.bfloat16), v_vt_f.astype(jnp.bfloat16)

            def bf16_step(q, k_us=k_us, k_vt=k_vt, v_us=v_us, v_vt=v_vt, bs=bs):
                out, _ = lowrank_decode_attention(
                    q, k_us, k_vt, v_us, v_vt, cos_p, sin_p, cos_t, sin_t,
                    scale=scale, num_kv_heads=HKV, block_s=bs,
                )
                return out

            results[f"lowrank_bf16_b{bs}"] = timed_per_call(bf16_step, q0, args.n)

        if "int8" in impls:
            from xkv_tpu.compress.quant import (
                quantize_k_factors,
                quantize_v_factors,
            )

            kq = quantize_k_factors(k_us_f, k_vt_f)
            vq = quantize_v_factors(v_us_f, v_vt_f)

            def int8_step(q, bs=bs):
                out, _ = lowrank_decode_attention(
                    q, kq.us_q, kq.vt_q, vq.us_q, vq.vt, cos_p, sin_p,
                    cos_t, sin_t,
                    k_scale_slice=kq.out_scale, v_rank_scale=vq.rank_scale,
                    scale=scale, num_kv_heads=HKV, block_s=bs,
                )
                return out

            results[f"lowrank_int8_b{bs}"] = timed_per_call(int8_step, q0, args.n)

    print(f"# ctx={s} batch={b} geometry: hkv={HKV} hq={HQ} hd={HD} rk={RK} rv={RV}")
    for name, t in results.items():
        print(f"{name:24s} {t * 1e3:8.3f} ms/call")


if __name__ == "__main__":
    main()
