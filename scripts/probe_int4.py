"""Probe: does this chip's MXU run int4 x int4 -> int32 GEMMs, and at what
rate vs int8 and bf16? Decides whether SVDq-style mixed-precision rank
quantization can cut the decode kernel's dominant reconstruction GEMM.

Times a pallas kernel doing N back-to-back (M, K) @ (K, M) GEMMs per call
(weights resident in VMEM, so this is pure MXU rate, no HBM effects).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K = 512, 512


def _kernel(x_ref, w_ref, o_ref, *, reps, acc):
    x = x_ref[...]
    w = w_ref[...]
    integer = acc == jnp.int32

    def body(_, carry):
        x, total = carry
        out = jnp.dot(x, w, preferred_element_type=acc)
        # derive the next x from the output: true data dependence, no CSE
        if integer:
            x = (out & 7).astype(x.dtype)
        else:
            x = (out * 1e-3).astype(x.dtype)
        return x, total + out

    _, out = jax.lax.fori_loop(
        0, reps, body, (x, jnp.zeros((M, M), acc))
    )
    o_ref[...] = out.astype(o_ref.dtype)


def build(dtype, reps):
    acc = jnp.int32 if dtype in (jnp.int8, jnp.int4) else jnp.float32
    if dtype in (jnp.int8, jnp.int4):
        x = jax.random.randint(jax.random.PRNGKey(0), (M, K), -7, 7, jnp.int8
                               ).astype(dtype)
        w = jax.random.randint(jax.random.PRNGKey(1), (K, M), -7, 7, jnp.int8
                               ).astype(dtype)
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (M, K), dtype)
        w = jax.random.normal(jax.random.PRNGKey(1), (K, M), dtype)

    fn = pl.pallas_call(
        functools.partial(_kernel, reps=reps, acc=acc),
        out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda a, b: fn(a, b)), x, w


def timed(dtype, reps):
    """Paired-length timing (tunnel memoizes identical calls and
    block_until_ready does not wait — see bench.py docstring)."""
    try:
        fn1, x, w = build(dtype, reps)
        fn2, _, _ = build(dtype, 2 * reps)
        jax.device_get(fn1(x, w))  # compile
        jax.device_get(fn2(x, w))
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:200]}"

    def run(fn, sh):
        xs = jnp.roll(x, sh, axis=1)
        t0 = time.perf_counter()
        jax.device_get(fn(xs, w))
        return time.perf_counter() - t0

    t1 = min(run(fn1, s) for s in (1, 2, 3))
    t2 = min(run(fn2, s) for s in (4, 5, 6))
    return max(t2 - t1, 1e-9) / reps, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=256)
    args = ap.parse_args()
    macs = M * M * K
    for name, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8),
                     ("int4", jnp.int4)]:
        t, err = timed(dt, args.reps)
        if err:
            print(f"{name:5s} UNSUPPORTED: {err}")
        else:
            print(f"{name:5s} {t * 1e6:9.3f} us/GEMM  "
                  f"{macs / t / 1e12:7.1f} TMAC/s", flush=True)


if __name__ == "__main__":
    main()
