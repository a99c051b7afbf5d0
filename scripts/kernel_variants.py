"""Timing experiments for candidate rewrites of the low-rank decode kernel.

Each variant is a full, numerically-correct kernel (parity-checked against
the production `lowrank_decode_attention` before timing) — unlike
kernel_ablation.py these are real candidates, not stage deletions.

Variants:
  prod       — the production kernel (baseline)
  scratch_ab — write the two trig products straight into a VMEM scratch
               (block_s, 2m) buffer (fused multiply+store, no
               value-producing concat), single K=2m score GEMM
  two_gemm   — no concat at all: two K=m score GEMMs accumulated
  b2048      — scratch_ab at block_s=2048
  b512       — scratch_ab at block_s=512

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/kernel_variants.py \
      --ctx 65536 --batch 8 --n 16 --variants prod,scratch_ab,two_gemm
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xkv_tpu.ops.pallas.lowrank_attention import (
    NEG_INF,
    _query_embeds,
    _repeat_cols,
    lowrank_decode_attention,
)

HKV, HQ, HD = 8, 32, 128
RK, RV = 512, 768


def _variant_kernel(
    qab_ref, head_mask_ref, len_ref, k_us_ref, k_vt_ref, v_us_ref,
    v_vt_ref, v_scale_ref, cos_ref, sin_ref, o_ref, lse_ref,
    m_scratch, l_scratch, t_scratch, ab_scratch,
    *, block_s, hkv, hd, quantized, variant,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    num_s = pl.num_programs(1)

    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    compute_dtype = jnp.bfloat16 if quantized else k_us_ref.dtype
    acc = jnp.int32 if quantized else jnp.float32
    k_raw = jnp.dot(k_us_ref[0], k_vt_ref[0], preferred_element_type=acc)

    m = hkv * hd
    reps = m // cos_ref.shape[1]
    cos_w = _repeat_cols(cos_ref[...].astype(compute_dtype), reps, False)
    sin_w = _repeat_cols(sin_ref[...].astype(compute_dtype), reps, False)

    if variant == "two_gemm":
        k_pre = k_raw.astype(compute_dtype)
        a = k_pre * cos_w
        b2 = k_pre * sin_w
        qab = qab_ref[0].astype(compute_dtype)
        s = jax.lax.dot_general(
            qab[:, :m], a, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            qab[:, m:], b2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:  # scratch_ab: fused multiply+store into the combined buffer
        k_pre = k_raw.astype(compute_dtype)
        ab_scratch[:, :m] = k_pre * cos_w
        ab_scratch[:, m:] = k_pre * sin_w
        s = jax.lax.dot_general(
            qab_ref[0].astype(compute_dtype), ab_scratch[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    col_mask = (
        si * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    ) < len_ref[bi, 0]
    s = jnp.where(col_mask, s, NEG_INF)

    m_prev = m_scratch[...][:, :1]
    l_prev = l_scratch[...][:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    v_us_blk = v_us_ref[0]
    if quantized:
        v_us_blk = v_us_blk.astype(compute_dtype)
    t_curr = jnp.dot(
        p.astype(compute_dtype), v_us_blk, preferred_element_type=jnp.float32
    )
    t_scratch[...] = t_scratch[...] * alpha + t_curr

    @pl.when(si == num_s - 1)
    def _store():
        m_fin = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        t_final = t_scratch[...] * l_inv
        if quantized:
            t_final = t_final * v_scale_ref[0]
        o_full = jnp.dot(
            t_final.astype(compute_dtype), v_vt_ref[0],
            preferred_element_type=jnp.float32,
        )
        o_curr = jnp.sum(
            (o_full * head_mask_ref[...]).reshape(o_full.shape[0], hkv, hd),
            axis=1,
        )
        o_ref[0] = o_curr.astype(o_ref.dtype)
        lse = (m_fin + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse[None, :], lse_ref.shape[1:])


def variant_attention(
    q_pre, k_us, k_vt_slice, v_us, v_vt_slice, cos_p, sin_p, cos_t, sin_t,
    lengths=None, k_scale_slice=None, v_rank_scale=None,
    *, scale, num_kv_heads, block_s=1024, variant="scratch_ab",
):
    b, hq, ql, hd = q_pre.shape
    hkv = num_kv_heads
    s_p = k_us.shape[1]
    rv = v_us.shape[2]
    half = hd // 2
    m = hkv * hd
    R = ql * hq

    block_s = min(block_s, s_p)
    table_dtype = jnp.float32 if k_us.dtype == jnp.float32 else jnp.bfloat16
    cos_p = cos_p[:, :half].astype(table_dtype)
    sin_p = sin_p[:, :half].astype(table_dtype)
    s_pad = pl.cdiv(s_p, block_s) * block_s
    if s_pad != s_p:
        k_us = jnp.pad(k_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        v_us = jnp.pad(v_us, ((0, 0), (0, s_pad - s_p), (0, 0)))
        cos_p = jnp.pad(cos_p, ((0, s_pad - s_p), (0, 0)))
        sin_p = jnp.pad(sin_p, ((0, s_pad - s_p), (0, 0)))
    grid_s = s_pad // block_s

    quantized = k_us.dtype == jnp.int8
    if quantized:
        v_rank_scale = v_rank_scale.astype(jnp.float32)
    else:
        k_scale_slice = None
        v_rank_scale = jnp.ones((b, 1, rv), jnp.float32)
    qab_emb, head_mask = _query_embeds(
        q_pre, cos_t, sin_t, hkv, scale, k_scale_slice
    )

    if lengths is None:
        lengths = jnp.full((b,), s_p, jnp.int32)
    lengths = lengths.reshape(b, 1).astype(jnp.int32)

    compute_dtype = jnp.bfloat16 if quantized or k_us.dtype == jnp.bfloat16 \
        else jnp.float32
    kernel = functools.partial(
        _variant_kernel, block_s=block_s, hkv=hkv, hd=hd,
        quantized=quantized, variant=variant,
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, R, hd), q_pre.dtype),
            jax.ShapeDtypeStruct((b, 8, R), jnp.float32),
        ),
        grid=(b, grid_s),
        in_specs=[
            pl.BlockSpec((1, R, 2 * m), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((R, m), lambda bi, si: (0, 0)),
            pl.BlockSpec((b, 1), lambda bi, si: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_s, k_us.shape[2]), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, k_us.shape[2], m), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, block_s, rv), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, rv, m), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, rv), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((block_s, half), lambda bi, si: (si, 0)),
            pl.BlockSpec((block_s, half), lambda bi, si: (si, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, R, hd), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 8, R), lambda bi, si: (bi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, rv), jnp.float32),
            pltpu.VMEM((block_s, 2 * m), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qab_emb, head_mask, lengths, k_us, k_vt_slice, v_us, v_vt_slice,
      v_rank_scale, cos_p, sin_p)

    out = jnp.transpose(out.reshape(b, ql, hq, hd), (0, 2, 1, 3))
    lse = jnp.transpose(lse[:, 0, :].reshape(b, ql, hq), (0, 2, 1))
    return out, lse


def timed_per_call(step_fn, q0_base, n: int) -> float:
    def _chain(q0, n_steps):
        def body(q, _):
            out = step_fn(q)
            return (out / (1.0 + jnp.abs(out))).astype(q.dtype), ()

        q_last, _ = jax.lax.scan(body, q0, None, length=n_steps)
        return q_last

    f = jax.jit(_chain, static_argnames=("n_steps",))

    def run(seed, steps):
        q0 = q0_base + 1e-3 * seed
        t0 = time.perf_counter()
        jax.device_get(f(q0, n_steps=steps))
        return time.perf_counter() - t0

    run(0, n)
    run(1, 2 * n)
    t1 = min(run(2 + i, n) for i in range(3))
    t2 = min(run(5 + i, 2 * n) for i in range(3))
    return max(t2 - t1, 0.0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--variants", default="prod,scratch_ab,two_gemm,b2048")
    ap.add_argument("--check", action="store_true",
                    help="numerics parity check vs production first")
    args = ap.parse_args()

    from xkv_tpu.compress.quant import quantize_k_factors, quantize_v_factors
    from xkv_tpu.ops.rope import rope_cos_sin

    b, s = args.batch, args.ctx
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    scale = HD ** -0.5
    q0 = jax.random.normal(ks[0], (b, HQ, 1, HD), jnp.bfloat16)
    cos_p, sin_p = rope_cos_sin(jnp.arange(s), HD, 500000.0, None)
    cos_t, sin_t = (
        jnp.broadcast_to(x, (b, HD))
        for x in rope_cos_sin(jnp.asarray([s]), HD, 500000.0, None)
    )
    k_us_f = jax.random.normal(ks[3], (b, s, RK), jnp.float32)
    k_vt_f = jax.random.normal(ks[4], (b, RK, HKV * HD), jnp.float32) * 0.03
    v_us_f = jax.random.normal(ks[5], (b, s, RV), jnp.float32)
    v_vt_f = jax.random.normal(ks[6], (b, RV, HKV * HD), jnp.float32) * 0.03
    kq = quantize_k_factors(k_us_f, k_vt_f)
    vq = quantize_v_factors(v_us_f, v_vt_f)

    common = dict(scale=scale, num_kv_heads=HKV)
    fargs = (kq.us_q, kq.vt_q, vq.us_q, vq.vt, cos_p, sin_p, cos_t, sin_t)
    fkw = dict(k_scale_slice=kq.out_scale, v_rank_scale=vq.rank_scale)

    if args.check:
        o0, l0 = lowrank_decode_attention(q0, *fargs, **fkw, **common)
        for v in ("scratch_ab", "two_gemm"):
            o1, l1 = jax.jit(functools.partial(
                variant_attention, variant=v, **fkw, **common
            ))(q0, *fargs)
            import numpy as np
            np.testing.assert_allclose(
                np.asarray(o0, np.float32), np.asarray(o1, np.float32),
                atol=2e-2, rtol=2e-2)
            print(f"parity ok: {v}")

    results = {}
    for v in args.variants.split(","):
        if v == "prod":
            def step(q):
                out, _ = lowrank_decode_attention(q, *fargs, **fkw, **common)
                return out
        else:
            bs = 1024
            name = v
            if v.startswith("b") and v[1:].isdigit():
                bs, name = int(v[1:]), "scratch_ab"
            fn = jax.jit(functools.partial(
                variant_attention, variant=name, block_s=bs, **fkw, **common
            ))

            def step(q, fn=fn):
                out, _ = fn(q, *fargs)
                return out

        results[v] = timed_per_call(step, q0, args.n)
        print(f"{v:12s} {results[v] * 1e3:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
