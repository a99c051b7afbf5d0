"""Ablation study of the low-rank decode kernel: which stage costs what.

Builds a parametrized copy of `_lowrank_kernel` with stages that can be
disabled (numerics become wrong — this is a TIMING tool only) and measures
per-call time for each configuration on the real chip, using the paired
chained-scan methodology of scripts/bench_kernel.py.

Stages:
  recon   — the us @ vt reconstruction GEMM (off: reads us block directly,
            tiled to width)
  scalemul— the int8 post-GEMM per-column scale multiply
  rope    — rotation of reconstructed keys
  scores  — the q @ K^T GEMM + masking
  softmax — online softmax bookkeeping
  vpath   — P @ v_us accumulation
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

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
HKV, HQ, HD = 8, 32, 128
RK, RV = 512, 768


def _kernel(
    q_ref, len_ref, k_us_ref, k_vt_ref, v_us_ref, k_scale_ref,
    cos_ref, sin_ref, trig_t_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, t_scratch,
    *, scale, block_s, hkv, hd, stages,
):
    si = pl.program_id(1)
    num_s = pl.num_programs(1)

    @pl.when(si == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        t_scratch[...] = jnp.zeros_like(t_scratch)

    m = hkv * hd
    raw_dtype = (
        jnp.bfloat16
        if ("ropeq" in stages and "f32" not in stages)
        else jnp.float32
    )
    if "recon" in stages:
        k_pre = jnp.dot(
            k_us_ref[0], k_vt_ref[0], preferred_element_type=jnp.int32
        ).astype(raw_dtype)
    else:
        # touch the inputs without the GEMM: tile us block out to width
        k_pre = jnp.tile(
            k_us_ref[0].astype(raw_dtype), (1, m // k_us_ref.shape[2])
        )

    if "scalemul" in stages and "ropeq" not in stages:
        k_pre = k_pre * k_scale_ref[0]

    if "rope" in stages:
        half = hd // 2
        cos = cos_ref[...].astype(jnp.float32)[:, None, :]
        sin = sin_ref[...].astype(jnp.float32)[:, None, :]
        k_heads = k_pre.reshape(block_s, hkv, hd)
        k1 = k_heads[..., :half]
        k2 = k_heads[..., half:]
        k_rot = (
            jnp.concatenate([k1 * cos - k2 * sin, k2 * cos + k1 * sin], axis=-1)
            .reshape(block_s, m)
            .astype(jnp.bfloat16)
        )
    elif "ropeq" in stages:
        # Relative-angle form: score_p = q . (R_{p-t} k_p). The kernel never
        # rotates K "absolutely"; it builds the relative cos/sin fields from
        # the static position tables and the current step's cos_t/sin_t
        # (trig identity), multiplies the raw reconstructed block by each
        # field once (bf16), and uses TWO query embeds (q and its
        # rotate-half image, with int8 scale and attention scale folded in).
        # k_scale_ref here doubles as the (1, hd) cos_t/sin_t carrier — this
        # is a TIMING prototype; numerics live in the real kernel.
        cos_t = trig_t_ref[0:1, :]  # (1, hd)
        sin_t = trig_t_ref[1:2, :]
        cos_blk = cos_ref[...].astype(jnp.float32)
        sin_blk = sin_ref[...].astype(jnp.float32)
        cos_rel = cos_blk * cos_t + sin_blk * sin_t
        sin_rel = sin_blk * cos_t - cos_blk * sin_t
        if "f32" in stages:
            # 3D broadcast in f32 (sublane-8 native), cast fused into mul out
            k3 = k_pre.astype(jnp.float32).reshape(block_s, hkv, hd)
            a = (k3 * cos_rel[:, None, :]).astype(jnp.bfloat16)
            b2 = (k3 * sin_rel[:, None, :]).astype(jnp.bfloat16)
            k_rot = (a.reshape(block_s, m), b2.reshape(block_s, m))
        elif "tile2d" in stages:
            # expand fields to full width (lane-tiled), stay 2D bf16
            cos_w = pltpu.repeat(cos_rel.astype(jnp.bfloat16), hkv, axis=1)
            sin_w = pltpu.repeat(sin_rel.astype(jnp.bfloat16), hkv, axis=1)
            a = k_pre * cos_w  # k_pre already bf16, (block_s, m)
            b2 = k_pre * sin_w
            k_rot = (a, b2)
        else:
            k_bf = k_pre.reshape(block_s, hkv, hd)  # already bf16
            a = (k_bf * cos_rel.astype(jnp.bfloat16)[:, None, :]).reshape(
                block_s, m)
            b2 = (k_bf * sin_rel.astype(jnp.bfloat16)[:, None, :]).reshape(
                block_s, m)
            k_rot = (a, b2)
    elif "rope_roll" in stages:
        # Full-width tables: cos_ref = [cos, cos], sin_ref = [-sin, sin]
        # (sign of rotate_half folded into the sin table). One lane-roll by
        # hd/2 replaces the slice/concat shuffles.
        cos = cos_ref[...].astype(jnp.float32)[:, None, :]  # (bs, 1, hd)
        sin = sin_ref[...].astype(jnp.float32)[:, None, :]
        k_heads = k_pre.reshape(block_s, hkv, hd)
        k_rolled = pltpu.roll(k_heads, hd // 2, axis=2)
        k_rot = (
            (k_heads * cos + k_rolled * sin)
            .reshape(block_s, m)
            .astype(jnp.bfloat16)
        )
    else:
        k_rot = k_pre.astype(jnp.bfloat16)

    col_mask = (
        si * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    ) < len_ref[0, 0]
    if "scores" in stages:
        if isinstance(k_rot, tuple):
            a, b2 = k_rot
            qh = q_ref[0].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qh, a, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                qh, b2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # timing proxy: real kernel uses two distinct query embeds
        else:
            s = jax.lax.dot_general(
                q_ref[0].astype(jnp.bfloat16), k_rot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        s = jnp.where(col_mask, s, NEG_INF)
    else:
        # cheap surrogate keeping shapes: one column of k_rot broadcast
        s = jnp.broadcast_to(
            k_rot[:, :1].astype(jnp.float32).T, (q_ref.shape[1], block_s)
        ) * scale
        s = jnp.where(col_mask, s, NEG_INF)

    if "softmax" in stages:
        m_prev = m_scratch[...][:, :1]
        l_prev = l_scratch[...][:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.where(col_mask, jnp.exp(s - m_next), 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
    else:
        alpha = jnp.float32(1.0)
        p = s

    if "vpath" in stages:
        v_us_blk = v_us_ref[0].astype(jnp.bfloat16)
        t_curr = jnp.dot(
            p.astype(jnp.bfloat16), v_us_blk, preferred_element_type=jnp.float32
        )
        t_scratch[...] = t_scratch[...] * alpha + t_curr
    else:
        t_scratch[...] = t_scratch[...] * alpha + jnp.sum(
            p, axis=-1, keepdims=True
        ) + v_us_ref[0].astype(jnp.float32)[:1, : t_scratch.shape[1]]

    @pl.when(si == num_s - 1)
    def _store():
        o_ref[0] = t_scratch[...][:, : o_ref.shape[2]].astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_scratch[...][:, :1].T, lse_ref.shape[1:]
        )


def build_step(stages, block_s, s, b=1):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    k_us = jax.random.randint(ks[0], (b, s, RK), -127, 127, jnp.int8)
    k_vt = jax.random.randint(ks[1], (b, RK, HKV * HD), -127, 127, jnp.int8)
    v_us = jax.random.randint(ks[2], (b, s, RV), -127, 127, jnp.int8)
    k_scale = jnp.abs(jax.random.normal(ks[3], (b, 1, HKV * HD), jnp.float32))
    from xkv_tpu.ops.rope import rope_cos_sin

    cos_p, sin_p = rope_cos_sin(jnp.arange(s), HD, 500000.0, None)
    half = HD // 2
    ch, sh = cos_p[:, :half], sin_p[:, :half]
    if "rope_roll" in stages or "ropeq" in stages:
        # full-width tables with rotate_half's sign folded into sin
        cos_p = jnp.concatenate([ch, ch], axis=-1).astype(jnp.bfloat16)
        sin_p = jnp.concatenate([-sh, sh], axis=-1).astype(jnp.bfloat16)
        table_w = HD
    else:
        cos_p, sin_p = ch.astype(jnp.bfloat16), sh.astype(jnp.bfloat16)
        table_w = half
    lengths = jnp.full((b, 1), s, jnp.int32)
    trig_t = jnp.stack([
        jnp.cos(jnp.full((HD,), 0.37, jnp.float32)),
        jnp.sin(jnp.full((HD,), 0.37, jnp.float32)),
    ])  # (2, HD) per-step relative-angle scalars (timing surrogate)

    grid_s = s // block_s
    kernel = functools.partial(
        _kernel, scale=HD ** -0.5, block_s=block_s, hkv=HKV, hd=HD,
        stages=stages,
    )
    m = HKV * HD

    def step(q_emb):
        out, lse = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((b, HQ, HD), jnp.bfloat16),
                jax.ShapeDtypeStruct((b, 8, HQ), jnp.float32),
            ),
            grid=(b, grid_s),
            in_specs=[
                pl.BlockSpec((1, HQ, m), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((1, 1), lambda bi, si: (bi, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_s, RK), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, RK, m), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((1, block_s, RV), lambda bi, si: (bi, si, 0)),
                pl.BlockSpec((1, 1, m), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((block_s, table_w), lambda bi, si: (si, 0)),
                pl.BlockSpec((block_s, table_w), lambda bi, si: (si, 0)),
                pl.BlockSpec((2, HD), lambda bi, si: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, HQ, HD), lambda bi, si: (bi, 0, 0)),
                pl.BlockSpec((1, 8, HQ), lambda bi, si: (bi, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((HQ, 128), jnp.float32),
                pltpu.VMEM((HQ, 128), jnp.float32),
                pltpu.VMEM((HQ, RV), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q_emb, lengths, k_us, k_vt, v_us, k_scale, cos_p, sin_p, trig_t)
        return out

    return step


def timed(step_fn, q0_base, n):
    def chain(q0, n_steps):
        def body(q, _):
            out = step_fn(q)
            nxt = jnp.tile(
                (out / (1.0 + jnp.abs(out))).astype(q0.dtype), (1, 1, HKV)
            )
            return nxt, ()

        q_last, _ = jax.lax.scan(body, q0, None, length=n_steps)
        return q_last

    f = jax.jit(chain, static_argnames=("n_steps",))

    def run(seed, steps):
        q0 = q0_base + 1e-3 * seed
        t0 = time.perf_counter()
        out = f(q0, n_steps=steps)
        jax.device_get(out)
        return time.perf_counter() - t0

    run(0, n)
    run(1, 2 * n)
    t1 = min(run(2 + i, n) for i in range(3))
    t2 = min(run(5 + i, 2 * n) for i in range(3))
    return max(t2 - t1, 0.0) / n


ALL = ["recon", "scalemul", "rope", "scores", "softmax", "vpath"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--block-s", type=int, default=1024)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--configs", default=None,
                    help="comma list: full,-recon,-scores,... (default all)")
    args = ap.parse_args()

    q0 = jax.random.normal(
        jax.random.PRNGKey(9), (1, HQ, HKV * HD), jnp.bfloat16
    )
    configs = (
        [("full", ALL)]
        + [(f"-{st}", [x for x in ALL if x != st]) for st in ALL]
        + [("roll-rope", [x if x != "rope" else "rope_roll" for x in ALL])]
        + [("ropeq", [x if x != "rope" else "ropeq" for x in ALL])]
        + [("ropeq2d", [x if x != "rope" else "ropeq" for x in ALL]
            + ["tile2d"])]
    )
    if args.configs:
        want = args.configs.split(",")
        configs = [c for c in configs if c[0] in want]
    base = None
    for name, stages in configs:
        step = build_step(tuple(stages), args.block_s, args.ctx)
        t = timed(step, q0, args.n)
        if name == "full":
            base = t
        delta = f"  (saves {1e3 * (base - t):6.3f} ms)" if base and name != "full" else ""
        print(f"{name:12s} {t * 1e3:8.3f} ms/call{delta}", flush=True)


if __name__ == "__main__":
    main()
