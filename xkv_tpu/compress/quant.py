"""Int8 quantization of low-rank factors (SVDq-inspired).

Quantizing the rank-space coordinates halves cache traffic/capacity again
(16x total vs bf16 dense at xKV-4 ranks) and lets the reconstruction matmul
run on the MXU's int8 path (2x bf16 rate) — turning the decode kernel's
compute-bound K reconstruction into a win over the dense baseline.

Scale folding (so the kernel needs only one post-GEMM scale):
    us ≈ us_q * su[None, :]          su: per-rank scale
    vt' = su[:, None] * vt           fold su into the basis
    vt' ≈ vt_q * sv[None, :]         sv: per-output-column scale
    us @ vt = (us_q @ vt_q) * sv[None, :]      (int8 x int8 -> int32 GEMM)

For the value path the kernel contracts P @ us first, so ``us_q`` keeps its
per-rank scale separate (applied to the rank-space accumulator t):
    P @ us = (P @ us_q) * su[None, :]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedKFactors(NamedTuple):
    """K-side: scales folded so reconstruction = (us_q @ vt_q) * out_scale."""

    us_q: jax.Array  # (b, s, r) int8
    vt_q: jax.Array  # (b, r, m) int8
    out_scale: jax.Array  # (b, 1, m) fp32


class QuantizedVFactors(NamedTuple):
    """V-side: per-rank scale on us (applied to t = P @ us_q), vt in bf16
    with its own folded column scale already applied."""

    us_q: jax.Array  # (b, s, r) int8
    rank_scale: jax.Array  # (b, 1, r) fp32
    vt: jax.Array  # (b, r, m) bf16


def _per_col_scale(x: jax.Array, axis: int) -> jax.Array:
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True, initial=0.0)
    return jnp.maximum(amax, 1e-8) / 127.0


def _q8(x: jax.Array, scale: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def quantize_k_factors(us: jax.Array, vt: jax.Array) -> QuantizedKFactors:
    """us (b, s, r), vt (b, r, m) fp32 -> int8 K factors with folded scales."""
    us = us.astype(jnp.float32)
    vt = vt.astype(jnp.float32)
    su = _per_col_scale(us, axis=1)  # (b, 1, r)
    us_q = _q8(us, su)
    vt_folded = jnp.swapaxes(su, 1, 2) * vt  # (b, r, 1) * (b, r, m)
    sv = _per_col_scale(vt_folded, axis=1)  # (b, 1, m)
    vt_q = _q8(vt_folded, sv)
    return QuantizedKFactors(us_q=us_q, vt_q=vt_q, out_scale=sv)


def dequantize_k(qf: QuantizedKFactors) -> jax.Array:
    """(b, s, m) fp32 reconstruction — XLA fallback / tests."""
    prod = jnp.einsum(
        "bsr,brm->bsm",
        qf.us_q.astype(jnp.int32),
        qf.vt_q.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    )
    return prod.astype(jnp.float32) * qf.out_scale


class QuantizedKFactorsMixed(NamedTuple):
    """SVDq-style mixed-precision K factors: the top ``r_hi`` ranks (largest
    singular values — svd.py returns factors in descending-sigma order) keep
    int8 coordinates, the tail ranks drop to int4 (per-rank scales, same
    folding as the int8 path). Reconstruction:

        us @ vt = (us8_q @ vt8_q) * out_scale
                + (us4_q @ vt4_q) * (out_scale * lo_ratio)

    so the kernel runs one int8 and one int4 MXU GEMM and folds the int4
    product in with a single per-column multiply (``lo_ratio`` =
    sv4 / sv8). int4 runs at 2x the int8 MXU rate on v5e — the decode
    kernel's dominant reconstruction GEMM is what this buys down.
    """

    us8_q: jax.Array  # (b, s, r_hi) int8
    vt8_q: jax.Array  # (b, r_hi, m) int8
    us4_q: jax.Array  # (b, s, r_lo) int4
    vt4_q: jax.Array  # (b, r_lo, m) int4
    out_scale: jax.Array  # (b, 1, m) fp32 — int8 part's column scale
    lo_ratio: jax.Array  # (b, 1, m) fp32 — int4 column scale / int8's


def _q4(x: jax.Array, scale: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(x / scale), -7, 7).astype(jnp.int4)


def _per_col_scale4(x: jax.Array, axis: int) -> jax.Array:
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True, initial=0.0)
    return jnp.maximum(amax, 1e-8) / 7.0


def quantize_k_factors_mixed(
    us: jax.Array, vt: jax.Array, r_hi: int
) -> QuantizedKFactorsMixed:
    """us (b, s, r), vt (b, r, m) fp32, ranks ordered by descending singular
    value -> int8 top-``r_hi`` + int4 tail factors with folded scales."""
    us = us.astype(jnp.float32)
    vt = vt.astype(jnp.float32)
    hi = quantize_k_factors(us[:, :, :r_hi], vt[:, :r_hi, :])

    us_lo = us[:, :, r_hi:]
    vt_lo = vt[:, r_hi:, :]
    su = _per_col_scale4(us_lo, axis=1)  # (b, 1, r_lo)
    us4_q = _q4(us_lo, su)
    vt_folded = jnp.swapaxes(su, 1, 2) * vt_lo
    sv4 = _per_col_scale4(vt_folded, axis=1)  # (b, 1, m)
    vt4_q = _q4(vt_folded, sv4)
    return QuantizedKFactorsMixed(
        us8_q=hi.us_q, vt8_q=hi.vt_q, us4_q=us4_q, vt4_q=vt4_q,
        out_scale=hi.out_scale, lo_ratio=sv4 / hi.out_scale,
    )


def dequantize_k_mixed(qf: QuantizedKFactorsMixed) -> jax.Array:
    """(b, s, m) fp32 reconstruction — XLA fallback / tests."""
    hi = jnp.einsum(
        "bsr,brm->bsm",
        qf.us8_q.astype(jnp.int32), qf.vt8_q.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    lo = jnp.einsum(
        "bsr,brm->bsm",
        qf.us4_q.astype(jnp.int32), qf.vt4_q.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return (hi + lo * qf.lo_ratio) * qf.out_scale


def quantize_v_factors(us: jax.Array, vt: jax.Array) -> QuantizedVFactors:
    """us (b, s, r), vt (b, r, m) fp32 -> int8 us + bf16 vt."""
    us = us.astype(jnp.float32)
    su = _per_col_scale(us, axis=1)  # (b, 1, r)
    us_q = _q8(us, su)
    return QuantizedVFactors(
        us_q=us_q, rank_scale=su, vt=vt.astype(jnp.bfloat16)
    )


def dequantize_v(qf: QuantizedVFactors) -> jax.Array:
    us = qf.us_q.astype(jnp.float32) * qf.rank_scale
    return jnp.einsum(
        "bsr,brm->bsm", us, qf.vt.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
