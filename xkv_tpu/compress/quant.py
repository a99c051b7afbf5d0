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


# --------------------------------------------------------------- packed int4
#
# The rank-space decode kernel (rope_mode="post") is HBM-bound on the us
# stream; mixed int8 (top ranks) + int4 (tail ranks, singular-ordered so
# the tail carries the least energy) cuts it ~1.6x. Nibbles are packed two
# per int8 byte in EVEN/ODD rank pairs: byte j of a packed row holds ranks
# (2j) in the high nibble and (2j+1) in the low nibble. The kernel unpacks
# with two shifts and a lane concat, producing tail ranks in [evens | odds]
# order — so every rank-indexed companion array (q embeds, v_vt rows,
# per-rank scales) is PERMUTED to that order at quantization time and no
# runtime shuffle exists anywhere.


def eo_perm(r_lo: int) -> jnp.ndarray:
    """[0, 2, 4, ..., 1, 3, 5, ...] — the unpack order of packed pairs."""
    idx = jnp.arange(r_lo)
    return jnp.concatenate([idx[::2], idx[1::2]])


def pack_int4_pairs(vals: jax.Array) -> jax.Array:
    """vals (..., r_lo) int32 in [-7, 7] -> (..., r_lo/2) int8 packed."""
    even = vals[..., ::2]
    odd = vals[..., 1::2]
    return ((even << 4) | (odd & 0xF)).astype(jnp.int8)


def unpack_int4_pairs(packed: jax.Array):
    """(..., r_lo/2) int8 -> (evens, odds) int32, each (..., r_lo/2).
    XLA reference of the kernel's in-VMEM unpack."""
    x = packed.astype(jnp.int32)
    hi = x >> 4  # arithmetic shift: sign-extends the high nibble
    lo = ((x & 0xF) ^ 8) - 8  # sign-extend the low nibble
    return hi, lo


class QuantizedKFactorsMixed4(NamedTuple):
    """K-side mixed int8+int4 with the tail nibbles PACKED (the kernel
    format — `QuantizedKFactorsMixed` above keeps jnp.int4 arrays for the
    math/tests). Reconstruction:

        us @ vt = (us8 @ vt8) * out_scale
                + (unpack(us4p)[eo_perm] @ vt4) * scale4

    where vt4 rows are already stored in [evens | odds] order.
    """

    us8: jax.Array  # (b, s, r_hi) int8
    us4p: jax.Array  # (b, s, r_lo/2) int8 — packed nibble pairs
    vt8: jax.Array  # (b, r_hi, m) int8
    vt4: jax.Array  # (b, r_lo, m) int8 — rows in [evens | odds] order
    out_scale: jax.Array  # (b, 1, m) fp32 — int8 part's column scale
    scale4: jax.Array  # (b, 1, m) fp32 — int4 part's column scale


class QuantizedVFactorsMixed4(NamedTuple):
    """V-side mixed: us8 top ranks + packed int4 tail; rank_scale and the
    bf16 vt rows are stored in the kernel's output rank order
    [hi | lo-evens | lo-odds], so t = P @ [us8 | unpack(us4p)] needs no
    permutation downstream."""

    us8: jax.Array  # (b, s, r_hi) int8
    us4p: jax.Array  # (b, s, r_lo/2) int8
    rank_scale: jax.Array  # (b, 1, r) fp32 — [hi | lo-eo] order
    vt: jax.Array  # (b, r, m) bf16 — rows in [hi | lo-eo] order


def quantize_k_factors_mixed4(
    us: jax.Array, vt: jax.Array, r_hi: int
) -> QuantizedKFactorsMixed4:
    """Packed-kernel variant of ``quantize_k_factors_mixed``."""
    us = us.astype(jnp.float32)
    vt = vt.astype(jnp.float32)
    r = us.shape[2]
    r_lo = r - r_hi
    assert r_lo % 2 == 0, "int4 tail rank count must be even"
    hi = quantize_k_factors(us[:, :, :r_hi], vt[:, :r_hi, :])

    us_lo = us[:, :, r_hi:]
    vt_lo = vt[:, r_hi:, :]
    su = _per_col_scale4(us_lo, axis=1)  # (b, 1, r_lo)
    q4 = jnp.clip(jnp.round(us_lo / su), -7, 7).astype(jnp.int32)
    us4p = pack_int4_pairs(q4)
    vt_folded = jnp.swapaxes(su, 1, 2) * vt_lo
    sv4 = _per_col_scale4(vt_folded, axis=1)  # (b, 1, m)
    vt4_q = _q4(vt_folded, sv4).astype(jnp.int8)
    perm = eo_perm(r_lo)
    return QuantizedKFactorsMixed4(
        us8=hi.us_q, us4p=us4p, vt8=hi.vt_q,
        vt4=jnp.take(vt4_q, perm, axis=1),
        out_scale=hi.out_scale, scale4=sv4,
    )


def dequantize_k_mixed4(qf: QuantizedKFactorsMixed4) -> jax.Array:
    """(b, s, m) fp32 reconstruction — XLA fallback / tests."""
    hi = jnp.einsum(
        "bsr,brm->bsm",
        qf.us8.astype(jnp.int32), qf.vt8.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    ev, od = unpack_int4_pairs(qf.us4p)
    us_lo = jnp.concatenate([ev, od], axis=-1)  # [evens | odds]
    lo = jnp.einsum(
        "bsr,brm->bsm", us_lo, qf.vt4.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return hi * qf.out_scale + lo * qf.scale4


def quantize_v_factors_mixed4(
    us: jax.Array, vt: jax.Array, r_hi: int
) -> QuantizedVFactorsMixed4:
    us = us.astype(jnp.float32)
    r = us.shape[2]
    r_lo = r - r_hi
    assert r_lo % 2 == 0, "int4 tail rank count must be even"
    su8 = _per_col_scale(us[:, :, :r_hi], axis=1)
    us8 = _q8(us[:, :, :r_hi], su8)
    us_lo = us[:, :, r_hi:]
    su4 = _per_col_scale4(us_lo, axis=1)
    q4 = jnp.clip(jnp.round(us_lo / su4), -7, 7).astype(jnp.int32)
    us4p = pack_int4_pairs(q4)
    perm = eo_perm(r_lo)
    rank_scale = jnp.concatenate(
        [su8, jnp.take(su4, perm, axis=2)], axis=2
    )  # (b, 1, r) in [hi | lo-eo] order
    vt_perm = jnp.concatenate(
        [vt[:, :r_hi], jnp.take(vt[:, r_hi:], perm, axis=1)], axis=1
    )
    return QuantizedVFactorsMixed4(
        us8=us8, us4p=us4p, rank_scale=rank_scale,
        vt=vt_perm.astype(jnp.bfloat16),
    )


def dequantize_v_mixed4(qf: QuantizedVFactorsMixed4) -> jax.Array:
    ev, od = unpack_int4_pairs(qf.us4p)
    us = jnp.concatenate(
        [qf.us8.astype(jnp.int32), ev, od], axis=-1
    ).astype(jnp.float32) * qf.rank_scale
    return jnp.einsum(
        "bsr,brm->bsm", us, qf.vt.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


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
