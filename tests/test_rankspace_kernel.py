"""Pallas rank-space decode kernel (rope_mode="post") vs the XLA oracle.

Runs in interpret mode on CPU; the same code path compiles via Mosaic on
TPU (verified in the round's on-chip drive).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.ops.attention import rankspace_decode_attention_xla
from xkv_tpu.ops.pallas.rankspace_attention import (
    rankspace_decode_attention,
    sparse_rankspace_decode_attention,
)

B, HQ, HKV, HD, S, RK, RV = 2, 4, 2, 16, 72, 12, 10
M = HKV * HD
SCALE = 1.0 / np.sqrt(HD)


def make_inputs(seed=0, ql=1, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (B, HQ, ql, HD), dtype)
    k_us = jax.random.normal(ks[1], (B, S, RK), dtype)
    k_vt = jax.random.normal(ks[2], (B, RK, M), dtype)
    v_us = jax.random.normal(ks[3], (B, S, RV), dtype)
    v_vt = jax.random.normal(ks[4], (B, RV, M), dtype)
    return q, k_us, k_vt, v_us, v_vt


@pytest.mark.parametrize("ql", [1, 4])
@pytest.mark.slow
def test_kernel_matches_xla_oracle(ql):
    q, k_us, k_vt, v_us, v_vt = make_inputs(ql=ql)
    lengths = jnp.asarray([S, S - 13], jnp.int32)
    ref = rankspace_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, SCALE, HKV, valid_len=lengths
    )
    out, lse = rankspace_decode_attention(
        q, k_us, k_vt, v_us, v_vt, lengths,
        scale=SCALE, num_kv_heads=HKV, block_s=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.out), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref.lse), rtol=2e-4, atol=2e-4
    )


def test_kernel_int8_matches_xla_rankspace():
    """Int8 factors: kernel (bf16 in-kernel compute) vs the fp32 XLA
    rank-space path over the SAME quantized arrays — the difference is
    pure compute precision, so the tolerance is bf16-scale. The
    quantization error itself is covered by engine-level argmax-agreement
    tests (tests/test_rope_post.py::test_int8_post_factors_close)."""
    from xkv_tpu.compress.quant import quantize_k_factors, quantize_v_factors

    q, k_us, k_vt, v_us, v_vt = make_inputs(seed=3)
    qk = quantize_k_factors(k_us, k_vt)
    qv = quantize_v_factors(v_us, v_vt)
    ref = rankspace_decode_attention_xla(
        q, qk.us_q, qk.vt_q, qv.us_q, qv.vt, SCALE, HKV,
        k_scale_slice=qk.out_scale, v_rank_scale=qv.rank_scale,
    )
    out, lse = rankspace_decode_attention(
        q, qk.us_q, qk.vt_q, qv.us_q, qv.vt, None,
        k_scale_slice=qk.out_scale, v_rank_scale=qv.rank_scale,
        scale=SCALE, num_kv_heads=HKV, block_s=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.out), rtol=4e-2, atol=4e-2
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref.lse), rtol=4e-2, atol=4e-2
    )


def test_sparse_kernel_matches_dense_when_all_selected():
    q, k_us, k_vt, v_us, v_vt = make_inputs(seed=5)
    block = 8
    nc = -(-S // block)
    ids = jnp.tile(jnp.arange(nc, dtype=jnp.int32)[None], (B, 1))
    lengths = jnp.asarray([S, S - 5], jnp.int32)
    dense_out, dense_lse = rankspace_decode_attention(
        q, k_us, k_vt, v_us, v_vt, lengths,
        scale=SCALE, num_kv_heads=HKV, block_s=block, interpret=True,
    )
    sp_out, sp_lse = sparse_rankspace_decode_attention(
        q, k_us, k_vt, v_us, v_vt, ids, lengths=lengths,
        scale=SCALE, num_kv_heads=HKV, block=block, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sp_out), np.asarray(dense_out), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sp_lse), np.asarray(dense_lse), rtol=2e-4, atol=2e-4
    )


def test_tp_kernel_matches_single_device():
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    from xkv_tpu.ops.pallas.rankspace_attention import (
        rankspace_decode_attention_tp,
    )

    mesh = Mesh(np.array(devs[:2]), ("model",))
    q, k_us, k_vt, v_us, v_vt = make_inputs(seed=7)
    ref = rankspace_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, SCALE, HKV
    )
    out, lse = rankspace_decode_attention_tp(
        mesh, q, k_us, k_vt, v_us, v_vt,
        scale=SCALE, num_kv_heads=HKV, block_s=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.out), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref.lse), rtol=2e-4, atol=2e-4
    )
