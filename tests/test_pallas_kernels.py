"""Pallas kernel parity tests vs the XLA reference paths (interpret mode).

Real-hardware runs of the same kernels happen in bench.py / examples on the
TPU chip; these tests pin the numerics.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xkv_tpu.ops.attention import (
    attention_partial,
    factored_decode_attention_xla,
    merge_partials,
    mha_reference,
)
from xkv_tpu.ops.pallas.flash_attention import flash_attention_fwd
from xkv_tpu.ops.pallas.lowrank_attention import lowrank_decode_attention
from xkv_tpu.ops.rope import rope_cos_sin


def rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("s_q,s_k,block", [(64, 64, 32), (96, 96, 32), (40, 40, 32)])
def test_flash_causal_matches_reference(s_q, s_k, block):
    b, hq, hkv, hd = 2, 4, 2, 32
    q = rand(0, (b, hq, s_q, hd))
    k = rand(1, (b, hkv, s_k, hd))
    v = rand(2, (b, hkv, s_k, hd))
    scale = 1.0 / math.sqrt(hd)
    ref = mha_reference(q, k, v, scale, causal=True)  # (b, hq, s, hd)
    got = flash_attention_fwd(
        q, k, v, scale=scale, causal=True, block_q=block, block_k=block,
        interpret=True,
    )  # (b, s, hq, hd)
    got = jnp.transpose(got, (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_sliding_window_matches_reference():
    b, hq, hkv, hd, s = 1, 2, 2, 32, 96
    q = rand(3, (b, hq, s, hd))
    k = rand(4, (b, hkv, s, hd))
    v = rand(5, (b, hkv, s, hd))
    scale = 1.0 / math.sqrt(hd)
    ref = mha_reference(q, k, v, scale, causal=True, window=40)
    got = flash_attention_fwd(
        q, k, v, scale=scale, causal=True, window=40, block_q=32, block_k=32,
        interpret=True,
    )
    got = jnp.transpose(got, (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_mha_q_per_kv_1():
    b, h, hd, s = 1, 2, 32, 64
    q = rand(6, (b, h, s, hd))
    k = rand(7, (b, h, s, hd))
    v = rand(8, (b, h, s, hd))
    scale = 0.2
    ref = mha_reference(q, k, v, scale, causal=True)
    got = flash_attention_fwd(
        q, k, v, scale=scale, causal=True, block_q=32, block_k=32, interpret=True
    )
    got = jnp.transpose(got, (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("s_p,block_s", [(128, 64), (100, 64)])
@pytest.mark.slow
def test_lowrank_decode_matches_xla_reference(s_p, block_s):
    b, hq, hkv, hd = 2, 4, 2, 32
    rk, rv = 24, 28
    g = 2  # group of 2 layers -> vt has 2*hkv*hd columns; slice one layer
    q_pre = rand(10, (b, hq, 1, hd))
    k_us = rand(11, (b, s_p, rk))
    k_vt_full = rand(12, (b, rk, g * hkv * hd)) * 0.3
    v_us = rand(13, (b, s_p, rv))
    v_vt_full = rand(14, (b, rv, g * hkv * hd)) * 0.3
    k_vt = k_vt_full[:, :, : hkv * hd]
    v_vt = v_vt_full[:, :, : hkv * hd]
    cos, sin = rope_cos_sin(jnp.arange(s_p), hd, theta=10000.0)
    scale = 1.0 / math.sqrt(hd)

    # decode query sits at position s_p; the XLA oracle takes the rotated
    # query, the kernel takes the pre-RoPE query + its trig row
    from xkv_tpu.ops.rope import apply_rope

    cos_t, sin_t = rope_cos_sin(jnp.asarray([s_p]), hd, theta=10000.0)
    q = apply_rope(q_pre, cos_t[None], sin_t[None])

    ref = factored_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, cos, sin, scale, num_kv_heads=hkv
    )
    out, lse = lowrank_decode_attention(
        q_pre, k_us, k_vt, v_us, v_vt, cos, sin,
        jnp.broadcast_to(cos_t, (b, hd)), jnp.broadcast_to(sin_t, (b, hd)),
        scale=scale, num_kv_heads=hkv, block_s=block_s, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.out), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref.lse), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_lowrank_plus_tail_merge_matches_full_attention():
    """Factored segment (kernel) + dense tail (XLA) merged == attention over
    the concatenated keys. Uses full-rank factors so reconstruction is exact."""
    b, hq, hkv, hd = 1, 4, 2, 16
    s_p, s_t = 64, 8
    m = hkv * hd
    rank = min(s_p, m)  # full rank -> exact

    k_full = rand(20, (b, hkv, s_p, hd)) * 0.5
    v_full = rand(21, (b, hkv, s_p, hd)) * 0.5
    from xkv_tpu.compress.svd import heads_to_matrix, truncated_svd

    fac_k = truncated_svd(heads_to_matrix(k_full), rank)
    fac_v = truncated_svd(heads_to_matrix(v_full), rank)

    cos, sin = rope_cos_sin(jnp.arange(s_p), hd, theta=10000.0)
    from xkv_tpu.ops.rope import apply_rope

    k_rot = apply_rope(k_full, cos[None], sin[None])

    q_pre = rand(22, (b, hq, 1, hd))
    k_tail = rand(23, (b, hkv, s_t, hd))
    v_tail = rand(24, (b, hkv, s_t, hd))
    scale = 1.0 / math.sqrt(hd)

    # decode query at position s_p + s_t (post-RoPE for the oracle + tail)
    t = s_p + s_t
    cos_t, sin_t = rope_cos_sin(jnp.asarray([t]), hd, theta=10000.0)
    q = apply_rope(q_pre, cos_t[None], sin_t[None])

    # Oracle: single softmax over concatenated keys.
    k_cat = jnp.concatenate([k_rot, k_tail], axis=2)
    v_cat = jnp.concatenate([v_full, v_tail], axis=2)
    oracle = attention_partial(q, k_cat, v_cat, scale).out

    part_f = lowrank_decode_attention(
        q_pre, fac_k.us, fac_k.vt, fac_v.us, fac_v.vt, cos, sin,
        jnp.broadcast_to(cos_t, (b, hd)), jnp.broadcast_to(sin_t, (b, hd)),
        scale=scale, num_kv_heads=hkv, block_s=32, interpret=True,
    )
    from xkv_tpu.ops.attention import PartialAttention, dense_decode_attention_xla

    part_t = dense_decode_attention_xla(q, k_tail, v_tail, scale)
    merged = merge_partials(PartialAttention(*part_f), part_t)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(oracle), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("n_sel,lengths", [(3, None), (4, None), (2, (40, 64))])
@pytest.mark.slow
def test_sparse_lowrank_matches_sparse_xla(n_sel, lengths):
    """The scalar-prefetch sparse kernel == the gather-based XLA sparse
    reference on the same selected chunk ids (incl. per-sequence valid
    lengths and a partial final chunk)."""
    from xkv_tpu.ops.attention import sparse_factored_decode_attention_xla
    from xkv_tpu.ops.pallas.lowrank_attention import (
        sparse_lowrank_decode_attention,
    )
    from xkv_tpu.ops.rope import apply_rope

    b, hq, hkv, hd = 2, 4, 2, 32
    rk, rv = 24, 28
    s_p, block = 64, 16  # 4 chunks
    q_pre = rand(30, (b, hq, 1, hd))
    k_us = rand(31, (b, s_p, rk))
    k_vt = rand(32, (b, rk, hkv * hd)) * 0.3
    v_us = rand(33, (b, s_p, rv))
    v_vt = rand(34, (b, rv, hkv * hd)) * 0.3
    cos, sin = rope_cos_sin(jnp.arange(s_p), hd, theta=10000.0)
    scale = 1.0 / math.sqrt(hd)
    cos_t, sin_t = rope_cos_sin(jnp.asarray([s_p]), hd, theta=10000.0)
    q = apply_rope(q_pre, cos_t[None], sin_t[None])

    ids = jnp.asarray([[0, 2, 3, 1][:n_sel], [3, 1, 0, 2][:n_sel]], jnp.int32)
    vlen = None if lengths is None else jnp.asarray(lengths, jnp.int32)

    ref = sparse_factored_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, cos, sin, ids, scale, hkv, block=block,
        valid_len=vlen,
    )
    out, lse = sparse_lowrank_decode_attention(
        q_pre, k_us, k_vt, v_us, v_vt, cos, sin,
        jnp.broadcast_to(cos_t, (b, hd)), jnp.broadcast_to(sin_t, (b, hd)),
        ids, lengths=vlen,
        scale=scale, num_kv_heads=hkv, block=block, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.out), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref.lse), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_lowrank_multiquery_matches_xla_reference():
    """ql > 1 (the speculative verify pass): every (position, head) row of
    the kernel must equal the XLA oracle run per position."""
    from xkv_tpu.ops.rope import apply_rope

    b, hq, hkv, hd, ql = 2, 4, 2, 32, 3
    rk, rv = 24, 28
    s_p = 64
    q_pre = rand(40, (b, hq, ql, hd))
    k_us = rand(41, (b, s_p, rk))
    k_vt = rand(42, (b, rk, hkv * hd)) * 0.3
    v_us = rand(43, (b, s_p, rv))
    v_vt = rand(44, (b, rv, hkv * hd)) * 0.3
    cos, sin = rope_cos_sin(jnp.arange(s_p), hd, theta=10000.0)
    scale = 1.0 / math.sqrt(hd)
    positions = s_p + jnp.arange(ql)
    cos_t, sin_t = rope_cos_sin(positions, hd, theta=10000.0)  # (ql, hd)
    q = apply_rope(q_pre, cos_t[None], sin_t[None])  # rotated per position

    ref = factored_decode_attention_xla(
        q, k_us, k_vt, v_us, v_vt, cos, sin, scale, num_kv_heads=hkv
    )
    out, lse = lowrank_decode_attention(
        q_pre, k_us, k_vt, v_us, v_vt, cos, sin,
        jnp.broadcast_to(cos_t[None], (b, ql, hd)),
        jnp.broadcast_to(sin_t[None], (b, ql, hd)),
        scale=scale, num_kv_heads=hkv, block_s=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.out), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref.lse), rtol=1e-3, atol=1e-3
    )
