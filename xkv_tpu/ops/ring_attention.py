"""Ring attention: sequence-parallel attention over a mesh axis.

The reference handles long context on a single device (SURVEY.md §2.5 —
no SP/CP anywhere); the TPU build adds the standard ring scheme for
contexts that exceed one chip:

  * Q, K, V are sharded along the sequence axis over ``axis_name``.
  * Each of the n steps computes the local Q block against the currently
    held K/V block (with *global* positions for causal masking) and
    accumulates with online softmax, then rotates K/V to the next device
    with ``ppermute`` — K/V travel the ring while Q stays put, so every
    query sees every key after n steps with only neighbor ICI traffic.
  * Compute and communication are expressed per step; XLA overlaps the
    ppermute with the local attention where profitable.

Built on shard_map; works on the CPU virtual mesh for tests and on real
ICI rings identically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from xkv_tpu.ops.attention import NEG_INF


def _local_block_attention(q, k, v, scale, q_start, k_start, s_total, window,
                           causal=True):
    """Partial attention of a local Q block vs one K/V block with global
    causal masking. q: (b, hkv, qpk, sq, hd); k/v: (b, hkv, sk, hd).
    Returns (m, l, acc) statistics."""
    sq, sk = q.shape[3], k.shape[2]
    scores = jnp.einsum(
        "bgnqd,bgkd->bgnqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
    mask = cols < s_total
    if causal:
        mask &= cols <= rows
    if window is not None:
        mask &= cols > rows - window
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.where(mask[None, None, None], jnp.exp(scores - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "bgnqk,bgkd->bgnqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return m, l, acc


def ring_attention(
    q: jax.Array,  # (b, hq, s, hd) — s sharded over axis_name
    k: jax.Array,  # (b, hkv, s, hd)
    v: jax.Array,  # (b, hkv, s, hd)
    *,
    mesh: Mesh,
    axis_name: str = "data",
    scale: float,
    causal: bool = True,
    window: Optional[int] = None,
) -> jax.Array:
    """Sequence-parallel attention (causal by default; ``causal=False``
    runs the full bidirectional mask). Causal rings skip fully-masked
    future blocks via lax.cond — n(n+1)/2 of n^2 block computations run
    (the K/V rotation itself is unconditional). Returns (b, hq, s, hd)
    sharded like q. Requires s % mesh.shape[axis_name] == 0."""
    from jax import shard_map

    b, hq, s, hd = q.shape
    hkv = k.shape[1]
    n = mesh.shape[axis_name]
    assert s % n == 0, f"seq {s} must divide ring size {n}"
    s_local = s // n

    def local_fn(q_l, k_l, v_l):
        # q_l: (b, hq, s_local, hd); k_l/v_l: (b, hkv, s_local, hd)
        idx = jax.lax.axis_index(axis_name)
        qg = q_l.reshape(b, hkv, hq // hkv, s_local, hd)
        q_start = idx * s_local

        def step(carry, i):
            m_prev, l_prev, acc, k_cur, v_cur = carry
            # Block currently held arrived from shard (idx - i) mod n.
            src = (idx - i) % n
            k_start = src * s_local

            def compute(_):
                m_c, l_c, acc_c = _local_block_attention(
                    qg, k_cur, v_cur, scale, q_start, k_start, s, window,
                    causal=causal,
                )
                m_next = jnp.maximum(m_prev, m_c)
                alpha = jnp.exp(m_prev - m_next)
                beta = jnp.exp(m_c - m_next)
                l_next = alpha * l_prev + beta * l_c
                acc_next = acc * alpha + acc_c * beta
                return m_next, l_next, acc_next

            def skip(_):
                return m_prev, l_prev, acc

            if causal:
                # Causal: a K block strictly in this shard's future is
                # fully masked — skip its FLOPs (halves average compute;
                # the block still travels the ring). A windowed causal
                # mask also dies once the block falls behind the window.
                needed = src <= idx
                if window is not None:
                    # window mask is col > row - window; with rows starting
                    # at q_start, a block is live iff its NEWEST col
                    # (k_start + s_local - 1) clears q_start - window.
                    needed &= k_start + s_local - 1 > q_start - window
                m_next, l_next, acc_next = jax.lax.cond(
                    needed, compute, skip, None
                )
            else:
                m_next, l_next, acc_next = compute(None)
            # Rotate K/V around the ring (shard i -> i+1).
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
            return (m_next, l_next, acc_next, k_nxt, v_nxt), None

        init = (
            jnp.full((b, hkv, hq // hkv, s_local, 1), -jnp.inf, jnp.float32),
            jnp.zeros((b, hkv, hq // hkv, s_local, 1), jnp.float32),
            jnp.zeros((b, hkv, hq // hkv, s_local, hd), jnp.float32),
            k_l,
            v_l,
        )
        (m, l, acc, _, _), _ = jax.lax.scan(step, init, jnp.arange(n))
        out = acc / jnp.maximum(l, 1e-30)
        return out.reshape(b, hq, s_local, hd).astype(q_l.dtype)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
        ),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )(q, k, v)
