"""Low-rank SVD factorization of stacked KV matrices, TPU-first.

The reference performs a *full* cuSOLVER SVD and immediately multiplies the
truncated factors back into a dense (lossy) tensor
(`xKV/customized_cache/fake_layer_merge_dynamic_cache.py:11-29`). On TPU a
full SVD of a (65536, 4096) matrix is not viable, and the whole point of the
real system is to *keep* the factors. This module provides:

  * ``truncated_svd``   — exact ``jnp.linalg.svd`` + truncation (small shapes,
                          ground truth for tests).
  * ``randomized_svd``  — Halko-Martinsson-Tropp randomized range finder with
                          subspace iteration: all FLOPs are big matmuls that
                          map onto the MXU; only an O((r+p)^2) SVD runs on the
                          small projected matrix. fp32 accumulation,
                          deterministic seeding.
  * ``factorize``       — returns ``LowRankFactors`` with ``us = U @ diag(S)``
                          (the per-token coordinates, shape (b, s, r)) and
                          ``vt`` (the shared basis, shape (b, r, m)).
  * ``reconstruct``     — ``us @ vt`` (used by the fake-parity path & tests).
  * ``fake_svd``        — reference-parity helper: factorize + reconstruct on
                          a (b, nh, s, hd) tensor, mirroring the reference's
                          head-dim flattening semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LowRankFactors(NamedTuple):
    """Rank-r factorization ``A ≈ us @ vt``.

    us: (..., s, r)  per-token coordinates, U @ diag(S). This is the large,
        sequence-length-proportional part of the compressed cache.
    vt: (..., r, m)  shared right basis (rows of V^T). Small; columns are
        blocked by (layer, kv_head, head_dim) for grouped KV matrices.
    """

    us: jax.Array
    vt: jax.Array

    @property
    def rank(self) -> int:
        return self.us.shape[-1]


def _svd_tall(mat: jax.Array, rank: int) -> LowRankFactors:
    """Exact truncated SVD of a single (s, m) fp32 matrix."""
    u, s, vt = jnp.linalg.svd(mat, full_matrices=False)
    us = u[:, :rank] * s[:rank][None, :]
    return LowRankFactors(us=us, vt=vt[:rank, :])


def truncated_svd(mat: jax.Array, rank: int) -> LowRankFactors:
    """Exact truncated SVD over the last two dims; batch dims vmapped.

    fp32 compute regardless of input dtype (the reference also upcasts,
    `fake_layer_merge_dynamic_cache.py:176`).
    """
    mat = mat.astype(jnp.float32)
    fn = functools.partial(_svd_tall, rank=rank)
    for _ in range(mat.ndim - 2):
        fn = jax.vmap(fn)
    return fn(mat)


def _randomized_svd_one(
    mat: jax.Array, rank: int, oversample: int, n_iter: int, key: jax.Array
) -> LowRankFactors:
    """Randomized truncated SVD of one (s, m) matrix (HMT 2011, Alg. 4.4/5.1).

    sketch   Y = A @ Omega                (s, r+p)   — MXU matmul
    iterate  Y = A @ (A^T @ Y), QR each step for stability
    project  B = Q^T @ A                  (r+p, m)   — MXU matmul
    small    U_b, S, Vt = svd(B);  U = Q @ U_b
    """
    s, m = mat.shape
    sketch = min(rank + oversample, min(s, m))
    omega = jax.random.normal(key, (m, sketch), dtype=jnp.float32)
    y = mat @ omega
    # Subspace (power) iteration with re-orthogonalization.
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z = mat.T @ q
        z, _ = jnp.linalg.qr(z)
        y = mat @ z
        q, _ = jnp.linalg.qr(y)
    b = q.T @ mat  # (sketch, m)
    u_b, sv, vt = jnp.linalg.svd(b, full_matrices=False)
    us = (q @ u_b[:, :rank]) * sv[:rank][None, :]
    return LowRankFactors(us=us, vt=vt[:rank, :])


def randomized_svd(
    mat: jax.Array,
    rank: int,
    *,
    oversample: int = 16,
    n_iter: int = 2,
    seed: int = 0,
) -> LowRankFactors:
    """Randomized truncated SVD over the last two dims; batch dims vmapped.

    Deterministic for a fixed ``seed`` (the reference rejected
    ``torch.svd_lowrank`` over determinism, `fake_layer_merge_dynamic_cache.py:16-18`;
    JAX PRNG gives us the fast path *and* determinism).
    """
    mat = mat.astype(jnp.float32)
    key = jax.random.PRNGKey(seed)
    fn = functools.partial(
        _randomized_svd_one, rank=rank, oversample=oversample, n_iter=n_iter, key=key
    )
    for _ in range(mat.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0,))
    return fn(mat)


def factorize(
    mat: jax.Array,
    rank: int,
    *,
    method: str = "randomized",
    oversample: int = 16,
    n_iter: int = 2,
    seed: int = 0,
) -> LowRankFactors:
    """Factorize (..., s, m) into rank-r ``LowRankFactors`` (fp32)."""
    if method == "exact":
        return truncated_svd(mat, rank)
    if method == "randomized":
        return randomized_svd(mat, rank, oversample=oversample, n_iter=n_iter, seed=seed)
    raise ValueError(f"Unknown SVD method {method!r}")


def reconstruct(factors: LowRankFactors, dtype=None) -> jax.Array:
    """Dense reconstruction ``us @ vt``; optionally cast (e.g. back to bf16)."""
    out = jnp.einsum(
        "...sr,...rm->...sm", factors.us, factors.vt, preferred_element_type=jnp.float32
    )
    return out.astype(dtype) if dtype is not None else out


def heads_to_matrix(x: jax.Array) -> jax.Array:
    """(b, nh, s, hd) -> (b, s, nh*hd), matching the reference's flattening
    (`fake_layer_merge_dynamic_cache.py:14`)."""
    b, nh, s, hd = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, s, nh * hd)


def matrix_to_heads(x: jax.Array, nh: int) -> jax.Array:
    """(b, s, nh*hd) -> (b, nh, s, hd), inverse of ``heads_to_matrix``."""
    b, s, m = x.shape
    return jnp.transpose(x.reshape(b, s, nh, m // nh), (0, 2, 1, 3))


def fake_svd(x: jax.Array, rank: int, *, method: str = "exact", **kw) -> jax.Array:
    """Reference-parity 'fake' compression: SVD -> truncate -> multiply back.

    Input/output (b, nh, s, hd); mirrors `fake_layer_merge_dynamic_cache.py:11-29`
    including the fp32 round trip.
    """
    dtype = x.dtype
    nh = x.shape[1]
    mat = heads_to_matrix(x)
    fac = factorize(mat, rank, method=method, **kw)
    return matrix_to_heads(reconstruct(fac), nh).astype(dtype)
