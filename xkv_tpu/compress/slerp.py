"""MiniCache-style SLERP merging of two layers' K/V, in pure jnp.

Numerics mirror the reference (`xKV/customized_cache/fake_layer_merge_dynamic_cache.py:32-100`):
row-wise spherical interpolation on the unit sphere with
  * linear-interpolation fallback for near-parallel rows (angle < 1e-7),
  * a divergence threshold ``d_min + (d_max - d_min) * gamma`` computed over
    all rows: only *divergent* rows take the merged vector (rescaled by each
    layer's row norm); non-divergent rows keep their original per-layer
    values.

Everything is vectorized elementwise math (VPU-friendly); no data-dependent
control flow, so it jits cleanly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def slerp_merge_rows(
    x1: jax.Array, x2: jax.Array, t: float = 0.5, gamma: float = 0.05,
    valid: jax.Array = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Row-wise SLERP of (L, d) matrices.

    Returns (merged, diverge_mask (L,), norm1 (L,1), norm2 (L,1)).
    Reference: `fake_layer_merge_dynamic_cache.py:32-90`.

    ``valid`` ((L,) bool, optional) restricts the divergence threshold's
    d_min/d_max to real rows — needed when the input carries right-padded
    zero rows (bucketed batched admission): an all-zero row has no
    direction, and letting it into the min/max would shift the threshold
    (the reference never pads, so valid=None reproduces it exactly).
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    norm1 = jnp.linalg.norm(x1, axis=1, keepdims=True)
    norm2 = jnp.linalg.norm(x2, axis=1, keepdims=True)

    # eps-guard: zero rows (padding) have no direction; 0/eps = 0 keeps
    # the math NaN-free (NaN omega would poison the global min/max).
    u1 = x1 / jnp.maximum(norm1, 1e-12)
    u2 = x2 / jnp.maximum(norm2, 1e-12)

    dot_val = jnp.clip(jnp.sum(u1 * u2, axis=1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot_val)  # (L, 1)
    sin_omega = jnp.sin(omega)

    if valid is None:
        d_min = jnp.min(omega)
        d_max = jnp.max(omega)
    else:
        v = valid.reshape(-1, 1)
        d_min = jnp.min(jnp.where(v, omega, jnp.inf))
        d_max = jnp.max(jnp.where(v, omega, -jnp.inf))
    threshold = d_min + (d_max - d_min) * gamma
    diverge_mask = (omega > threshold).squeeze(-1)  # (L,)

    parallel_mask = omega < 1e-7
    # Guard the division for near-parallel rows (they take the linear branch).
    safe_sin = jnp.where(parallel_mask, 1.0, sin_omega)
    alpha = jnp.sin((1.0 - t) * omega) / safe_sin
    beta = jnp.sin(t * omega) / safe_sin

    e_slerp = alpha * u1 + beta * u2
    e_linear = (1.0 - t) * x1 + t * x2
    merged = jnp.where(parallel_mask, e_linear, e_slerp)
    return merged, diverge_mask, norm1, norm2


def minicache_merge(
    x1: jax.Array, x2: jax.Array, t: float = 0.5, gamma: float = 0.05,
    valid: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fake MiniCache merge of two (L, d) matrices.

    Divergent rows: merged unit vector rescaled by each layer's norm.
    Non-divergent rows: original per-layer rows (no merge).
    Reference: `fake_layer_merge_dynamic_cache.py:93-100`.
    """
    dtype = x1.dtype
    merged, diverge, n1, n2 = slerp_merge_rows(
        x1, x2, t=t, gamma=gamma, valid=valid
    )
    mask = diverge[:, None]
    e1 = jnp.where(mask, merged * n1, x1.astype(jnp.float32))
    e2 = jnp.where(mask, merged * n2, x2.astype(jnp.float32))
    return e1.astype(dtype), e2.astype(dtype)


def minicache_merge_heads(
    k1: jax.Array, k2: jax.Array, t: float = 0.5, gamma: float = 0.05,
    valid_len: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """MiniCache merge on (b, nh, s, hd) tensors.

    The reference flattens all leading dims into rows of length head_dim
    (`fake_layer_merge_dynamic_cache.py:186-188`), making the divergence
    threshold global over (batch, heads, seq). We reproduce that exactly.
    ``valid_len`` (scalar or (b,)) excludes right-padded rows beyond it
    from the divergence threshold (bucketed batched admission).
    """
    shape = k1.shape
    b, nh, s, hd = shape
    valid = None
    if valid_len is not None:
        vl = jnp.asarray(valid_len).reshape(-1, 1)  # (b or 1, 1)
        v = jnp.arange(s)[None, :] < vl  # (b or 1, s)
        valid = jnp.broadcast_to(v[:, None, :], (b, nh, s)).reshape(-1)
    e1, e2 = minicache_merge(
        k1.reshape(-1, hd), k2.reshape(-1, hd), t=t, gamma=gamma, valid=valid
    )
    return e1.reshape(shape), e2.reshape(shape)


def compact_pair(
    x1: jax.Array, x2: jax.Array, keep: int
) -> "SlerpCompact":
    """Compact two merged layers' (b, nh, s, hd) tensors into shared
    direction + norms + top-``keep`` exception rows (see
    `xkv_tpu.cache.SlerpCompact`).

    Selection is by the angle between the two CURRENT rows, largest first:
    MiniCache-merged (divergent) rows are exactly parallel (angle 0, free),
    so the budget goes to the rows that actually differ per layer — the
    non-divergent originals the reference semantics preserve. Re-running on
    reconstruct+tail is therefore idempotent for already-compacted rows.
    """
    from xkv_tpu.cache import SlerpCompact

    dtype = x1.dtype
    eps = 1e-12
    x1f = x1.astype(jnp.float32)
    x2f = x2.astype(jnp.float32)
    n1 = jnp.linalg.norm(x1f, axis=-1)  # (b, nh, s)
    n2 = jnp.linalg.norm(x2f, axis=-1)
    u1 = x1f / jnp.maximum(n1, eps)[..., None]
    u2 = x2f / jnp.maximum(n2, eps)[..., None]
    dot = jnp.clip(jnp.sum(u1 * u2, axis=-1), -1.0, 1.0)
    # Zero rows (padding / empty) are parallel by convention.
    both = (n1 > eps) & (n2 > eps)
    omega = jnp.where(both, jnp.arccos(dot), 0.0)  # (b, nh, s)

    mid = u1 + u2
    midn = jnp.linalg.norm(mid, axis=-1, keepdims=True)
    base = jnp.where(midn > 1e-6, mid / jnp.maximum(midn, eps), u1)

    _, keep_idx = jax.lax.top_k(omega, keep)  # (b, nh, keep)
    rows = jnp.stack([x1f, x2f], axis=3)  # (b, nh, s, 2, hd)
    keep_rows = jnp.take_along_axis(
        rows, keep_idx[..., None, None], axis=2
    )  # (b, nh, keep, 2, hd)
    return SlerpCompact(
        base=base.astype(dtype),
        norms=jnp.stack([n1, n2], axis=-1).astype(jnp.float32),
        keep_idx=keep_idx.astype(jnp.int32),
        keep_rows=keep_rows.astype(dtype),
    )


def compact_reconstruct(sc, layer_pos: int, dtype=None) -> jax.Array:
    """Reconstruct one layer's (b, nh, s, hd) rows from compact storage:
    shared direction scaled by the layer's norm, exact rows scattered back
    at the kept positions."""
    base = sc.base.astype(jnp.float32) * sc.norms[..., layer_pos][..., None]
    rows = sc.keep_rows[:, :, :, layer_pos].astype(jnp.float32)
    b, nh, D = sc.keep_idx.shape
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(nh)[None, :, None]
    out = base.at[bi, hi, sc.keep_idx].set(rows)
    return out.astype(dtype if dtype is not None else sc.base.dtype)
