"""SLERP merge tests against a torch realization of the reference formula
(`fake_layer_merge_dynamic_cache.py:32-100`)."""

import numpy as np
import torch

import jax.numpy as jnp

from xkv_tpu.compress import minicache_merge
from xkv_tpu.compress.slerp import minicache_merge_heads, slerp_merge_rows


def torch_minicache_merge(x1, x2, t=0.5, gamma=0.05):
    x1 = torch.from_numpy(x1).float()
    x2 = torch.from_numpy(x2).float()
    n1 = x1.norm(dim=1, keepdim=True)
    n2 = x2.norm(dim=1, keepdim=True)
    u1, u2 = x1 / n1, x2 / n2
    dot = (u1 * u2).sum(dim=1, keepdim=True).clamp(-1.0, 1.0)
    omega = torch.acos(dot)
    sin_omega = torch.sin(omega)
    d_min, d_max = omega.min(), omega.max()
    diverge = (omega > d_min + (d_max - d_min) * gamma).squeeze(-1)
    parallel = omega < 1e-7
    alpha = torch.sin((1 - t) * omega) / sin_omega
    beta = torch.sin(t * omega) / sin_omega
    e = alpha * u1 + beta * u2
    e = torch.where(parallel.expand(-1, x1.shape[1]), (1 - t) * x1 + t * x2, e)
    e1 = e.clone() * n1
    e1[~diverge] = x1[~diverge]
    e2 = e.clone() * n2
    e2[~diverge] = x2[~diverge]
    return e1.numpy(), e2.numpy()


def test_minicache_matches_torch_reference():
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal((128, 16)).astype(np.float32)
    x2 = rng.standard_normal((128, 16)).astype(np.float32)
    ours1, ours2 = minicache_merge(jnp.asarray(x1), jnp.asarray(x2), t=0.5, gamma=0.05)
    ref1, ref2 = torch_minicache_merge(x1, x2, t=0.5, gamma=0.05)
    np.testing.assert_allclose(np.asarray(ours1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours2), ref2, rtol=1e-4, atol=1e-5)


def test_parallel_rows_take_linear_path():
    # One-hot rows normalize exactly, so u1 == u2 bit-for-bit and the
    # arccos(1.0) == 0 parallel fallback fires (reference line :69).
    x1 = 4.0 * np.eye(4, 8, dtype=np.float32)
    x2 = 2.0 * x1
    merged, diverge, n1, n2 = slerp_merge_rows(jnp.asarray(x1), jnp.asarray(x2), t=0.25)
    expected = 0.75 * x1 + 0.25 * x2
    np.testing.assert_allclose(np.asarray(merged), expected, rtol=1e-5)
    assert not np.asarray(diverge).any()  # all angles equal -> none above threshold
    assert np.isfinite(np.asarray(merged)).all()


def test_gamma_one_keeps_everything_original():
    """gamma=1.0 => threshold = d_max => no row is divergent => outputs are
    exactly the inputs (the reference default, utils.py slerp_gamma)."""
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((64, 8)).astype(np.float32)
    x2 = rng.standard_normal((64, 8)).astype(np.float32)
    e1, e2 = minicache_merge(jnp.asarray(x1), jnp.asarray(x2), t=0.5, gamma=1.0)
    np.testing.assert_allclose(np.asarray(e1), x1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), x2, rtol=1e-6)


def test_heads_wrapper_shape_and_global_threshold():
    rng = np.random.default_rng(3)
    k1 = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)
    k2 = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)
    e1, e2 = minicache_merge_heads(jnp.asarray(k1), jnp.asarray(k2))
    assert e1.shape == k1.shape and e2.shape == k2.shape
    # must equal the flat merge (global threshold across batch*heads*seq)
    f1, f2 = minicache_merge(
        jnp.asarray(k1.reshape(-1, 8)), jnp.asarray(k2.reshape(-1, 8))
    )
    np.testing.assert_allclose(
        np.asarray(e1).reshape(-1, 8), np.asarray(f1), rtol=1e-6
    )
