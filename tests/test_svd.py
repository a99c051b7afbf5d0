"""Numeric tests for SVD factorization against torch.linalg.svd ground truth
(the reference's backend, `fake_layer_merge_dynamic_cache.py:20`)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from xkv_tpu.compress import (
    factorize,
    fake_svd,
    randomized_svd,
    reconstruct,
    truncated_svd,
)
from xkv_tpu.compress.svd import heads_to_matrix, matrix_to_heads


def torch_fake_svd(x: np.ndarray, rank: int) -> np.ndarray:
    """Reference math, independently realized with torch (mirrors
    `fake_layer_merge_dynamic_cache.py:11-29`)."""
    t = torch.from_numpy(x)
    bs, nh, sl, hd = t.shape
    m = t.transpose(1, 2).reshape(bs, sl, nh * hd).float()
    u, s, vh = torch.linalg.svd(m, full_matrices=False)
    approx = u[:, :, :rank] @ (torch.diag_embed(s[:, :rank]) @ vh[:, :rank, :])
    return approx.view(bs, sl, nh, hd).transpose(1, 2).numpy()


@pytest.fixture
def kv_tensor():
    rng = np.random.default_rng(0)
    # Construct a tensor with decaying spectrum so truncation is meaningful.
    b, nh, s, hd = 2, 4, 64, 16
    m = nh * hd
    u = rng.standard_normal((b, s, m)).astype(np.float32)
    spectrum = np.exp(-np.arange(m) / 8.0).astype(np.float32)
    x = u * spectrum[None, None, :]
    return np.transpose(x.reshape(b, s, nh, hd), (0, 2, 1, 3)).copy()


def test_exact_truncated_svd_matches_torch(kv_tensor):
    rank = 12
    ours = np.asarray(
        matrix_to_heads(
            reconstruct(truncated_svd(heads_to_matrix(jnp.asarray(kv_tensor)), rank)),
            kv_tensor.shape[1],
        )
    )
    ref = torch_fake_svd(kv_tensor, rank)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_fake_svd_helper_matches_torch(kv_tensor):
    rank = 8
    ours = np.asarray(fake_svd(jnp.asarray(kv_tensor), rank, method="exact"))
    ref = torch_fake_svd(kv_tensor, rank)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_randomized_svd_near_optimal(kv_tensor):
    """Randomized SVD error must be within a small factor of the optimal
    (exact truncated) error."""
    rank = 12
    mat = heads_to_matrix(jnp.asarray(kv_tensor))
    exact = reconstruct(truncated_svd(mat, rank))
    rand = reconstruct(randomized_svd(mat, rank, oversample=8, n_iter=2, seed=0))
    err_exact = float(jnp.linalg.norm(mat - exact))
    err_rand = float(jnp.linalg.norm(mat - rand))
    assert err_rand <= 1.05 * err_exact + 1e-5


def test_randomized_svd_deterministic(kv_tensor):
    mat = heads_to_matrix(jnp.asarray(kv_tensor))
    a = randomized_svd(mat, 8, seed=3)
    b = randomized_svd(mat, 8, seed=3)
    np.testing.assert_array_equal(np.asarray(a.us), np.asarray(b.us))
    np.testing.assert_array_equal(np.asarray(a.vt), np.asarray(b.vt))


def test_factor_shapes(kv_tensor):
    rank = 8
    mat = heads_to_matrix(jnp.asarray(kv_tensor))
    fac = factorize(mat, rank, method="randomized")
    b, s, m = mat.shape
    assert fac.us.shape == (b, s, rank)
    assert fac.vt.shape == (b, rank, m)
    assert fac.rank == rank


def test_full_rank_reconstruction_is_exact(kv_tensor):
    mat = heads_to_matrix(jnp.asarray(kv_tensor))
    full = min(mat.shape[-2:])
    rec = reconstruct(truncated_svd(mat, full))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(mat), rtol=1e-4, atol=1e-4)


def test_heads_matrix_round_trip(kv_tensor):
    x = jnp.asarray(kv_tensor)
    back = matrix_to_heads(heads_to_matrix(x), x.shape[1])
    np.testing.assert_array_equal(np.asarray(back), kv_tensor)
