"""Unit tests for core math: SH, quaternions, covariance, KNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dogs_tpu.core import (
    build_covariance_3d,
    eval_sh,
    mean_knn_dist_sq,
    quat_multiply,
    quat_rotate,
    quat_to_rotmat,
    rgb_to_sh,
    rotmat_to_quat,
    sh_to_rgb,
)
from dogs_tpu.core.sh import C0, C1


def test_sh_degree0_is_dc_times_c0():
    sh = jnp.ones((5, 16, 3)) * 2.0
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(out, 2.0 * C0, rtol=1e-6)


def test_sh_degree1_matches_formula():
    rng = np.random.RandomState(0)
    sh = jnp.asarray(rng.randn(4, 4, 3), jnp.float32)
    d = rng.randn(4, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    out = eval_sh(1, sh, d)
    expected = (
        C0 * sh[:, 0]
        - C1 * d[:, 1:2] * sh[:, 1]
        + C1 * d[:, 2:3] * sh[:, 2]
        - C1 * d[:, 0:1] * sh[:, 3]
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5)


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_sh_integrates_to_dc(deg):
    # Mean of SH over many random directions approaches the DC term since
    # all higher bands integrate to zero on the sphere.
    rng = np.random.RandomState(1)
    sh = jnp.asarray(rng.randn(1, 25, 3), jnp.float32)
    d = rng.randn(20000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = eval_sh(deg, jnp.tile(sh, (d.shape[0], 1, 1)), jnp.asarray(d, jnp.float32))
    np.testing.assert_allclose(out.mean(0), C0 * sh[0, 0], atol=0.05)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, rtol=1e-6)


def test_quat_rotmat_orthonormal():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(64, 4), jnp.float32)
    R = quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_quat_rotmat_roundtrip():
    rng = np.random.RandomState(3)
    q = rng.randn(128, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1  # canonical hemisphere
    q2 = rotmat_to_quat(quat_to_rotmat(jnp.asarray(q)))
    q2 = np.array(q2)
    q2[q2[:, 0] < 0] *= -1
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_quat_multiply_matches_rotation_composition():
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(16, 4), jnp.float32)
    b = jnp.asarray(rng.randn(16, 4), jnp.float32)
    Rab = quat_to_rotmat(quat_multiply(a, b))
    np.testing.assert_allclose(
        Rab, quat_to_rotmat(a) @ quat_to_rotmat(b), atol=1e-5
    )


def test_quat_rotate_identity():
    v = jnp.asarray([[1.0, 2.0, 3.0]])
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(quat_rotate(q, v), v, atol=1e-6)


def test_covariance_axis_aligned():
    scale = jnp.asarray([[2.0, 3.0, 4.0]])
    quat = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    cov = build_covariance_3d(scale, quat)
    np.testing.assert_allclose(cov[0], np.diag([4.0, 9.0, 16.0]), atol=1e-5)


def test_covariance_rotation_invariant_eigenvalues():
    rng = np.random.RandomState(5)
    scale = jnp.asarray(np.abs(rng.randn(8, 3)) + 0.1, jnp.float32)
    quat = jnp.asarray(rng.randn(8, 4), jnp.float32)
    cov = build_covariance_3d(scale, quat)
    eig = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
    np.testing.assert_allclose(eig, np.sort(np.asarray(scale) ** 2, axis=-1), rtol=1e-4)


def test_knn_exact_small():
    pts = np.array(
        [[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0], [0.0, 0, 1], [10.0, 10, 10]],
        np.float32,
    )
    out = np.asarray(mean_knn_dist_sq(jnp.asarray(pts)))
    # Point 0's three NN are at distance 1 each.
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-5)
    # Far point's NNs are the cluster.
    d2 = np.sort(((pts[4] - pts[:4]) ** 2).sum(-1))[:3]
    np.testing.assert_allclose(out[4], d2.mean(), rtol=1e-5)


@pytest.mark.heavy
def test_knn_morton_close_to_exact():
    rng = np.random.RandomState(6)
    pts = rng.rand(5000, 3).astype(np.float32)
    approx = np.asarray(mean_knn_dist_sq(jnp.asarray(pts)))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exact = np.sort(d2, axis=-1)[:, :3].mean(-1)
    # Windowed Morton search is approximate: require near-exact for the vast
    # majority and bounded overestimate overall (it can only overestimate).
    rel = approx / exact
    assert (rel >= 1.0 - 1e-4).all()
    assert np.median(rel) < 1.05
    assert (rel < 2.0).mean() > 0.9


def test_knn_respects_valid_mask():
    pts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0], [100, 0, 0]], np.float32)
    valid = jnp.asarray([True, True, True, True, False])
    out = np.asarray(mean_knn_dist_sq(jnp.asarray(pts), valid=valid))
    assert out[4] == 0.0
    # Neighbors of point 3 must exclude the invalid far point.
    np.testing.assert_allclose(out[3], np.mean([1.0, 4.0, 9.0]), rtol=1e-5)
