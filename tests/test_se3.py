import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from vo_tpu.geom import se3


def random_pose(rng):
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    return np.asarray(se3.from_rt(jnp.asarray(R, jnp.float64), jnp.asarray(t, jnp.float64)))


def test_compose_inverse(rng):
    A = random_pose(rng)
    B = random_pose(rng)
    C = se3.compose(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(C), A @ B, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(se3.compose(jnp.asarray(A), se3.inv(jnp.asarray(A)))), np.eye(4), atol=1e-10
    )


def test_apply_matches_matmul(rng):
    T = random_pose(rng)
    pts = rng.normal(size=(17, 3))
    out = np.asarray(se3.apply(jnp.asarray(T), jnp.asarray(pts)))
    expected = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-10)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(8, 6)) * 0.7
    T = se3.exp(jnp.asarray(xi))
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-5)


def test_exp_small_angle():
    xi = jnp.array([1e-9, 2e-9, -1e-9, 1e-10, -2e-10, 1e-10], dtype=jnp.float64)
    T = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-8)


def test_log_so3_matches_scipy(rng):
    R = Rotation.random(16, random_state=3).as_matrix()
    w = np.asarray(se3.log_so3(jnp.asarray(R)))
    expected = Rotation.from_matrix(R).as_rotvec()
    np.testing.assert_allclose(w, expected, atol=1e-5)


def test_kabsch_recovers_pose(rng):
    T = random_pose(rng)
    src = rng.normal(size=(30, 3)) * 5
    dst = src @ T[:3, :3].T + T[:3, 3]
    R, t = se3.kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-8)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-8)


def test_kabsch_weighted_ignores_outliers(rng):
    T = random_pose(rng)
    src = rng.normal(size=(30, 3)) * 5
    dst = src @ T[:3, :3].T + T[:3, 3]
    dst[:5] += 100.0  # corrupt
    w = np.ones(30)
    w[:5] = 0.0
    R, t = se3.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-8)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-8)


def test_orthonormalize(rng):
    R = Rotation.random(random_state=1).as_matrix() + rng.normal(size=(3, 3)) * 0.01
    Ro = np.asarray(se3.orthonormalize(jnp.asarray(R)))
    np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(Ro) > 0
