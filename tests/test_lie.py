import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ur_mvo_tpu.ops import lie


def random_rotations(key, n):
    w = jax.random.normal(key, (n, 3)) * 1.5
    return lie.so3_exp(w)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 3)) * 2.0
    R = lie.so3_exp(w)
    # R must be orthogonal, det +1
    should_eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(should_eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_so3_log_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    assert np.all(np.isfinite(np.asarray(w2)))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-7)


def test_so3_log_near_pi():
    axis = np.array([0.3, -0.5, 0.8])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * (np.pi - 1e-5), dtype=jnp.float32)[None]
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-3)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    xi = jax.random.normal(key, (32, 6))
    # Keep the rotation part inside the injectivity radius (< pi) so the
    # tangent roundtrip is exact rather than a canonical representative.
    xi = xi.at[:, :3].multiply(0.8)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_se3_compose_inverse():
    key = jax.random.PRNGKey(2)
    xi = jax.random.normal(key, (8, 6))
    R, t = lie.se3_exp(xi)
    Ri, ti = lie.se3_inverse(R, t)
    Re, te = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)


def test_quat_rotmat_roundtrip():
    key = jax.random.PRNGKey(3)
    R = random_rotations(key, 100)
    q = lie.rotmat_to_quat(R)
    R2 = lie.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
    # canonical sign
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_rotation_angle():
    w = jnp.array([[0.7, 0.0, 0.0]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(float(lie.rotation_angle(R)[0]), 0.7, atol=1e-5)


def test_se3_apply_matches_matrix():
    key = jax.random.PRNGKey(4)
    xi = jax.random.normal(key, (6,))
    R, t = lie.se3_exp(xi)
    p = jax.random.normal(jax.random.PRNGKey(5), (10, 3))
    out = lie.se3_apply(R, t, p)
    T = lie.se3_matrix(R, t)
    hom = np.concatenate([np.asarray(p), np.ones((10, 1))], axis=1)
    expected = (np.asarray(T) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
