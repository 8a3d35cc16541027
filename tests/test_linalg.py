import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.linalg import eigh3x3, inv3x3, nearest_rotation, smallest_singular_vector


def test_eigh3x3_matches_lapack():
    key = jax.random.PRNGKey(0)
    B = jax.random.normal(key, (64, 3, 3))
    A = jnp.einsum("nij,nkj->nik", B, B) + 0.1 * jnp.eye(3)
    evals, V = eigh3x3(A)
    ref_vals, _ = np.linalg.eigh(np.asarray(A))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=1e-4, atol=1e-4)
    # A V = V diag(evals)
    AV = np.einsum("nij,njk->nik", np.asarray(A), np.asarray(V))
    VL = np.asarray(V) * np.asarray(evals)[:, None, :]
    np.testing.assert_allclose(AV, VL, atol=1e-3)
    # orthonormal columns
    VtV = np.einsum("nji,njk->nik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-4)


def test_inv3x3():
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (128, 3, 3)) + 2.0 * jnp.eye(3)
    Ainv = inv3x3(A)
    eye = np.einsum("nij,njk->nik", np.asarray(A), np.asarray(Ainv))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (128, 3, 3)), atol=1e-4)


def test_smallest_singular_vector():
    key = jax.random.PRNGKey(2)
    A = jax.random.normal(key, (50, 8, 9))
    v = smallest_singular_vector(A)
    _, S, Vt = np.linalg.svd(np.asarray(A))
    ref = Vt[:, -1, :]
    dots = np.abs(np.einsum("ni,ni->n", np.asarray(v), ref))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_smallest_singular_vector_12x12_planted_null():
    """The DLT-PnP regime: an exactly-determined system whose smallest
    singular value is near zero (noise-level) — the separation inverse
    iteration actually sees in RANSAC minimal solves."""
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (20, 12, 12))
    U, S, Vt = np.linalg.svd(np.asarray(A))
    S[:, -1] = 1e-4 * S[:, -2]  # plant a near-null direction
    A2 = jnp.asarray(np.einsum("nij,nj,njk->nik", U, S, Vt))
    v = smallest_singular_vector(A2)
    dots = np.abs(np.einsum("ni,ni->n", np.asarray(v), Vt[:, -1, :]))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_nearest_rotation():
    import ur_mvo_tpu.ops.lie as lie

    key = jax.random.PRNGKey(4)
    R_true = lie.so3_exp(jax.random.normal(key, (32, 3)))
    scales = jnp.exp(jax.random.normal(jax.random.PRNGKey(5), (32,)) * 0.3)
    M = R_true * scales[:, None, None]
    # add small perturbation
    M = M + 0.01 * jax.random.normal(jax.random.PRNGKey(6), (32, 3, 3))
    R, s = nearest_rotation(M)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=0.05)
    np.testing.assert_allclose(np.asarray(s), np.asarray(scales), rtol=0.05)


def test_nearest_rotation_negative_det():
    import ur_mvo_tpu.ops.lie as lie

    R_true = lie.so3_exp(jnp.array([[0.3, -0.2, 0.5]]))
    M = -2.0 * R_true  # det < 0
    R, s = nearest_rotation(M)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)
