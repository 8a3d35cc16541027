"""Closed-form small-matrix linear algebra for TPU hot paths.

``jnp.linalg.svd``/``eigh`` on TPU lower to iterative QR/Jacobi sweeps —
long sequential while-loops that dominate the RANSAC kernels' runtime
(hundreds of 8x9 / 12x12 factorizations per frame). These replacements
are branch-free closed forms and fixed tiny iteration counts that
vectorize across the hypothesis batch on the VPU:

* symmetric 3x3 eigendecomposition (Cardano / trigonometric form),
* closed-form 3x3 inverse (adjugate),
* smallest-right-singular-vector of (m, n) via inverse iteration on
  A^T A + shift (batched LU solves, 4 fixed iterations),
* nearest rotation (polar decomposition via the analytic 3x3 eigensolver).

Everything broadcasts over leading batch dimensions and pins HIGHEST
matmul precision (geometry accuracy, see ``ops/lie.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST

einsum = partial(jnp.einsum, precision=HIGHEST)
mm = partial(jnp.matmul, precision=HIGHEST)


def eigh3x3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Analytic eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (eigenvalues ascending (..., 3), eigenvectors (..., 3, 3)
    with columns as eigenvectors). Trigonometric (Cardano) eigenvalues +
    cross-product eigenvectors, stable for the well-conditioned PSD
    matrices arising in geometry (A^T A, covariances, H_pp blocks).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    q = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / 3.0
    B = A - q * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p**3, 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    q0 = q[..., 0, 0]
    e1 = q0 + 2.0 * p * jnp.cos(phi)
    e3 = q0 + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q0 - e1 - e3
    evals = jnp.stack([e3, e2, e1], axis=-1)  # ascending

    def eigvec(lam):
        # (A - lam I) has rank 2; its row cross products span the kernel.
        M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c12 = jnp.cross(r1, r2)
        c20 = jnp.cross(r2, r0)
        norms = jnp.stack(
            [
                jnp.sum(c01 * c01, -1),
                jnp.sum(c12 * c12, -1),
                jnp.sum(c20 * c20, -1),
            ],
            axis=-1,
        )
        cands = jnp.stack([c01, c12, c20], axis=-2)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # Degenerate (repeated eigenvalue): fall back to a fixed axis.
        fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v.shape)
        return jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-20), fallback)

    v0 = eigvec(evals[..., 0])
    v2 = eigvec(evals[..., 2])
    # middle eigenvector: orthogonal complement (exact for symmetric A)
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-20)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return evals, V


def inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def smallest_singular_vector(A: jax.Array, iterations: int = 8) -> jax.Array:
    """Right-singular vector of the smallest singular value of
    ``A`` (..., m, n) via inverse iteration on A^T A + eps*I.

    Replaces ``svd(A)[2][-1]`` in the 8-point / DLT-PnP / homography
    minimal solvers: a handful of batched (n, n) LU solves instead of an
    iterative SVD. The shift eps is scaled to the matrix magnitude; for
    RANSAC minimal solves the smallest singular value is well separated
    from the rest, so 4 iterations converge far below the noise floor.
    """
    n = A.shape[-1]
    AtA = einsum("...mi,...mj->...ij", A, A)
    scale = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / n
    M = AtA + 1e-7 * jnp.maximum(scale, 1e-20) * jnp.eye(n, dtype=A.dtype)
    lu, piv = jax.scipy.linalg.lu_factor(M)
    v = jnp.ones(A.shape[:-2] + (n,), A.dtype) / jnp.sqrt(jnp.asarray(n, A.dtype))
    for _ in range(iterations):
        v = jax.scipy.linalg.lu_solve((lu, piv), v[..., None])[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def nearest_rotation(M: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Polar decomposition: the rotation closest to (..., 3, 3) ``M`` with
    det +1, plus the mean scale. R = M (M^T M)^{-1/2}, computed with the
    analytic 3x3 eigensolver; the smallest-eigenvalue axis is sign-fixed
    to enforce properness (equivalent to SVD with D=diag(1,1,det))."""
    MtM = einsum("...ji,...jk->...ik", M, M)
    evals, V = eigh3x3(MtM)
    s = jnp.sqrt(jnp.maximum(evals, 1e-30))  # singular values ascending
    detM = jnp.linalg.det(M)
    sign = jnp.where(detM < 0, -1.0, 1.0)
    # (M^T M)^{-1/2} with the smallest direction sign-flipped when det<0
    d = jnp.stack([sign / s[..., 0], 1.0 / s[..., 1], 1.0 / s[..., 2]], axis=-1)
    inv_sqrt = einsum("...ik,...k,...jk->...ij", V, d, V)
    R = mm(M, inv_sqrt)
    scale = jnp.mean(s, axis=-1) * sign
    return R, scale
