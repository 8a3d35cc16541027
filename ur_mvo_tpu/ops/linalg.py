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


def cholesky_small(M: jax.Array) -> jax.Array:
    """Unrolled Cholesky of SPD (..., n, n) for tiny fixed n (<= ~16).

    ``jax.scipy.linalg.lu_factor``/``cholesky`` on TPU lower to
    sequential pivoting loops that dominate batched-RANSAC runtime; for
    the shifted normal matrices here (SPD by construction) a fully
    unrolled scalar Cholesky fuses into a handful of VPU kernels over
    the hypothesis batch. Returns lower-triangular L with M = L L^T."""
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-10))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            t = M[..., i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d
    zero = jnp.zeros_like(M[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def tril_inverse_small(L: jax.Array) -> jax.Array:
    """Unrolled inverse of lower-triangular (..., n, n) (forward subst)."""
    n = L.shape[-1]
    X = [[None] * n for _ in range(n)]
    for j in range(n):
        X[j][j] = 1.0 / L[..., j, j]
        for i in range(j + 1, n):
            s = L[..., i, j] * X[j][j]
            for k in range(j + 1, i):
                s = s + L[..., i, k] * X[k][j]
            X[i][j] = -s / L[..., i, i]
    zero = jnp.zeros_like(L[..., 0, 0])
    rows = [
        jnp.stack([X[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def spd_inverse_small(M: jax.Array) -> jax.Array:
    """Explicit inverse of SPD (..., n, n) via unrolled Cholesky:
    M^{-1} = L^{-T} L^{-1}. Branch-free, batches on the VPU."""
    Linv = tril_inverse_small(cholesky_small(M))
    return einsum("...ki,...kj->...ij", Linv, Linv)


def qr_r_small(A: jax.Array) -> jax.Array:
    """Unrolled Householder QR of (..., m, n), m >= n: returns the upper
    triangular factor R (..., n, n) with A = Q R. Fully unrolled over
    the (tiny, static) column count so it fuses into a few VPU kernels
    over any leading batch dims — no LAPACK-style sequential kernels."""
    m, n = A.shape[-2], A.shape[-1]
    for j in range(n):
        x = A[..., j:, j]  # (..., m-j)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x0 = x[..., :1]
        # sign chosen to avoid cancellation; alpha = -sign(x0) * |x|
        sign = jnp.where(x0 >= 0, 1.0, -1.0)
        alpha = -sign * norm
        v = x.at[..., :1].add(-alpha)
        vtv = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30)
        sub = A[..., j:, j:]  # (..., m-j, n-j)
        vt_sub = jnp.sum(v[..., :, None] * sub, axis=-2)  # (..., n-j)
        sub = sub - (2.0 / vtv)[..., :, None] * v[..., :, None] * vt_sub[..., None, :]
        # column j is exactly (alpha, 0, ..., 0) after the reflection
        sub = sub.at[..., :, 0].set(0.0)
        sub = sub.at[..., 0, 0].set(alpha[..., 0])
        A = A.at[..., j:, j:].set(sub)
    return jnp.triu(A[..., :n, :])


def smallest_singular_vector(A: jax.Array, iterations: int = 8) -> jax.Array:
    """Right-singular vector of the smallest singular value of ``A``
    (..., m, n), m >= n.

    Replaces ``svd(A)[2][-1]`` in the 8-point / DLT-PnP / homography
    minimal solvers. Computed as inverse iteration with the triangular
    factor of an unrolled Householder QR of ``A`` itself — never forming
    A^T A, whose f32 rounding (eps * cond^2) limited null-vector
    accuracy to ~1e-2 rotations on near-degenerate PnP systems. Each
    iteration applies (R^-1 R^-T), i.e. the exact (A^T A)^-1 of the
    computed R, via an explicit unrolled triangular inverse; a
    rank-deficient R has (near-)zero diagonal entries which are clamped
    relative to the largest diagonal, leaving R^-1 finite and dominated
    by the estimated null direction — exactly what inverse iteration
    amplifies. No LAPACK-style sequential kernels anywhere (batched
    lu_factor/lu_solve dominated the RANSAC profile on TPU).
    """
    n = A.shape[-1]
    m = A.shape[-2]
    scale = jnp.sqrt(jnp.maximum(jnp.mean(A * A, axis=(-2, -1), keepdims=True), 1e-30))
    A = A / scale
    if m < n:
        # underdetermined minimal systems (e.g. the 8x9 eight-point
        # matrix): pad with zero rows — A^T A is unchanged and the QR
        # factor gains exact zero diagonal entries for the null space,
        # which the clamp below turns into the dominant inverse
        # directions.
        pad = jnp.zeros(A.shape[:-2] + (n - m, n), A.dtype)
        A = jnp.concatenate([A, pad], axis=-2)
    R = qr_r_small(A)
    # clamp near-zero diagonal (rank deficiency) relative to the matrix
    # magnitude, preserving sign
    diag = jnp.diagonal(R, axis1=-2, axis2=-1)
    dmax = jnp.maximum(jnp.max(jnp.abs(diag), axis=-1, keepdims=True), 1e-30)
    dsafe = jnp.where(jnp.abs(diag) < 1e-7 * dmax, 1e-7 * dmax * jnp.where(diag >= 0, 1.0, -1.0), diag)
    ii = jnp.arange(n)
    R = R.at[..., ii, ii].set(dsafe)
    # explicit triangular inverse (R upper): R^-1 = (tril_inv(R^T))^T
    Rinv = jnp.swapaxes(tril_inverse_small(jnp.swapaxes(R, -1, -2)), -1, -2)
    v = jnp.ones(A.shape[:-2] + (n,), A.dtype) / jnp.sqrt(jnp.asarray(n, A.dtype))
    for _ in range(iterations):
        # v <- R^-1 (R^-T v): inverse iteration on A^T A. Normalize
        # after EACH triangular application — R^-1 entries reach ~1/clamp
        # (1e7) on rank-deficient systems, so the unnormalized double
        # application can overflow f32 and collapse v to zero.
        w = jnp.sum(Rinv * v[..., :, None], axis=-2)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-30)
        v = jnp.sum(Rinv * w[..., None, :], axis=-1)
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
    # Higham polar polish: R <- (R + R^-T) / 2. When M is a nearly
    # *exact* scaled rotation, M^T M ~ s^2 I has degenerate eigenvalues
    # and the Cardano eigenvectors above lose orthogonality (measured
    # ~4e-2 rotation error on exact DLT-PnP systems); the computed
    # inv_sqrt is still symmetric PSD, so the polar factor of R equals
    # the true rotation and the quadratically-convergent Newton polish
    # recovers it. No-op (to rounding) when R is already orthogonal.
    for _ in range(3):
        R = 0.5 * (R + jnp.swapaxes(inv3x3(R), -1, -2))
    scale = jnp.mean(s, axis=-1) * sign
    return R, scale
