"""Triangulation kernels: two-view DLT and N-view bearing least squares.

Replaces the reference's per-point Eigen solves — the 4x4 SVD DLT in
``/root/reference/src/epipolar_geometry.cc:928-949`` and the bearing-vector
normal equations with rank guard in ``mapping.cc:151-205`` — with batched,
mask-aware device kernels (vmapped small factorizations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST
from ur_mvo_tpu.ops.linalg import eigh3x3, inv3x3, smallest_singular_vector

einsum = partial(jnp.einsum, precision=HIGHEST)


def triangulate_dlt(P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Two-view DLT: projection matrices (3, 4) + pixel homogeneous
    observations (..., 2) -> points (..., 3) (frame of P1/P2's world).

    Batched over leading dims of ``x1``/``x2``.
    """

    def one(a1, a2):
        A = jnp.stack(
            [
                a1[0] * P1[2] - P1[0],
                a1[1] * P1[2] - P1[1],
                a2[0] * P2[2] - P2[0],
                a2[1] * P2[2] - P2[1],
            ]
        )
        X = smallest_singular_vector(A)
        w = X[3]
        return X[:3] / jnp.where(jnp.abs(w) > 1e-12, w, jnp.sign(w) * 1e-12 + (w == 0) * 1e-12)

    flat1 = x1.reshape(-1, x1.shape[-1])[..., :2]
    flat2 = x2.reshape(-1, x2.shape[-1])[..., :2]
    pts = jax.vmap(one)(flat1, flat2)
    return pts.reshape(x1.shape[:-1] + (3,))


def triangulate_bearings(
    origins: jax.Array,
    bearings: jax.Array,
    valid: jax.Array,
    rank_tol: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """N-view midpoint triangulation: find the world point minimizing the
    squared distance to all observation rays.

    ``origins``: (N, 3) camera centers (world), ``bearings``: (N, 3)
    world-frame ray directions, ``valid``: (N,) mask. Returns ``(point,
    ok)``; ``ok`` is False when fewer than 2 valid rays or the normal
    matrix is rank-deficient (parallel rays) — the same guards as the
    reference's QR rank check.
    """
    w = valid.astype(origins.dtype)
    n = jnp.sum(w)
    b2 = jnp.sum(bearings * bearings, axis=-1)
    inv_b2 = jnp.where(b2 > 1e-12, 1.0 / jnp.maximum(b2, 1e-12), 0.0) * w
    # A = sum_i (I - b b^T / |b|^2),  rhs = sum_i (I - b b^T / |b|^2) o_i
    bbT = einsum("ni,nj->nij", bearings, bearings) * inv_b2[:, None, None]
    A = n * jnp.eye(3, dtype=origins.dtype) - jnp.sum(bbT, axis=0)
    rhs = jnp.sum(origins * w[:, None], axis=0) - jnp.sum(
        einsum("nij,nj->ni", bbT, origins), axis=0
    )
    # Rank guard via the analytic symmetric 3x3 eigensolver.
    evals, _ = eigh3x3(A)
    ok = (n >= 2) & (evals[0] > rank_tol)
    A_safe = jnp.where(ok, A, jnp.eye(3, dtype=A.dtype))
    # closed-form 3x3 solve (adjugate) — no LAPACK LU on the hot path;
    # this runs batched under vmap for every pending mappoint.
    point = jnp.sum(inv3x3(A_safe) * rhs[None, :], axis=-1)
    return jnp.where(ok, point, 0.0), ok
