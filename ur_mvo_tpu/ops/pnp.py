"""Batched PnP-RANSAC: world points + pixels -> camera pose prior.

Replaces the reference's ``cv::solvePnPRansac`` call
(``/root/reference/src/g2o_optimization.cc:323-377``: 100 iterations, 20 px
inlier threshold, 0.99 confidence) with an all-hypotheses-at-once device
kernel: minimal sets are 6-point DLT solves (vmapped 12x12 SVDs) with
orthogonality projection, scored by pixel reprojection over all
correspondences. The refined estimate comes from the pose-only robust
optimizer (``ops/pose_opt.py``), matching the reference split
(PnP prior -> g2o ``FrameOptimization``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST
from ur_mvo_tpu.ops.linalg import nearest_rotation, smallest_singular_vector
from ur_mvo_tpu.ops.ransac import sample_minimal_sets

einsum = partial(jnp.einsum, precision=HIGHEST)
mm = partial(jnp.matmul, precision=HIGHEST)


def dlt_pnp(X: jax.Array, rays: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Direct linear transform PnP on >= 6 correspondences.

    ``X``: (n, 3) world points; ``rays``: (n, 2) *normalized* image
    coordinates (K^-1 applied). Returns (R_cw, t_cw) with
    ``x_cam = R_cw X + t_cw``, orthogonality enforced by SVD projection
    and sign fixed by cheirality.
    """
    n = X.shape[0]
    zeros = jnp.zeros((n, 4), X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)
    u = rays[:, 0:1]
    v = rays[:, 1:2]
    rows_u = jnp.concatenate([Xh, zeros[:, :4], -u * Xh], axis=1)
    rows_v = jnp.concatenate([zeros[:, :4], Xh, -v * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2n, 12)
    P = smallest_singular_vector(A).reshape(3, 4)
    # The nullspace vector carries an arbitrary global sign; a valid pose
    # needs det(M) > 0 (M = s * R with s > 0), so resolve it first.
    detM = jnp.linalg.det(P[:, :3])
    P = P * jnp.where(detM < 0, -1.0, 1.0)
    # Nearest rotation + scale via the analytic polar decomposition.
    R, scale = nearest_rotation(P[:, :3])
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


class PnPResult(NamedTuple):
    R_cw: jax.Array
    t_cw: jax.Array
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array


def ransac_pnp(
    key: jax.Array,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    iterations: int = 100,
    threshold_px: float = 20.0,
) -> PnPResult:
    """Batched PnP RANSAC over padded correspondence arrays.

    ``X``: (N, 3) world points, ``uv``: (N, 2) pixels, ``valid``: (N,).
    Same operating point as the reference's solvePnPRansac call.
    """
    Kinv = jnp.linalg.inv(K)
    rays = einsum("ij,nj->ni", Kinv, jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=1))[:, :2]

    sets = sample_minimal_sets(key, valid, iterations, 6)
    Rs, ts = jax.vmap(lambda idx: dlt_pnp(X[idx], rays[idx]))(sets)

    # Score every hypothesis against every point in one broadcast batch:
    # tiny per-hypothesis einsums lower to <5%-utilization MXU matmuls,
    # so the 3-wide contractions are written as VPU broadcast-sums.
    pc = jnp.sum(Rs[:, None, :, :] * X[None, :, None, :], axis=-1) + ts[:, None, :]  # (H, N, 3)
    uvp = jnp.sum(K * pc[..., None, :], axis=-1)  # (H, N, 3)
    proj = uvp[..., :2] / jnp.maximum(uvp[..., 2:3], 1e-9)
    err2 = jnp.sum((proj - uv) ** 2, axis=-1)
    inls = valid & (err2 < threshold_px * threshold_px) & (pc[..., 2] > 0)
    counts = jnp.sum(inls.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    return PnPResult(R_cw=Rs[best], t_cw=ts[best], inliers=inls[best], n_inliers=counts[best])
