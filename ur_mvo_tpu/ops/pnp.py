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

    # Score every hypothesis against every point, lane-major: points fill
    # the 128-wide vector lanes. The earlier (H, N, 3) orientation left
    # 125/128 lanes idle for the whole reprojection pipeline; camera-frame
    # points come from ONE flat (3H, 3) x (3, N) matmul and everything
    # after is a full-lane (H, N) vector op.
    H = iterations
    XT = X.T  # (3, N)
    pc = jnp.matmul(Rs.reshape(3 * H, 3), XT, precision=HIGHEST).reshape(H, 3, -1)
    pc = pc + ts[:, :, None]  # (H, 3, N)
    uvp = [
        K[a, 0] * pc[:, 0] + K[a, 1] * pc[:, 1] + K[a, 2] * pc[:, 2] for a in range(3)
    ]  # 3 x (H, N)
    w = jnp.maximum(uvp[2], 1e-9)
    du = uvp[0] / w - uv[:, 0]
    dv = uvp[1] / w - uv[:, 1]
    err2 = du * du + dv * dv  # (H, N)
    inls = valid & (err2 < threshold_px * threshold_px) & (pc[:, 2] > 0)
    counts = jnp.sum(inls.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    return PnPResult(R_cw=Rs[best], t_cw=ts[best], inliers=inls[best], n_inliers=counts[best])
