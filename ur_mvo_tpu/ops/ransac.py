"""Batched RANSAC for fundamental-matrix and homography estimation.

The reference scores 200 hypotheses for the H and F models in *two host
threads* of scalar loops (``/root/reference/src/epipolar_geometry.cc:53-97``
and the per-point chi^2 loops at :285-449), and separately calls
``cv::findFundamentalMat`` for match outlier rejection
(``point_matching.cc:48-58``). On TPU all hypotheses are one batch: minimal
sets are drawn with a Gumbel top-k (distinct indices, no host RNG), the
8-point/DLT null vectors come from batched inverse iteration (no iterative SVDs), and symmetric-transfer chi^2
scoring is a dense (hypotheses x points) computation on the VPU/MXU.
Scoring constants match ORB-SLAM3's (th 3.841/5.991, score cap 5.991).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST
from ur_mvo_tpu.ops.linalg import eigh3x3, inv3x3, smallest_singular_vector

einsum = partial(jnp.einsum, precision=HIGHEST)

F_CHI2_TH = 3.841  # 1-dof 95% — inlier gate per direction
H_CHI2_TH = 5.991  # 2-dof 95%
SCORE_CAP = 5.991  # both models accumulate (cap - chi2)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def sample_minimal_sets(key: jax.Array, valid: jax.Array, num_sets: int, set_size: int) -> jax.Array:
    """Draw ``num_sets`` x ``set_size`` distinct indices from valid slots.

    Gumbel-top-k over the validity mask: each hypothesis perturbs
    ``log(valid)`` with iid Gumbel noise and takes the top ``set_size`` —
    a without-replacement sample, fully batched. Invalid slots can only
    be drawn when fewer than ``set_size`` valid points exist (callers
    gate on match count).
    """
    K = valid.shape[0]
    g = jax.random.gumbel(key, (num_sets, K))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, set_size)
    return idx


# ---------------------------------------------------------------------------
# Normalization + minimal solvers (vmapped over hypotheses)
# ---------------------------------------------------------------------------

def _normalize(pts: jax.Array):
    """Hartley normalization of (N, 2) -> (pts_n, T) with T (3, 3)."""
    mean = jnp.mean(pts, axis=0)
    centered = pts - mean
    mean_dist = jnp.mean(jnp.linalg.norm(centered, axis=1))
    s = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-8)
    T = jnp.array(
        [[1.0, 0.0, -mean[0]], [0.0, 1.0, -mean[1]], [0.0, 0.0, 1.0 / s]]
    )
    T = T * s
    return centered * s, T


def fit_fundamental_8pt(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Normalized 8-point algorithm: (8, 2) x2 -> F21 (3, 3) with
    ``x2^T F x1 = 0`` and rank-2 projection."""
    p1n, T1 = _normalize(p1)
    p2n, T2 = _normalize(p2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1)
    Fn = smallest_singular_vector(A).reshape(3, 3)
    # Rank-2 projection without an SVD: subtract the smallest singular
    # component, F' = F - (F v3) v3^T with v3 from the analytic
    # eigendecomposition of F^T F (sigma3 u3 = F v3 exactly).
    _, V = eigh3x3(matmul3(Fn.T, Fn))
    v3 = V[:, 0]
    Fn = Fn - jnp.outer(matmul3(Fn, v3[:, None])[:, 0], v3)
    F = matmul3(matmul3(T2.T, Fn), T1)
    return F / jnp.where(jnp.abs(F[2, 2]) > 1e-8, F[2, 2], 1.0)


def fit_homography_dlt(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """DLT homography: (N>=4, 2) x2 -> H21 with ``x2 ~ H x1``."""
    p1n, T1 = _normalize(p1)
    p2n, T2 = _normalize(p2)
    n = p1.shape[0]
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    rows_a = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=1)
    rows_b = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)  # (2n, 9)
    Hn = smallest_singular_vector(A).reshape(3, 3)
    H = matmul3(matmul3(inv3x3(T2), Hn), T1)
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-8, H[2, 2], 1.0)


def matmul3(a, b):
    return jnp.matmul(a, b, precision=HIGHEST)


# ---------------------------------------------------------------------------
# Scoring (ORB-SLAM3-style symmetric transfer chi^2)
# ---------------------------------------------------------------------------

def _apply_lines(F: jax.Array, x: jax.Array, transpose: bool) -> jax.Array:
    """``l[..., k, i] = sum_j F[..., i, j] x[k, j]`` (or F^T) as a
    broadcast-sum: tiny 3-dim contractions over a hypothesis batch are
    VPU elementwise work, not MXU matmuls — a vmapped einsum here was as
    expensive as the whole SuperGlue GNN on TPU."""
    if transpose:
        return jnp.sum(F[..., None, :, :] * x[:, :, None], axis=-2)
    return jnp.sum(F[..., None, :, :] * x[:, None, :], axis=-1)


def score_fundamental(F: jax.Array, p1: jax.Array, p2: jax.Array, valid: jax.Array, sigma: float = 1.0):
    """Symmetric epipolar-distance chi^2 score. ``F`` may carry leading
    hypothesis dims (..., 3, 3); all hypotheses score in one broadcast
    batch. Returns (score (...,), inliers (..., K))."""
    inv_s2 = 1.0 / (sigma * sigma)
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)  # (K, 3)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    l2 = _apply_lines(F, x1, False)  # (..., K, 3) epipolar lines in image 2
    l1 = _apply_lines(F, x2, True)  # (..., K, 3) in image 1
    d2 = jnp.sum(l2 * x2, -1) ** 2 / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = jnp.sum(l1 * x1, -1) ** 2 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    chi1 = d2 * inv_s2
    chi2 = d1 * inv_s2
    ok1 = chi1 <= F_CHI2_TH
    ok2 = chi2 <= F_CHI2_TH
    score = jnp.sum(
        jnp.where(valid & ok1, SCORE_CAP - chi1, 0.0)
        + jnp.where(valid & ok2, SCORE_CAP - chi2, 0.0),
        axis=-1,
    )
    return score, valid & ok1 & ok2


def score_homography(H21: jax.Array, p1: jax.Array, p2: jax.Array, valid: jax.Array, sigma: float = 1.0):
    """Symmetric transfer-error chi^2 score for a homography; ``H21``
    may carry leading hypothesis dims (broadcast-batched like
    ``score_fundamental``)."""
    inv_s2 = 1.0 / (sigma * sigma)
    H12 = inv3x3(H21)

    def transfer(H, p):
        x = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        y = _apply_lines(H, x, False)  # (..., K, 3)
        return y[..., :2] / jnp.where(jnp.abs(y[..., 2:3]) > 1e-12, y[..., 2:3], 1e-12)

    d1 = jnp.sum((p1 - transfer(H12, p2)) ** 2, axis=-1) * inv_s2
    d2 = jnp.sum((p2 - transfer(H21, p1)) ** 2, axis=-1) * inv_s2
    ok1 = d1 <= H_CHI2_TH
    ok2 = d2 <= H_CHI2_TH
    score = jnp.sum(
        jnp.where(valid & ok1, SCORE_CAP - d1, 0.0) + jnp.where(valid & ok2, SCORE_CAP - d2, 0.0),
        axis=-1,
    )
    return score, valid & ok1 & ok2


# ---------------------------------------------------------------------------
# Batched RANSAC drivers
# ---------------------------------------------------------------------------

class RansacResult(NamedTuple):
    model: jax.Array  # (3, 3)
    score: jax.Array  # scalar
    inliers: jax.Array  # (K,) bool


def ransac_fundamental(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    valid: jax.Array,
    iterations: int = 200,
    sigma: float = 1.0,
) -> RansacResult:
    """All-hypotheses-at-once fundamental RANSAC over padded match arrays."""
    sets = sample_minimal_sets(key, valid, iterations, 8)
    Fs = jax.vmap(lambda idx: fit_fundamental_8pt(p1[idx], p2[idx]))(sets)
    scores, inliers = score_fundamental(Fs, p1, p2, valid, sigma)
    best = jnp.argmax(scores)
    return RansacResult(model=Fs[best], score=scores[best], inliers=inliers[best])


def ransac_homography(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    valid: jax.Array,
    iterations: int = 200,
    sigma: float = 1.0,
) -> RansacResult:
    """Batched homography RANSAC (8-point DLT sets, as the reference's
    initializer uses — ``epipolar_geometry.cc:53-71``)."""
    sets = sample_minimal_sets(key, valid, iterations, 8)
    Hs = jax.vmap(lambda idx: fit_homography_dlt(p1[idx], p2[idx]))(sets)
    scores, inliers = score_homography(Hs, p1, p2, valid, sigma)
    best = jnp.argmax(scores)
    return RansacResult(model=Hs[best], score=scores[best], inliers=inliers[best])
