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

def _lines_T(M: jax.Array, xT: jax.Array, transpose: bool) -> jax.Array:
    """``l`` (..., 3, K) = M (or M^T) applied to homogeneous points
    ``xT`` (3, K), as ONE flat (3B, 3) x (3, K) matmul.

    Lane-major scoring layout: with K points in the 128-wide lanes every
    downstream distance/chi^2 op is a full-lane (..., K) vector op. The
    previous (..., K, 3) orientation left 125 of 128 lanes idle across
    the whole scoring pipeline (~20 elementwise passes), which profiled
    as expensive as the SuperGlue GNN itself."""
    Mm = jnp.swapaxes(M, -1, -2) if transpose else M
    lead = Mm.shape[:-2]
    K = xT.shape[-1]
    l = jnp.matmul(Mm.reshape((-1, 3)), xT, precision=HIGHEST)
    return l.reshape(lead + (3, K))


def _homog_T(p1: jax.Array, p2: jax.Array):
    """(K, 2) point pairs -> lane-major homogeneous (3, K) arrays."""
    ones = jnp.ones((1, p1.shape[0]), p1.dtype)
    return (
        jnp.concatenate([p1.T, ones], axis=0),
        jnp.concatenate([p2.T, ones], axis=0),
    )


def score_fundamental(F: jax.Array, p1: jax.Array, p2: jax.Array, valid: jax.Array, sigma: float = 1.0):
    """Symmetric epipolar-distance chi^2 score. ``F`` may carry leading
    hypothesis dims (..., 3, 3); all hypotheses score in one lane-major
    batch. Returns (score (...,), inliers (..., K))."""
    inv_s2 = 1.0 / (sigma * sigma)
    x1T, x2T = _homog_T(p1, p2)
    l2 = _lines_T(F, x1T, False)  # (..., 3, K) epipolar lines in image 2
    l1 = _lines_T(F, x2T, True)  # (..., 3, K) in image 1
    n2 = l2[..., 0, :] * x2T[0] + l2[..., 1, :] * x2T[1] + l2[..., 2, :]
    n1 = l1[..., 0, :] * x1T[0] + l1[..., 1, :] * x1T[1] + l1[..., 2, :]
    d2 = n2 * n2 / jnp.maximum(l2[..., 0, :] ** 2 + l2[..., 1, :] ** 2, 1e-12)
    d1 = n1 * n1 / jnp.maximum(l1[..., 0, :] ** 2 + l1[..., 1, :] ** 2, 1e-12)
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
    may carry leading hypothesis dims (lane-major-batched like
    ``score_fundamental``)."""
    inv_s2 = 1.0 / (sigma * sigma)
    H12 = inv3x3(H21)
    x1T, x2T = _homog_T(p1, p2)

    def transfer_err(H, xsrcT, pdstT):
        y = _lines_T(H, xsrcT, False)  # (..., 3, K)
        w = y[..., 2, :]
        w = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
        du = y[..., 0, :] / w - pdstT[0]
        dv = y[..., 1, :] / w - pdstT[1]
        return du * du + dv * dv

    d1 = transfer_err(H12, x2T, x1T) * inv_s2
    d2 = transfer_err(H21, x1T, x2T) * inv_s2
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
