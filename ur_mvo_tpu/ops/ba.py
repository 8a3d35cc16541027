"""Sliding-window bundle adjustment: Schur-complement Levenberg-Marquardt
as a single jitted device kernel.

From-scratch replacement for g2o's ``LocalmapOptimization``
(``/root/reference/src/g2o_optimization.cc:20-177``): SE(3) keyframe
vertices, marginalized 3D point vertices, mono (2D) and stereo (3D)
reprojection edges with identity information, Huber kernels, and the
reference's two-phase schedule — 10 robust LM iterations, chi^2 outlier
gating (mono 10 / stereo 75, plus positive-depth), then 5 more iterations
without the outliers — returning per-observation inlier verdicts for the
map-maintenance pass (``mapping.cc:474-501``).

TPU mapping
-----------
g2o builds a sparse CSparse/Eigen system on the host; here the problem is
*padded to static shapes* (F frames, P points, O observations) and the
reduced camera system is assembled with dense scatter-adds:

* per-observation residuals/Jacobians: batched closed forms (no autodiff
  in the hot loop),
* ``H_cc`` (F,6,6), ``H_pp`` (P,3,3), ``b``: ``segment_sum`` scatters,
* the camera-point coupling is accumulated into a dense ``(P, F, 6, 3)``
  tensor ``U`` — a few MB for the reference's <=36-frame window — so the
  Schur complement ``S = H_cc - U Hpp^-1 U^T`` is two big MXU batched
  matmuls instead of sparse-graph bookkeeping,
* the (6F, 6F) reduced system is solved with dense Cholesky on device,
* fixed frames (gauge) are handled by masking their Jacobians and pinning
  their diagonal blocks.

The same kernel powers the distributed variant (``parallel/dist_ba.py``),
which shards points+observations over a mesh and ``psum``s ``S`` and the
right-hand side.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST, se3_exp
from ur_mvo_tpu.ops.linalg import inv3x3

einsum = partial(jnp.einsum, precision=HIGHEST)


class BAProblem(NamedTuple):
    """Padded BA problem. All arrays static-shape; masks gate validity."""

    # Keyframe poses, world-from-camera (reference Pose3d convention).
    R_wc: jax.Array  # (F, 3, 3)
    t_wc: jax.Array  # (F, 3)
    frame_valid: jax.Array  # (F,) bool
    frame_fixed: jax.Array  # (F,) bool — gauge/fixed frames
    # Landmarks.
    X: jax.Array  # (P, 3) world positions
    point_valid: jax.Array  # (P,) bool
    # Observations.
    obs_frame: jax.Array  # (O,) int32 -> [0, F)
    obs_point: jax.Array  # (O,) int32 -> [0, P)
    obs_uv: jax.Array  # (O, 3): u, v, u_right (u_right < 0 => mono)
    obs_valid: jax.Array  # (O,) bool


class BAResult(NamedTuple):
    R_wc: jax.Array
    t_wc: jax.Array
    X: jax.Array
    obs_inlier: jax.Array  # (O,) bool — final chi2 verdicts
    cost: jax.Array  # final robust cost


class BAConfig(NamedTuple):
    chi2_mono: float = 10.0
    chi2_stereo: float = 75.0
    iters_phase1: int = 10
    iters_phase2: int = 5
    lm_lambda0: float = 1e-4
    # normal-equation assembly: "auto"/"matmul" (lane-major linearization
    # + one-hot MXU contraction — fastest measured), "pallas" (VMEM-
    # resident Pallas reduction, kept for larger problems), "sorted"
    # (point-sorted windowed Pallas reduction — fewest MACs but loses
    # end-to-end at production padding, see resolve_assembly) or
    # "scatter" (exact scatter-adds; reference for tests)
    assembly: str = "auto"
    # LM early exit: stop a phase once an ACCEPTED step improves the cost
    # by less than tol (relative). The skipped iterations are near-no-ops
    # on the state (g2o runs its fixed 10+5 schedule). Swept on v5e at
    # production padding (/tmp/ab_tol.py): tol=1e-4 is 2.2x faster than
    # the fixed schedule (1.7 vs 3.8 ms) with 4e-5 m pose drift and
    # identical inlier verdicts; 1e-3 gains nothing more. 0.0 disables
    # (bit-identical to the fixed schedule).
    tol: float = 1e-4
    # Static bound on simultaneously-optimized (non-fixed) frames. The
    # camera system, coupling tensor U and reduced solve are built over
    # free frames only — fixed frames contribute exactly zero columns —
    # so this, not the padded frame count, sizes the Schur system.
    max_free_frames: int = 16


def _invert_poses(R_wc, t_wc):
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -einsum("fij,fj->fi", R_cw, t_wc)
    return R_cw, t_cw


def _residuals(R_cw, t_cw, X, prob: BAProblem, fx, fy, cx, cy, bf):
    """Residuals (O, 3), Jacobians Jc (O, 3, 6), Jp (O, 3, 3), masks."""
    Rf = R_cw[prob.obs_frame]
    tf = t_cw[prob.obs_frame]
    Xp = X[prob.obs_point]
    pc = einsum("oij,oj->oi", Rf, Xp) + tf
    x, y = pc[:, 0], pc[:, 1]
    z = jnp.maximum(pc[:, 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    is_stereo = prob.obs_uv[:, 2] > 0
    r = jnp.stack(
        [u - prob.obs_uv[:, 0], v - prob.obs_uv[:, 1], jnp.where(is_stereo, ur - prob.obs_uv[:, 2], 0.0)],
        axis=-1,
    )
    du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * y * iz2], axis=-1)
    dur = du + jnp.stack([jnp.zeros_like(iz), jnp.zeros_like(iz), bf * iz2], axis=-1)
    dur = jnp.where(is_stereo[:, None], dur, 0.0)
    J_pc = jnp.stack([du, dv, dur], axis=1)  # (O, 3, 3)

    zeros = jnp.zeros_like(x)
    neg_skew = jnp.stack(
        [
            jnp.stack([zeros, pc[:, 2], -pc[:, 1]], -1),
            jnp.stack([-pc[:, 2], zeros, pc[:, 0]], -1),
            jnp.stack([pc[:, 1], -pc[:, 0], zeros], -1),
        ],
        axis=1,
    )
    eye = jnp.broadcast_to(jnp.eye(3), neg_skew.shape)
    J_xi = jnp.concatenate([neg_skew, eye], axis=2)  # (O, 3, 6)
    # batched 3x3 x 3x6 products as broadcast-sums (VPU, fused; see the
    # assembly note in build_normal_terms_matmul)
    Jc = jnp.sum(J_pc[:, :, :, None] * J_xi[:, None, :, :], axis=2)
    Jp = jnp.sum(J_pc[:, :, :, None] * Rf[:, None, :, :], axis=2)  # d pc / d X = R_cw
    depth_pos = pc[:, 2] > 0
    return r, Jc, Jp, is_stereo, depth_pos


def _chi2(r, is_stereo):
    return jnp.where(is_stereo, jnp.sum(r * r, -1), jnp.sum(r[:, :2] ** 2, -1))


def _robust_cost(chi2, is_stereo, th_mono, th_stereo, use_huber):
    th = jnp.where(is_stereo, th_stereo, th_mono)
    delta = jnp.sqrt(th)
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    rho = jnp.where(chi2 <= th, chi2, 2.0 * delta * s - th)
    return jnp.where(use_huber, rho, chi2)


def _free_rank(prob: BAProblem, FF: int) -> jax.Array:
    """Per-frame compact free-slot index in [0, FF); fixed/invalid frames
    get a clipped slot (their Jacobians are zero so any slot is safe)."""
    frame_free = _effective_free(prob, FF)
    rank = jnp.cumsum(frame_free.astype(jnp.int32)) - 1
    return jnp.clip(rank, 0, FF - 1)


def _effective_free(prob: BAProblem, FF: int) -> jax.Array:
    """Free-frame mask with overflow protection: if more than FF frames
    are free, the excess (latest in index order) are treated as fixed
    rather than silently aliasing camera-system slots. Callers should
    size ``max_free_frames`` to avoid hitting this."""
    frame_free = prob.frame_valid & ~prob.frame_fixed
    rank = jnp.cumsum(frame_free.astype(jnp.int32)) - 1
    return frame_free & (rank < FF)


def build_normal_terms(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active, use_huber):
    """One linearization: all scatter-accumulated normal-equation blocks.

    ``active``: (O,) weights in {0,1} (validity x inlier classification).
    Returns (H_cc, b_c, H_pp, b_p, U, cost).
    """
    P = prob.X.shape[0]
    FF = cfg.max_free_frames
    r, Jc, Jp, is_stereo, _ = _residuals(R_cw, t_cw, X, prob, fx, fy, cx, cy, bf)
    chi2 = _chi2(r, is_stereo)
    th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.sqrt(th)
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(chi2 <= th, 1.0, delta / s)
    w = jnp.where(use_huber, w_huber, 1.0) * active

    # Fixed/invalid frames contribute no pose Jacobian; the camera system
    # is indexed by compact FREE-frame slots (fixed-frame observations
    # land on a clipped slot with an exactly-zero Jacobian).
    frame_free = _effective_free(prob, FF)[prob.obs_frame]
    Jc = Jc * frame_free[:, None, None].astype(Jc.dtype)
    free_rank = _free_rank(prob, FF)
    obs_slot = free_rank[prob.obs_frame]

    H_cc = jnp.zeros((FF, 6, 6)).at[obs_slot].add(einsum("oij,oik,o->ojk", Jc, Jc, w))
    b_c = jnp.zeros((FF, 6)).at[obs_slot].add(-einsum("oij,oi,o->oj", Jc, r, w))
    H_pp = jnp.zeros((P, 3, 3)).at[prob.obs_point].add(einsum("oij,oik,o->ojk", Jp, Jp, w))
    b_p = jnp.zeros((P, 3)).at[prob.obs_point].add(-einsum("oij,oi,o->oj", Jp, r, w))
    U = jnp.zeros((P, FF, 6, 3)).at[prob.obs_point, obs_slot].add(
        einsum("oij,oik,o->ojk", Jc, Jp, w)
    )
    cost = jnp.sum(_robust_cost(chi2, is_stereo, cfg.chi2_mono, cfg.chi2_stereo, use_huber) * active)
    return H_cc, b_c, H_pp, b_p, U, cost


def make_one_hots(prob: BAProblem, cfg: BAConfig):
    """Loop-invariant indicator matrices for the matmul assembly.

    ``(EfT (FF, O) f32, Ep_b (O, P) bf16)``. These depend only on the
    problem's index structure, not on the linearization point, so callers
    running LM iterations inside a ``lax.scan`` should build them ONCE
    outside the scan and pass them to :func:`build_normal_terms_matmul` —
    XLA does not hoist loop-invariant code out of a scan body, and
    ``Ep_b`` alone is an O x P materialization (tens of MB at production
    padding) per iteration otherwise. The indicator values 0/1 are exact
    in bf16. ``EfT`` is lane-major (observations in lanes) to match
    :func:`_obs_value_rows_T`.
    """
    FF = cfg.max_free_frames
    P = prob.X.shape[0]
    obs_slot = _free_rank(prob, FF)[prob.obs_frame]
    EfT = jax.nn.one_hot(obs_slot, FF, dtype=jnp.float32, axis=0)
    Ep_b = jax.nn.one_hot(prob.obs_point, P, dtype=jnp.bfloat16)
    return EfT, Ep_b


def build_normal_terms_matmul(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active, use_huber,
                              one_hots=None):
    """MXU formulation of :func:`build_normal_terms`.

    TPU scatter-adds serialize; on profiled windows they dominate the LM
    iteration (~90% of build time). Here every segment reduction becomes
    a one-hot matmul: with ``Ef`` (O, F) and ``Ep`` (O, P) indicator
    matrices, ``H_cc = Ef^T diag(w) [Jc Jc^T]``, ``U[p, f] = sum_o
    Ep[o,p] Ef[o,f] A_o`` is built as ``Ep^T (Ef ⊗ A)``, etc. The
    indicators are bf16 (exact for 0/1 values); accumulation is f32 on
    the MXU. Numerically identical to the scatter path (tested).

    The frame-side and point-side H/b reductions are fused into single
    matmuls (42- and 12-wide value matrices) so the heavy ``Ep`` operand
    streams through HBM once; pass precomputed ``one_hots`` (see
    :func:`make_one_hots`) when calling from inside an LM scan.
    """
    P = prob.X.shape[0]
    FF = cfg.max_free_frames
    VcT, VpT, AT, cost = _obs_value_rows_T(
        prob, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg, active, use_huber
    )

    if one_hots is None:
        one_hots = make_one_hots(prob, cfg)
    EfT, Ep_b = one_hots

    # frame-side reductions: exact f32, H and b fused (EfT is only FF x O)
    Hb_c = einsum("fo,vo->fv", EfT, VcT)
    H_cc = Hb_c[:, :36].reshape(FF, 6, 6)
    b_c = -Hb_c[:, 36:]
    # Point-side segment reductions — H_pp, b_p and the coupling
    # U[p, f] = sum_o Ep[o,p] Ef[o,f] A_o — as ONE (O, P)^T x (300, O)^T
    # matmul in bf16 with f32 accumulation. Profiled on v5e, a separate
    # f32-HIGHEST pass for the 12-wide H_pp/b_p block costs more than the
    # whole U contraction (6 MXU passes at <10% tile utilization plus a
    # second 67MB read of the indicator matrix). bf16 summand rounding is
    # ~0.4% relative on normal-equation terms; the LM accept/reject step
    # guards convergence and the two-phase chi^2 gates operate at pixel
    # scale. Indicators are exact in bf16.
    EfT_b = EfT.astype(jnp.bfloat16)
    AT_b = AT.astype(jnp.bfloat16)
    CT = jnp.concatenate(
        [AT_b * EfT_b[f : f + 1] for f in range(FF)] + [VpT.astype(jnp.bfloat16)], axis=0
    )  # (FF*18 + 12, O)
    out = jnp.einsum(
        "op,vo->pv", Ep_b, CT, preferred_element_type=jnp.float32
    )
    U = out[:, : FF * 18].reshape(P, FF, 6, 3)
    H_pp = out[:, FF * 18 : FF * 18 + 9].reshape(P, 3, 3)
    b_p = -out[:, FF * 18 + 9 :]
    return H_cc, b_c, H_pp, b_p, U, cost


def _obs_value_rows(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active, use_huber):
    """Shared per-observation linearization rows for the matmul/Pallas
    assemblies: ``Vc`` (O, 42) = [Jc^T W Jc | Jc^T W r], ``Vp`` (O, 12) =
    [Jp^T W Jp | Jp^T W r], ``A`` (O, 18) = Jc^T W Jp, plus the robust
    cost at the linearization point."""
    O = prob.obs_frame.shape[0]
    FF = cfg.max_free_frames
    r, Jc, Jp, is_stereo, _ = _residuals(R_cw, t_cw, X, prob, fx, fy, cx, cy, bf)
    chi2 = _chi2(r, is_stereo)
    th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.sqrt(th)
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(chi2 <= th, 1.0, delta / s)
    w = jnp.where(use_huber, w_huber, 1.0) * active

    frame_free = _effective_free(prob, FF)[prob.obs_frame]
    Jc = Jc * frame_free[:, None, None].astype(Jc.dtype)

    # tiny per-observation outer products: broadcast-multiply-sum over the
    # 3-long residual axis (VPU elementwise, fused) — einsum would lower
    # these to batched 6x3x6 MXU matmuls at <5% tile utilization
    Jcw = Jc * w[:, None, None]
    JcJc = jnp.sum(Jcw[:, :, :, None] * Jc[:, :, None, :], axis=1).reshape(O, 36)
    Jcr = jnp.sum(Jcw * r[:, :, None], axis=1)
    Jpw = Jp * w[:, None, None]
    JpJp = jnp.sum(Jpw[:, :, :, None] * Jp[:, :, None, :], axis=1).reshape(O, 9)
    Jpr = jnp.sum(Jpw * r[:, :, None], axis=1)
    A = jnp.sum(Jcw[:, :, :, None] * Jp[:, :, None, :], axis=1).reshape(O, 18)
    Vc = jnp.concatenate([JcJc, Jcr], axis=1)
    Vp = jnp.concatenate([JpJp, Jpr], axis=1)
    cost = jnp.sum(_robust_cost(chi2, is_stereo, cfg.chi2_mono, cfg.chi2_stereo, use_huber) * active)
    return Vc, Vp, A, cost


# ---------------------------------------------------------------------------
# Lane-major ("transposed") linearization.
#
# The row-major path materializes (O, 3, 6)/(O, 3, 3) Jacobian tensors whose
# trailing dims occupy 6 (or 3) of a vector tile's 128 lanes — profiled at
# 0.19 ms/call on v5e for O=8192, ~70% of the whole LM iteration. Here every
# quantity is a flat (O,) vector (observations in lanes, fully occupied) and
# the 3-term Jacobian contractions are expanded symbolically at trace time
# with structural zeros skipped, so the entire linearization is ~250 full-
# lane VPU ops plus one (9, O) gather relayout. Summand-identical to the
# row-major path (tested).
# ---------------------------------------------------------------------------


def _mulz(a, b):
    """Symbolic product where ``None`` is a structural zero and float 1.0
    the identity."""
    if a is None or b is None:
        return None
    if isinstance(a, float):
        return b if a == 1.0 else (None if a == 0.0 else a * b)
    if isinstance(b, float):
        return a if b == 1.0 else (None if b == 0.0 else a * b)
    return a * b


def _sumz(terms):
    terms = [t for t in terms if t is not None]
    if not terms:
        return None
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def _prelude_T(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf):
    """Shared lane-major residual prelude: per-observation camera-frame
    point, residual components, and the d(residual)/d(pc) rows, all as
    (O,) vectors (structural zeros as ``None``)."""
    F = R_cw.shape[0]
    Rf = R_cw.reshape(F, 9)[prob.obs_frame].T  # (9, O)
    tf = t_cw[prob.obs_frame].T  # (3, O)
    Xp = X[prob.obs_point].T  # (3, O)
    obs = prob.obs_uv.T  # (3, O)
    pc = [
        Rf[3 * i] * Xp[0] + Rf[3 * i + 1] * Xp[1] + Rf[3 * i + 2] * Xp[2] + tf[i]
        for i in range(3)
    ]
    x, y = pc[0], pc[1]
    z = jnp.maximum(pc[2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    is_st = obs[2] > 0
    stf = is_st.astype(x.dtype)
    r = [u - obs[0], v - obs[1], stf * (u - bf * iz - obs[2])]
    du = [fx * iz, None, -fx * x * iz2]
    dv = [None, fy * iz, -fy * y * iz2]
    dur = [stf * du[0], None, stf * (du[2] + bf * iz2)]
    Jpc = [du, dv, dur]  # rows: residual comp, cols: pc comp
    return Rf, pc, r, Jpc, is_st


def _chi2_T(r):
    return r[0] * r[0] + r[1] * r[1] + r[2] * r[2]


def _cost_T(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active, use_huber):
    """Robust cost only, lane-major (for LM accept/reject evaluations)."""
    _, _, r, _, is_st = _prelude_T(prob, R_cw, t_cw, X, fx, fy, cx, cy, bf)
    chi2 = _chi2_T(r)
    return jnp.sum(
        _robust_cost(chi2, is_st, cfg.chi2_mono, cfg.chi2_stereo, use_huber) * active
    )


def _gate_T(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf):
    """(chi2 (O,), is_stereo (O,), depth_pos (O,)) for inlier gating."""
    _, pc, r, _, is_st = _prelude_T(prob, R_cw, t_cw, X, fx, fy, cx, cy, bf)
    return _chi2_T(r), is_st, pc[2] > 0


def _obs_value_rows_T(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active, use_huber):
    """Lane-major equivalent of :func:`_obs_value_rows`: returns
    ``VcT`` (42, O), ``VpT`` (12, O), ``AT`` (18, O) and the robust cost.
    Row orders match the row-major reshapes (i*6+j etc.) exactly."""
    FF = cfg.max_free_frames
    Rf, pc, r, Jpc, is_st = _prelude_T(prob, R_cw, t_cw, X, fx, fy, cx, cy, bf)
    chi2 = _chi2_T(r)
    th = jnp.where(is_st, cfg.chi2_stereo, cfg.chi2_mono)
    delta = jnp.sqrt(th)
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(chi2 <= th, 1.0, delta / s)
    w = jnp.where(use_huber, w_huber, 1.0) * active
    ffm = _effective_free(prob, FF)[prob.obs_frame].astype(w.dtype)
    wc = w * ffm  # camera-side weight (Jc is masked on fixed frames)

    # J_xi = [-skew(pc) | I3]; Jc[a][j] = sum_k Jpc[a][k] * J_xi[k][j]
    nsk = [[None, pc[2], -pc[1]], [-pc[2], None, pc[0]], [pc[1], -pc[0], None]]

    def jxi(k, j):
        if j < 3:
            return nsk[k][j]
        return 1.0 if (j - 3) == k else None

    Jc = [[_sumz([_mulz(Jpc[a][k], jxi(k, j)) for k in range(3)]) for j in range(6)] for a in range(3)]
    Jp = [[_sumz([_mulz(Jpc[a][k], Rf[3 * k + j]) for k in range(3)]) for j in range(3)] for a in range(3)]

    def quad(weight, L, R_, nl, nr):
        """rows[i*nr+j] = sum_a weight * L[a][i] * R_[a][j]"""
        return [
            _sumz([_mulz(_mulz(weight, L[a][i]), R_[a][j]) for a in range(3)])
            for i in range(nl)
            for j in range(nr)
        ]

    JcJc = quad(wc, Jc, Jc, 6, 6)  # 36
    Jcr = [_sumz([_mulz(_mulz(wc, Jc[a][j]), r[a]) for a in range(3)]) for j in range(6)]
    JpJp = quad(w, Jp, Jp, 3, 3)  # 9
    Jpr = [_sumz([_mulz(_mulz(w, Jp[a][j]), r[a]) for a in range(3)]) for j in range(3)]
    AT = quad(wc, Jc, Jp, 6, 3)  # 18, index i*3+j

    zero = jnp.zeros_like(w)
    stackT = lambda rows: jnp.stack([zero if e is None else e for e in rows])
    cost = jnp.sum(_robust_cost(chi2, is_st, cfg.chi2_mono, cfg.chi2_stereo, use_huber) * active)
    return stackT(JcJc + Jcr), stackT(JpJp + Jpr), stackT(AT), cost


def build_normal_terms_pallas(prob: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active, use_huber,
                              one_hots=None, interpret=None):
    """Pallas-assembled normal equations (see ``ops.pallas_ba``): the
    point-side segment reduction runs with indicator matrices and the
    slot-expanded coupling rows built in VMEM, eliminating the ~43 MB/LM-
    iteration HBM traffic of the dense one-hot contraction. Summand-
    identical to :func:`build_normal_terms_matmul`."""
    from ur_mvo_tpu.ops.pallas_ba import point_reduce_pallas

    P = prob.X.shape[0]
    FF = cfg.max_free_frames
    Vc, Vp, A, cost = _obs_value_rows(
        prob, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg, active, use_huber
    )
    if one_hots is None:
        one_hots = make_one_hots_pallas(prob, cfg)
    Ef, obs_slot = one_hots

    Hb_c = einsum("of,ov->fv", Ef, Vc)
    H_cc = Hb_c[:, :36].reshape(FF, 6, 6)
    b_c = -Hb_c[:, 36:]

    if interpret is None:
        # Mosaic compilation needs a real TPU; interpret elsewhere so the
        # "pallas" assembly stays runnable (tests, CPU debugging).
        interpret = jax.default_backend() != "tpu"
    out = point_reduce_pallas(A, Vp, prob.obs_point, obs_slot, P, FF, interpret=interpret)
    U = out[:, : FF * 18].reshape(P, FF, 6, 3)
    H_pp = out[:, FF * 18 : FF * 18 + 9].reshape(P, 3, 3)
    b_p = -out[:, FF * 18 + 9 :]
    return H_cc, b_c, H_pp, b_p, U, cost


def make_one_hots_pallas(prob: BAProblem, cfg: BAConfig):
    """Loop-invariant index structure for the Pallas assembly: the small
    frame-side indicator (O, FF) plus raw per-observation slot ids."""
    FF = cfg.max_free_frames
    obs_slot = _free_rank(prob, FF)[prob.obs_frame]
    Ef = jax.nn.one_hot(obs_slot, FF, dtype=jnp.float32)
    return Ef, obs_slot


def make_sorted_layout(prob: BAProblem, cfg: BAConfig):
    """Loop-invariant structure for the "sorted" assembly: the point-sort
    permutation, compact point ranks, per-chunk accumulator windows, and
    the rank->point remap. Built ONCE per BA problem (outside the LM
    scan); only the per-observation value rows change per iteration.

    Returns ``(order, prob_s, layout)`` where ``prob_s`` is the
    point-sorted problem and ``layout = (EfT, rank, slot_s, win,
    rank_of_point, n_ranks_pad)`` with every obs-indexed array in
    point-sorted order.
    """
    from ur_mvo_tpu.ops.pallas_ba import _SCHUNK, _SWIN

    P = prob.X.shape[0]
    FF = cfg.max_free_frames
    order = jnp.argsort(prob.obs_point)
    prob_s = permute_observations(prob, order)
    pt_s = prob_s.obs_point
    first = jnp.concatenate([jnp.ones((1,), bool), pt_s[1:] != pt_s[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    win = (rank[::_SCHUNK] // 8) * 8
    n_ranks_pad = ((P + _SWIN + 7) // 8) * 8
    rank_of_point = jnp.full((P,), n_ranks_pad - 1, jnp.int32).at[pt_s].set(rank)
    slot_s = _free_rank(prob, FF)[prob_s.obs_frame]
    EfT = jax.nn.one_hot(slot_s, FF, dtype=jnp.float32, axis=0)
    return order, prob_s, (EfT, rank, slot_s, win, rank_of_point, n_ranks_pad)


def permute_observations(prob: BAProblem, order: jax.Array) -> BAProblem:
    return prob._replace(
        obs_frame=prob.obs_frame[order],
        obs_point=prob.obs_point[order],
        obs_uv=prob.obs_uv[order],
        obs_valid=prob.obs_valid[order],
    )


def build_normal_terms_sorted(prob_s: BAProblem, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg: BAConfig, active,
                              use_huber, layout, interpret=None):
    """Sorted-window assembly: observations (already point-sorted in
    ``prob_s``) are segment-reduced onto compact point ranks by
    ``ops.pallas_ba.point_reduce_sorted_pallas`` — each 512-observation
    chunk contracts against only its own <=528-row accumulator window, so
    the point-side work is O(O * 528 * V) independent of P (the dense
    one-hot path pays O(O * P * V), ~94% structural zeros at production
    padding). Same bf16-product/f32-accumulate numerics as the matmul
    path."""
    from ur_mvo_tpu.ops.pallas_ba import point_reduce_sorted_pallas

    P = prob_s.X.shape[0]
    FF = cfg.max_free_frames
    EfT, rank, slot_s, win, rank_of_point, n_ranks_pad = layout
    VcT, VpT, AT, cost = _obs_value_rows_T(
        prob_s, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg, active, use_huber
    )
    Hb_c = einsum("fo,vo->fv", EfT, VcT)
    H_cc = Hb_c[:, :36].reshape(FF, 6, 6)
    b_c = -Hb_c[:, 36:]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = point_reduce_sorted_pallas(
        AT.T, VpT.T, rank, slot_s, win, n_ranks_pad, FF, interpret=interpret
    )
    full = out[rank_of_point]  # (P, FF*18+12); unobserved points -> zero row
    U = full[:, : FF * 18].reshape(P, FF, 6, 3)
    H_pp = full[:, FF * 18 : FF * 18 + 9].reshape(P, 3, 3)
    b_p = -full[:, FF * 18 + 9 :]
    return H_cc, b_c, H_pp, b_p, U, cost


def resolve_assembly(cfg: BAConfig, n_obs: int = 0, n_points: int = 0) -> str:
    """Resolve "auto" to the best assembly for the current backend.

    Profiled on v5e (scripts/profile_ba.py, /tmp A/B runs): the
    lane-major one-hot matmul assembly beats both Pallas reductions —
    the chunked kernel rebuilds a full (chunk, P) indicator in VMEM
    (more MACs than the dense path), and the sorted-window kernel's MAC
    savings (10 -> 4 GFLOP/linearization) are eaten by its per-call
    argsort/layout and per-iteration rank gather + value transpose
    (full 10+5-iter BA: matmul 2.77 ms vs sorted 2.96 ms, bitwise-equal
    results). "auto" is the matmul path at window scale; beyond
    ~128M indicator elements (the bf16 Ep_b one-hot is O x P — a
    long-sequence GLOBAL BA at 65k points / 500k obs would be a 65 GB
    materialization) "auto" falls back to the sorted-window assembly,
    whose memory is O(P + O). "pallas"/"sorted" stay available
    explicitly."""
    if cfg.assembly != "auto":
        return cfg.assembly
    if n_obs * n_points > 128 * 1024 * 1024:
        return "sorted"
    return "matmul"


def solve_schur(H_cc, b_c, H_pp, b_p, U, slot_active, point_free, lam):
    """Damped Schur-complement solve over the FREE-frame camera system ->
    (delta_c (FF, 6) per free slot, delta_p (P, 3)).

    ``slot_active``: (FF,) mask of free slots actually populated;
    ``point_free``: (P,). Inactive unknowns get a pinned identity block
    (delta = 0).
    """
    FF = H_cc.shape[0]
    P = H_pp.shape[0]
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    H_ppd = H_pp + lam * eye3[None] + (~point_free)[:, None, None] * eye3[None]
    Hpp_inv = inv3x3(H_ppd) * point_free[:, None, None]

    # Lane-major reduction: (P, 6FF, 3) arrays leave 125 of 128 lanes
    # idle; one relayout to three full-lane (P, 6FF) planes turns the
    # inner V/S contractions into broadcast FMAs + clean K=P matmuls
    # (profiled 2-3x faster than the direct einsums on v5e).
    Ur = U.reshape(P, FF * 6, 3)
    U3 = jnp.transpose(Ur, (2, 0, 1))  # (3, P, 6FF) — single relayout
    # V[p,i,g] = sum_f Ur[p,i,f] Hinv[p,f,g]  ->  V3[g] = sum_f U3[f] * Hinv[:,f,g]
    V3 = [
        sum(U3[f] * Hpp_inv[:, f, g][:, None] for f in range(3)) for g in range(3)
    ]  # 3 x (P, 6FF)
    S_red = sum(einsum("pi,pj->ij", V3[g], U3[g]) for g in range(3))  # (6FF, 6FF)

    H_cc_d = H_cc + lam * eye6[None]
    S_full = jnp.zeros((FF * 6, FF * 6))
    idx = jnp.arange(FF)
    S_full = S_full.reshape(FF, 6, FF, 6).at[idx, :, idx, :].set(H_cc_d).reshape(FF * 6, FF * 6)
    S_full = S_full - S_red

    free6 = jnp.repeat(slot_active, 6)
    # Pin inactive rows/cols: S <- M S M + (I - M).
    M = free6.astype(S_full.dtype)
    S_full = S_full * M[:, None] * M[None, :] + jnp.diag(1.0 - M)
    b_s = b_c.reshape(FF * 6) - sum(
        jnp.sum(V3[g] * b_p[:, g][:, None], axis=0) for g in range(3)
    )
    b_s = b_s * M

    # S is SPD after damping + pinning: Cholesky beats generic LU on TPU.
    chol = jax.scipy.linalg.cho_factor(S_full)
    delta_c = jax.scipy.linalg.cho_solve(chol, b_s).reshape(FF, 6)
    # Back-substitution: delta_p = Hpp^-1 (b_p - U^T delta_c).
    dc = delta_c.reshape(FF * 6)
    rhs_p = b_p - jnp.stack([einsum("pi,i->p", U3[f], dc) for f in range(3)], axis=1)
    delta_p = einsum("pfg,pg->pf", Hpp_inv, rhs_p)
    return delta_c, delta_p


def _apply_update(R_cw, t_cw, X, delta_c, delta_p, frame_free, point_free):
    dR, dt = se3_exp(delta_c)
    R_new = einsum("fij,fjk->fik", dR, R_cw)
    t_new = einsum("fij,fj->fi", dR, t_cw) + dt
    R_new = jnp.where(frame_free[:, None, None], R_new, R_cw)
    t_new = jnp.where(frame_free[:, None], t_new, t_cw)
    X_new = jnp.where(point_free[:, None], X + delta_p, X)
    return R_new, t_new, X_new


def bundle_adjust(
    prob: BAProblem,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float = 0.0,
    cfg: BAConfig = BAConfig(),
) -> BAResult:
    """Two-phase robust LM bundle adjustment (one compiled program)."""
    FF = cfg.max_free_frames
    frame_free = _effective_free(prob, FF)
    # Points with at least one valid observation are free.
    point_free = prob.point_valid
    free_rank = _free_rank(prob, FF)
    slot_active = jnp.arange(FF) < jnp.sum(frame_free.astype(jnp.int32))

    R_cw0, t_cw0 = _invert_poses(prob.R_wc, prob.t_wc)

    assembly = resolve_assembly(cfg, n_obs=prob.obs_frame.shape[0], n_points=prob.X.shape[0])
    unsort = None
    if assembly == "sorted":
        # point-sort the observations; index structure is loop-invariant
        order, prob, layout = make_sorted_layout(prob, cfg)
        unsort = order
        builder = partial(build_normal_terms_sorted, layout=layout)
    elif assembly == "pallas":
        # index structure is loop-invariant: build once, not per LM step
        builder = partial(build_normal_terms_pallas, one_hots=make_one_hots_pallas(prob, cfg))
    elif assembly == "matmul":
        builder = partial(build_normal_terms_matmul, one_hots=make_one_hots(prob, cfg))
    else:
        builder = build_normal_terms

    def lm_phase(state, active, n_iters, use_huber):
        def linearize(R_cw, t_cw, X):
            H_cc, b_c, H_pp, b_p, U, _ = builder(
                prob, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg, active, use_huber
            )
            return (H_cc, b_c, H_pp, b_p, U)

        def cond(carry):
            i, _, _, _, _, _, _, done = carry
            return (i < n_iters) & ~done

        def step(carry):
            i, R_cw, t_cw, X, lam, cost_prev, lin, _ = carry
            delta_c_free, delta_p = solve_schur(*lin, slot_active, point_free, lam)
            delta_c = delta_c_free[free_rank] * frame_free[:, None].astype(delta_c_free.dtype)
            R_try, t_try, X_try = _apply_update(R_cw, t_cw, X, delta_c, delta_p, frame_free, point_free)
            cost_try = _cost_T(prob, R_try, t_try, X_try, fx, fy, cx, cy, bf, cfg, active, use_huber)
            accept = cost_try < cost_prev
            # converged: an accepted step no longer moves the cost — the
            # remaining schedule would be no-ops on the state (rejected
            # steps only grow lambda and must keep retrying)
            rel = (cost_prev - cost_try) / jnp.maximum(cost_prev, 1e-12)
            done = accept & (rel < cfg.tol)
            R_cw = jnp.where(accept, R_try, R_cw)
            t_cw = jnp.where(accept, t_try, t_cw)
            X = jnp.where(accept, X_try, X)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-8, 1e6)
            cost = jnp.where(accept, cost_try, cost_prev)
            # g2o-style LM: a rejected step retries with larger lambda
            # against the SAME linearization — re-linearizing is only
            # needed (and only paid, via cond) after an accepted step.
            lin = jax.lax.cond(accept & ~done, lambda: linearize(R_cw, t_cw, X), lambda: lin)
            return (i + 1, R_cw, t_cw, X, lam, cost, lin, done)

        R_cw, t_cw, X = state
        cost0 = _cost_T(prob, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg, active, use_huber)
        init = (
            jnp.asarray(0, jnp.int32), R_cw, t_cw, X, jnp.asarray(cfg.lm_lambda0), cost0,
            linearize(R_cw, t_cw, X), jnp.asarray(False),
        )
        _, R_cw, t_cw, X, _, cost, _, _ = jax.lax.while_loop(cond, step, init)
        return (R_cw, t_cw, X), cost

    active0 = prob.obs_valid.astype(jnp.float32)
    state = (R_cw0, t_cw0, prob.X)
    state, _ = lm_phase(state, active0, cfg.iters_phase1, use_huber=True)

    # chi^2 gate between phases (g2o_optimization.cc:124-147).
    chi2, is_stereo, depth_pos = _gate_T(prob, *state, fx, fy, cx, cy, bf)
    th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = prob.obs_valid & (chi2 <= th) & depth_pos
    state, cost = lm_phase(state, inlier.astype(jnp.float32), cfg.iters_phase2, use_huber=False)

    # final verdicts (g2o_optimization.cc:150-161)
    chi2, is_stereo, depth_pos = _gate_T(prob, *state, fx, fy, cx, cy, bf)
    inlier = prob.obs_valid & (chi2 <= th) & depth_pos
    if unsort is not None:
        # verdicts back to the caller's observation order
        inlier = jnp.zeros_like(inlier).at[unsort].set(inlier)

    R_cw, t_cw, X = state
    R_wc, t_wc = _invert_poses(R_cw, t_cw)
    return BAResult(R_wc=R_wc, t_wc=t_wc, X=X, obs_inlier=inlier, cost=cost)
