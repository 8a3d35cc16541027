"""Pose-only robust optimization (the per-frame tracking optimizer).

From-scratch replacement for g2o's ``FrameOptimization``
(``/root/reference/src/g2o_optimization.cc:179-321``): a single SE(3)
vertex with mono (2D) and stereo (3D) reprojection edges, Huber kernels,
and the reference's exact schedule — 4 rounds x 10 iterations, each round
restarting from the initial pose with the current inlier classification,
chi^2 gates (mono 10 / stereo 75, identity information like the
reference), Huber dropped after round 3. Implemented as masked
Gauss-Newton with Levenberg damping on the SE(3) tangent; everything is a
fixed-shape ``lax.scan`` so one compiled kernel serves every frame, and
the whole optimizer is vmappable over frames/sequences.

Convention: optimizes T_cw (world->camera), the same parametrization g2o
uses internally; callers convert from/to T_wc.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST, se3_exp
from ur_mvo_tpu.ops.linalg import spd_inverse_small

einsum = partial(jnp.einsum, precision=HIGHEST)


class PoseObs(NamedTuple):
    """Padded pose-optimization problem: N candidate map-point tracks."""

    X: jax.Array  # (N, 3) world points (fixed)
    uv: jax.Array  # (N, 3): u, v, u_right (u_right < 0 => mono)
    valid: jax.Array  # (N,)


class PoseOptResult(NamedTuple):
    R_cw: jax.Array
    t_cw: jax.Array
    inliers: jax.Array  # (N,) final chi2-gated classification
    n_inliers: jax.Array


def _residuals_jac(R_cw, t_cw, obs: PoseObs, fx, fy, cx, cy, bf):
    """Residuals (N, 3) and pose Jacobian (N, 3, 6) for mono+stereo rows.

    Tangent convention: left-multiplicative update
    T <- exp([w, v]) * T, so d(pc)/d(w) = -[pc]x, d(pc)/d(v) = I.
    """
    pc = einsum("ij,nj->ni", R_cw, obs.X) + t_cw
    x, y, z = pc[:, 0], pc[:, 1], jnp.maximum(pc[:, 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz

    is_stereo = obs.uv[:, 2] > 0
    r = jnp.stack(
        [u - obs.uv[:, 0], v - obs.uv[:, 1], jnp.where(is_stereo, ur - obs.uv[:, 2], 0.0)],
        axis=-1,
    )

    # d(u,v,ur)/d(pc)
    du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * y * iz2], axis=-1)
    dur = du + jnp.stack([jnp.zeros_like(iz), jnp.zeros_like(iz), bf * iz2], axis=-1)
    dur = jnp.where(is_stereo[:, None], dur, 0.0)
    J_pc = jnp.stack([du, dv, dur], axis=1)  # (N, 3, 3)

    # d(pc)/d(xi): [-[pc]x | I]
    zeros = jnp.zeros_like(x)
    neg_skew = jnp.stack(
        [
            jnp.stack([zeros, pc[:, 2], -pc[:, 1]], -1),
            jnp.stack([-pc[:, 2], zeros, pc[:, 0]], -1),
            jnp.stack([pc[:, 1], -pc[:, 0], zeros], -1),
        ],
        axis=1,
    )  # (N, 3, 3) = -[pc]x
    eye = jnp.broadcast_to(jnp.eye(3), neg_skew.shape)
    J_xi = jnp.concatenate([neg_skew, eye], axis=2)  # (N, 3, 6)
    # batched 3x3 x 3x6 product as a broadcast-sum: einsum lowers these to
    # tiny batched MXU matmuls at <5% tile utilization (see ops/ba.py)
    J = jnp.sum(J_pc[:, :, :, None] * J_xi[:, None, :, :], axis=2)
    depth_pos = pc[:, 2] > 0
    return r, J, is_stereo, depth_pos


def optimize_pose(
    R_cw0: jax.Array,
    t_cw0: jax.Array,
    obs: PoseObs,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float = 0.0,
    chi2_mono: float = 10.0,
    chi2_stereo: float = 75.0,
    rounds: int = 4,
    iters_per_round: int = 10,
    damping: float = 1e-3,
) -> PoseOptResult:
    """Robust pose refinement with the reference's 4x10 schedule."""
    from ur_mvo_tpu.ops.pallas_pose import optimize_pose_pallas, pose_pallas_enabled

    if pose_pallas_enabled() and obs.X.ndim == 2:
        # One Pallas program for the whole schedule: the XLA lowering is
        # a launch-overhead-bound 40-step chain (~1.5 ms on v5e); the
        # VMEM-resident kernel is numerically identical (tested).
        R, t, inl = optimize_pose_pallas(
            R_cw0, t_cw0, obs.X, obs.uv, obs.valid, fx, fy, cx, cy, bf,
            chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
            rounds=rounds, iters_per_round=iters_per_round, damping=damping,
        )
        return PoseOptResult(R_cw=R, t_cw=t, inliers=inl, n_inliers=jnp.sum(inl.astype(jnp.int32)))

    th_mono = jnp.asarray(chi2_mono, jnp.float32)
    th_stereo = jnp.asarray(chi2_stereo, jnp.float32)
    delta_mono = jnp.sqrt(th_mono)
    delta_stereo = jnp.sqrt(th_stereo)

    def chi2_of(r, is_stereo):
        return jnp.where(is_stereo, jnp.sum(r * r, -1), jnp.sum(r[:, :2] * r[:, :2], -1))

    def robust_cost(chi2, is_stereo, mask, use_huber):
        # the objective g2o's LM monitors: Huber rho while the robust
        # kernel is active, raw chi2 in the final round
        th = jnp.where(is_stereo, th_stereo, th_mono)
        delta = jnp.sqrt(th)
        s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        rho = jnp.where(chi2 <= th, chi2, 2.0 * delta * s - th)
        return jnp.sum(jnp.where(use_huber, rho, chi2) * mask)

    def gn_round(R, t, inlier_mask, use_huber):
        def gn_step(carry, _):
            R, t = carry
            r, J, is_stereo, _ = _residuals_jac(R, t, obs, fx, fy, cx, cy, bf)
            chi2 = chi2_of(r, is_stereo)
            cost0 = robust_cost(chi2, is_stereo, inlier_mask, use_huber)
            rnorm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            delta = jnp.where(is_stereo, delta_stereo, delta_mono)
            w_huber = jnp.where(rnorm <= delta, 1.0, delta / rnorm)
            w = jnp.where(use_huber, w_huber, 1.0) * inlier_mask
            # normal terms as fused VPU broadcast-reductions: a (6, 3N) x
            # (3N, 7) matmul here forces an MXU round-trip (M=6 -> <5%
            # tile use) and a fusion boundary in a 40-iteration sequential
            # chain that is launch-overhead-bound; these reductions fuse
            # with the residual/Jacobian computation instead.
            Jw = J * w[:, None, None]
            H = jnp.sum(Jw[:, :, :, None] * J[:, :, None, :], axis=(0, 1))
            g = jnp.sum(Jw * r[:, :, None], axis=(0, 1))
            H = H + damping * jnp.eye(6) * jnp.maximum(jnp.trace(H) / 6.0, 1e-6)
            # H is SPD (damped normal matrix): unrolled-Cholesky inverse
            # instead of a sequential 6x6 LAPACK LU per scan iteration.
            scale = jnp.maximum(jnp.trace(H) / 6.0, 1e-12)
            Hinv = spd_inverse_small(H / scale) / scale
            dx = -jnp.sum(Hinv * g[None, :], axis=-1)
            dR, dt = se3_exp(dx)
            R_new = jnp.matmul(dR, R, precision=HIGHEST)
            t_new = einsum("ij,j->i", dR, t) + dt
            # step acceptance (g2o's FrameOptimization is LM, not plain
            # GN): a step that increases the robust cost is reverted.
            # Without this, rank-deficient problems (a handful of wrong
            # correspondences) diverge unboundedly along the unobserved
            # pose directions.
            r_new, _, st_new, _ = _residuals_jac(R_new, t_new, obs, fx, fy, cx, cy, bf)
            cost1 = robust_cost(chi2_of(r_new, st_new), st_new, inlier_mask, use_huber)
            ok = (cost1 <= cost0) & jnp.all(jnp.isfinite(t_new))
            R_new = jnp.where(ok, R_new, R)
            t_new = jnp.where(ok, t_new, t)
            return (R_new, t_new), None

        # fully unrolled: the body is ~50 tiny ops over (N, 3, 6) arrays,
        # so a rolled scan is per-op-overhead-bound on TPU (profiled at
        # ~2 ms for the 4x10 schedule); unrolling lets XLA fuse across
        # iterations.
        (R, t), _ = jax.lax.scan(gn_step, (R, t), None, length=iters_per_round, unroll=iters_per_round)
        return R, t

    def round_body(carry, round_idx):
        _, _, inliers = carry
        # g2o resets the vertex to the initial estimate each round
        # (g2o_optimization.cc:265-267).
        use_huber = round_idx < 3
        R, t = gn_round(R_cw0, t_cw0, inliers.astype(jnp.float32) * obs.valid, use_huber)
        r, _, is_stereo, depth_pos = _residuals_jac(R, t, obs, fx, fy, cx, cy, bf)
        chi2 = chi2_of(r, is_stereo)
        th = jnp.where(is_stereo, th_stereo, th_mono)
        inliers = obs.valid & (chi2 <= th) & depth_pos
        return (R, t, inliers), None

    init = (R_cw0, t_cw0, obs.valid)
    (R, t, inliers), _ = jax.lax.scan(round_body, init, jnp.arange(rounds), unroll=rounds)
    return PoseOptResult(
        R_cw=R, t_cw=t, inliers=inliers, n_inliers=jnp.sum(inliers.astype(jnp.int32))
    )
