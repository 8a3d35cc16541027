"""Pallas TPU kernel: the entire pose-only GN schedule in one program.

``ops/pose_opt.optimize_pose`` replaces g2o's ``FrameOptimization``
(``/root/reference/src/g2o_optimization.cc:179-321``) with a 4x10
masked-GN schedule. As XLA, that is a 40-step sequential chain of tiny
fusions (residuals -> normal terms -> 6x6 solve -> SE(3) update) whose
runtime is kernel-launch overhead, ~1.5-2 ms/frame on v5e regardless of
the trivial FLOP count. Here the whole schedule runs inside ONE Pallas
program: the (N,) point/observation arrays live in VMEM (~30 KB), the
6x6 normal system is built from 27 vector reductions, and the Cholesky
solve + Rodrigues update are unrolled scalar arithmetic — zero HBM
traffic and zero launch boundaries between iterations.

Numerically identical to the XLA path (same restart-per-round, Huber,
chi^2 reclassification semantics); verified against it in
``tests/test_pallas_kernels.py`` and used automatically on TPU via
``pose_pallas_enabled()``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _se3_exp_scalar(dx):
    """Rodrigues SE(3) exp on six 0-d scalars -> (dR 3x3 list, dt 3 list)."""
    wx, wy, wz = dx[0], dx[1], dx[2]
    vx, vy, vz = dx[3], dx[4], dx[5]
    th2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(jnp.maximum(th2, 1e-30))
    small = th2 < 1e-12
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-30))
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (1.0 - A) / jnp.maximum(th2, 1e-30))
    # [w]x and [w]x^2 entries
    K = [[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]]
    K2 = [
        [-(wy * wy + wz * wz), wx * wy, wx * wz],
        [wx * wy, -(wx * wx + wz * wz), wy * wz],
        [wx * wz, wy * wz, -(wx * wx + wy * wy)],
    ]
    eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    dR = [[eye[i][j] + A * K[i][j] + B * K2[i][j] for j in range(3)] for i in range(3)]
    V = [[eye[i][j] + B * K[i][j] + C * K2[i][j] for j in range(3)] for i in range(3)]
    v = [vx, vy, vz]
    dt = [V[i][0] * v[0] + V[i][1] * v[1] + V[i][2] * v[2] for i in range(3)]
    return dR, dt


def _chol_solve6(H, g):
    """Solve H x = g for a 6x6 SPD scalar matrix (lists of 0-d arrays),
    fully unrolled Cholesky + two triangular substitutions."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            t = H[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d
    # forward: L y = g
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _pose_kernel(
    fx, fy, cx, cy, bf, chi2_mono, chi2_stereo, rounds, iters_per_round, damping,
    Xx_ref, Xy_ref, Xz_ref, uo_ref, vo_ref, uro_ref, valid_ref, R0_ref, t0_ref,
    pose_out_ref, inlier_out_ref,
):
    Xx, Xy, Xz = Xx_ref[:], Xy_ref[:], Xz_ref[:]
    uo, vo, uro = uo_ref[:], vo_ref[:], uro_ref[:]
    valid = valid_ref[:]
    stereo = (uro > 0.0).astype(jnp.float32)
    th = stereo * chi2_stereo + (1.0 - stereo) * chi2_mono
    delta_th = jnp.sqrt(th)

    R0 = [[R0_ref[i, j] for j in range(3)] for i in range(3)]
    t0 = [t0_ref[0, i] for i in range(3)]

    def project(R, t):
        pcx = R[0][0] * Xx + R[0][1] * Xy + R[0][2] * Xz + t[0]
        pcy = R[1][0] * Xx + R[1][1] * Xy + R[1][2] * Xz + t[1]
        pcz = R[2][0] * Xx + R[2][1] * Xy + R[2][2] * Xz + t[2]
        z = jnp.maximum(pcz, 1e-6)
        iz = 1.0 / z
        u = fx * pcx * iz + cx
        v = fy * pcy * iz + cy
        ru = u - uo
        rv = v - vo
        rr = stereo * (u - bf * iz - uro)
        chi2 = ru * ru + rv * rv + rr * rr
        return pcx, pcy, pcz, iz, ru, rv, rr, chi2

    def robust_cost(chi2, mask, use_huber):
        if not use_huber:
            return jnp.sum(chi2 * mask)
        s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        rho = jnp.where(chi2 <= th, chi2, 2.0 * delta_th * s - th)
        return jnp.sum(rho * mask)

    inl = valid
    R, t = R0, t0
    for rnd in range(rounds):
        # g2o drops the robust kernel in the 4th round
        # (g2o_optimization.cc FrameOptimization; same constant as the
        # XLA path's `round_idx < 3`)
        use_huber = rnd < 3
        R, t = R0, t0  # g2o resets the vertex each round
        for _ in range(iters_per_round):
            pcx, pcy, pcz, iz, ru, rv, rr, chi2 = project(R, t)
            iz2 = iz * iz
            if use_huber:
                rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
                w = jnp.minimum(1.0, delta_th / rn) * inl
            else:
                w = inl
            du = (fx * iz, jnp.zeros_like(iz), -fx * pcx * iz2)
            dv = (jnp.zeros_like(iz), fy * iz, -fy * pcy * iz2)
            dur = (stereo * du[0], jnp.zeros_like(iz), stereo * (du[2] + bf * iz2))

            def jac(d):
                return (
                    d[1] * (-pcz) + d[2] * pcy,
                    d[0] * pcz + d[2] * (-pcx),
                    d[0] * (-pcy) + d[1] * pcx,
                    d[0],
                    d[1],
                    d[2],
                )

            Ju, Jv, Jr = jac(du), jac(dv), jac(dur)
            H = [[None] * 6 for _ in range(6)]
            g = [None] * 6
            for j in range(6):
                for k in range(j, 6):
                    H[j][k] = jnp.sum(w * (Ju[j] * Ju[k] + Jv[j] * Jv[k] + Jr[j] * Jr[k]))
                g[j] = -jnp.sum(w * (Ju[j] * ru + Jv[j] * rv + Jr[j] * rr))
            for j in range(6):
                for k in range(j):
                    H[j][k] = H[k][j]
            tr = H[0][0] + H[1][1] + H[2][2] + H[3][3] + H[4][4] + H[5][5]
            lam = damping * jnp.maximum(tr / 6.0, 1e-6)
            # normalize to O(1) before the unpivoted scalar Cholesky
            s = jnp.maximum(tr / 6.0, 1e-12)
            inv_s = 1.0 / s
            Hn = [[(H[j][k] + (lam if j == k else 0.0)) * inv_s for k in range(6)] for j in range(6)]
            gn = [g[j] * inv_s for j in range(6)]
            dx = _chol_solve6(Hn, gn)
            dR, dt = _se3_exp_scalar(dx)
            R_new = [
                [dR[i][0] * R[0][j] + dR[i][1] * R[1][j] + dR[i][2] * R[2][j] for j in range(3)]
                for i in range(3)
            ]
            t_new = [dR[i][0] * t[0] + dR[i][1] * t[1] + dR[i][2] * t[2] + dt[i] for i in range(3)]
            # LM step acceptance (matches the XLA path): revert steps
            # that increase the active robust cost — rank-deficient
            # problems otherwise diverge along unobserved directions.
            cost0 = robust_cost(chi2, inl, use_huber)
            _, _, _, _, _, _, _, chi2_new = project(R_new, t_new)
            cost1 = robust_cost(chi2_new, inl, use_huber)
            ok = (cost1 <= cost0) & jnp.isfinite(t_new[0] + t_new[1] + t_new[2])
            okf = ok.astype(jnp.float32)
            R = [[okf * R_new[i][j] + (1.0 - okf) * R[i][j] for j in range(3)] for i in range(3)]
            t = [okf * t_new[i] + (1.0 - okf) * t[i] for i in range(3)]
        # chi^2 reclassification at the round's result
        _, _, pcz, _, _, _, _, chi2 = project(R, t)
        inl = valid * (chi2 <= th).astype(jnp.float32) * (pcz > 0.0).astype(jnp.float32)

    # Mosaic cannot store scalars to VMEM: pack the 12 pose scalars into
    # one (8, 128) block via lane-mask selects and store it whole.
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    out = jnp.zeros((8, 128), jnp.float32)
    vals = [R[i][j] for i in range(3) for j in range(3)] + [t[0], t[1], t[2]]
    for idx, val in enumerate(vals):
        out = jnp.where((row == 0) & (lane == idx), val, out)
    pose_out_ref[:] = out
    inlier_out_ref[:] = inl


def optimize_pose_pallas(
    R_cw0: jax.Array,
    t_cw0: jax.Array,
    X: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
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
    interpret: bool = False,
):
    """Single-program pose optimization. ``X`` (N, 3), ``uv`` (N, 3)
    (u, v, u_right; u_right < 0 => mono), ``valid`` (N,) bool.
    Returns (R_cw, t_cw, inliers (N,) bool)."""
    N = X.shape[0]
    Np = max(_round_up(N, 128), 128)
    rows = Np // 128

    def comp(a):
        return jnp.zeros((Np,), jnp.float32).at[:N].set(a.astype(jnp.float32)).reshape(rows, 128)

    Xx, Xy, Xz = comp(X[:, 0]), comp(X[:, 1]), comp(X[:, 2])
    uo, vo = comp(uv[:, 0]), comp(uv[:, 1])
    # padded slots must read as mono & invalid
    uro = jnp.full((Np,), -1.0, jnp.float32).at[:N].set(uv[:, 2].astype(jnp.float32)).reshape(rows, 128)
    vmask = comp(valid.astype(jnp.float32))

    kern = functools.partial(
        _pose_kernel, fx, fy, cx, cy, bf, chi2_mono, chi2_stereo, rounds, iters_per_round, damping
    )
    pose_out, inl = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Xx, Xy, Xz, uo, vo, uro, vmask, R_cw0.astype(jnp.float32), t_cw0.astype(jnp.float32).reshape(1, 3))
    R_out = pose_out[0, :9].reshape(3, 3)
    t_out = pose_out[0, 9:12]
    inliers = inl.reshape(Np)[:N] > 0.5
    return R_out, t_out, inliers


def pose_pallas_enabled() -> bool:
    """Default-on on TPU; URMVO_PALLAS=0 force-disables (same switch as
    the Sinkhorn kernel)."""
    from ur_mvo_tpu.ops.pallas_kernels import env_gate

    return env_gate(None)
