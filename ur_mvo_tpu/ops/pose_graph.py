"""Pose-graph optimization over SE(3) relative-pose constraints.

The reference has no global back end (its g2o use is limited to
reprojection BA; there is no loop closure or pose-graph layer). This
module provides the framework's global trajectory optimizer: given
keyframe poses and a set of relative-pose edges (sequential odometry
edges by default, loop edges when a place-recognition source supplies
them), minimize

    sum_e w_e || log( T_ij^-1 * T_i^-1 * T_j ) ||^2

with Gauss-Newton on the SE(3) tangent, as one jitted fixed-shape device
kernel (padded edges, masked). The normal equations couple only along
edges; for the <=512-keyframe scale of this system the (6F, 6F) dense
Cholesky on the MXU beats sparse bookkeeping.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.lie import HIGHEST, se3_exp, se3_log

einsum = partial(jnp.einsum, precision=HIGHEST)
mm = partial(jnp.matmul, precision=HIGHEST)


class PoseGraph(NamedTuple):
    R_wc: jax.Array  # (F, 3, 3)
    t_wc: jax.Array  # (F, 3)
    node_valid: jax.Array  # (F,)
    node_fixed: jax.Array  # (F,) — gauge (typically node 0)
    edge_i: jax.Array  # (E,) int32
    edge_j: jax.Array  # (E,) int32
    # measured relative transform: T_ij = T_i^-1 T_j (i-frame <- j-frame)
    R_ij: jax.Array  # (E, 3, 3)
    t_ij: jax.Array  # (E, 3)
    edge_weight: jax.Array  # (E,) >= 0 (0 = padding)


class PoseGraphResult(NamedTuple):
    R_wc: jax.Array
    t_wc: jax.Array
    cost: jax.Array


def _edge_residuals(R, t, g: PoseGraph):
    """r_e = log(T_ij^-1 T_i^-1 T_j) in (E, 6)."""
    Ri = R[g.edge_i]
    ti = t[g.edge_i]
    Rj = R[g.edge_j]
    tj = t[g.edge_j]
    # T_i^-1 T_j
    R_rel = einsum("eji,ejk->eik", Ri, Rj)
    t_rel = einsum("eji,ej->ei", Ri, tj - ti)
    # T_ij^-1 * (.)
    R_err = einsum("eji,ejk->eik", g.R_ij, R_rel)
    t_err = einsum("eji,ej->ei", g.R_ij, t_rel - g.t_ij)
    return se3_log(R_err, t_err)


def optimize_pose_graph(g: PoseGraph, iterations: int = 20, damping: float = 1e-6) -> PoseGraphResult:
    """Gauss-Newton with numerical edge Jacobians via jacfwd on the
    per-edge tangents (cheap: 12 tangent dims per edge)."""
    F = g.R_wc.shape[0]
    free = g.node_valid & ~g.node_fixed

    def residual_of_tangents(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm):
        dRi, dti = se3_exp(xi_i)
        dRj, dtj = se3_exp(xi_j)
        Ri2 = mm(dRi, Ri)
        ti2 = einsum("ij,j->i", dRi, ti) + dti
        Rj2 = mm(dRj, Rj)
        tj2 = einsum("ij,j->i", dRj, tj) + dtj
        R_rel = mm(Ri2.T, Rj2)
        t_rel = einsum("ji,j->i", Ri2, tj2 - ti2)
        R_err = mm(Rm.T, R_rel)
        t_err = einsum("ji,j->i", Rm, t_rel - tm)
        return se3_log(R_err, t_err)

    jac_fn = jax.vmap(
        jax.jacfwd(residual_of_tangents, argnums=(0, 1)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0),
    )

    def gn_step(carry, _):
        R, t = carry
        r = _edge_residuals(R, t, g)  # (E, 6)
        zeros = jnp.zeros((g.edge_i.shape[0], 6))
        Ji, Jj = jac_fn(
            zeros, zeros, R[g.edge_i], t[g.edge_i], R[g.edge_j], t[g.edge_j], g.R_ij, g.t_ij
        )  # (E, 6, 6) each
        w = g.edge_weight
        # mask fixed/invalid nodes
        free_i = free[g.edge_i].astype(Ji.dtype)[:, None, None]
        free_j = free[g.edge_j].astype(Jj.dtype)[:, None, None]
        Ji = Ji * free_i
        Jj = Jj * free_j

        H = jnp.zeros((F, 6, F, 6))
        H = H.at[g.edge_i, :, g.edge_i, :].add(einsum("eri,erj,e->eij", Ji, Ji, w))
        H = H.at[g.edge_j, :, g.edge_j, :].add(einsum("eri,erj,e->eij", Jj, Jj, w))
        H = H.at[g.edge_i, :, g.edge_j, :].add(einsum("eri,erj,e->eij", Ji, Jj, w))
        H = H.at[g.edge_j, :, g.edge_i, :].add(einsum("eri,erj,e->eij", Jj, Ji, w))
        b = jnp.zeros((F, 6))
        b = b.at[g.edge_i].add(-einsum("eri,er,e->ei", Ji, r, w))
        b = b.at[g.edge_j].add(-einsum("eri,er,e->ei", Jj, r, w))

        Hf = H.reshape(F * 6, F * 6)
        M = jnp.repeat(free, 6).astype(Hf.dtype)
        Hf = Hf * M[:, None] * M[None, :] + jnp.diag(1.0 - M) + damping * jnp.eye(F * 6)
        bf = b.reshape(F * 6) * M
        chol = jax.scipy.linalg.cho_factor(Hf)
        dx = jax.scipy.linalg.cho_solve(chol, bf).reshape(F, 6)
        dR, dt = se3_exp(dx)
        R_new = jnp.where(free[:, None, None], einsum("fij,fjk->fik", dR, R), R)
        t_new = jnp.where(free[:, None], einsum("fij,fj->fi", dR, t) + dt, t)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(gn_step, (g.R_wc, g.t_wc), None, length=iterations)
    r = _edge_residuals(R, t, g)
    cost = jnp.sum(jnp.sum(r * r, -1) * g.edge_weight)
    return PoseGraphResult(R_wc=R, t_wc=t, cost=cost)


def sequential_edges_from_trajectory(R_wc, t_wc, n_valid: int, max_edges: int):
    """Odometry chain edges (i, i+1) with measured relatives from the
    current estimates — the default graph when no loop closures exist."""
    import numpy as np

    F = R_wc.shape[0]
    E = max_edges
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    Rm = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    tm = np.zeros((E, 3), np.float32)
    w = np.zeros(E, np.float32)
    n_e = max(0, min(n_valid - 1, E))
    for k in range(n_e):
        i, j = k, k + 1
        ei[k], ej[k] = i, j
        Rr = np.asarray(R_wc[i]).T @ np.asarray(R_wc[j])
        tr = np.asarray(R_wc[i]).T @ (np.asarray(t_wc[j]) - np.asarray(t_wc[i]))
        Rm[k] = Rr
        tm[k] = tr
        w[k] = 1.0
    return ei, ej, Rm, tm, w
