"""Distributed bundle adjustment: points + observations sharded over a
device mesh, Schur-reduced camera system assembled with ``psum``.

This is the BASELINE.json north-star decomposition: keyframe poses are
small and replicated; map points and their observations are partitioned
across chips (each point's observations live on its owner chip, so the
camera-point coupling blocks are complete locally); every device builds
partial ``H_cc``, ``b_c``, the partial Schur reduction ``U Hpp^-1 U^T``
and RHS from its shard, a single ``psum`` over the mesh axis forms the
global (6F, 6F) reduced system, every device solves it redundantly
(cheaper than gathering), and point updates back-substitute locally.
Collectives ride ICI inside a slice / DCN across hosts — no NCCL/MPI
analog to the (absent) reference mechanism is needed.

Numerically this matches ``ops/ba.py`` exactly (same linearization, same
LM loop); the single-chip kernel is the ndev=1 special case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ur_mvo_tpu.ops.ba import (
    BAConfig,
    BAProblem,
    BAResult,
    _apply_update,
    _chi2,
    _invert_poses,
    _residuals,
    _robust_cost,
)
from ur_mvo_tpu.ops.lie import HIGHEST
from ur_mvo_tpu.ops.linalg import inv3x3

einsum = partial(jnp.einsum, precision=HIGHEST)

AXIS = "data"


def shard_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side repartition for the mesh: points are block-partitioned
    (point p -> shard p % n, then reordered so shard s owns the
    contiguous block [s*Pl, (s+1)*Pl)), and each valid observation is
    grouped into its point's shard block. Invalid (padding) observations
    fill the remaining slots of each block and are re-pointed at the
    block's first point so local indices stay in range (their weight is
    zero). Frame arrays stay replicated."""
    import numpy as np

    P_ = prob.X.shape[0]
    O = prob.obs_frame.shape[0]
    assert P_ % n_shards == 0 and O % n_shards == 0, "pad P and O to multiples of the mesh size"
    Pl = P_ // n_shards

    obs_p_old = np.asarray(prob.obs_point)
    valid = np.asarray(prob.obs_valid)

    # Load-balanced point partition: points carry different track lengths,
    # so assign them to shards greedily by descending observation count
    # (each to the lightest shard with a free point slot). Keeps both the
    # per-shard point count (== Pl) and observation count balanced.
    obs_count = np.bincount(obs_p_old[valid], minlength=P_)
    point_order = np.argsort(-obs_count, kind="stable")
    shard_load = np.zeros(n_shards, np.int64)
    shard_fill = np.zeros(n_shards, np.int64)
    shard_of_point = np.empty(P_, np.int64)
    for p in point_order:
        open_shards = np.nonzero(shard_fill < Pl)[0]
        s = open_shards[np.argmin(shard_load[open_shards])]
        shard_of_point[p] = s
        shard_load[s] += obs_count[p]
        shard_fill[s] += 1
    # position within shard, then block layout: new index = s*Pl + pos
    new_p = np.empty(P_, np.int64)
    fill = np.zeros(n_shards, np.int64)
    for p in point_order:
        s = shard_of_point[p]
        new_p[p] = s * Pl + fill[s]
        fill[s] += 1
    perm_p = np.empty(P_, np.int64)
    perm_p[new_p] = np.arange(P_)  # new order lists old indices

    obs_p_new = new_p[obs_p_old]
    obs_shard = obs_p_new // Pl

    cap = O // n_shards
    by_shard = [np.nonzero((obs_shard == s) & valid)[0] for s in range(n_shards)]
    sizes = [len(b) for b in by_shard]
    if max(sizes) > cap:
        # Lumpy per-point track lengths can defeat perfect balance; grow
        # the observation padding so the heaviest shard fits (extra rows
        # are invalid and cost one more 8-row block per shard at most).
        cap = max(sizes)
        O_new = cap * n_shards
        grow = O_new - O

        def _extend(a):
            a = np.asarray(a)
            pad_shape = (grow,) + a.shape[1:]
            return np.concatenate([a, np.zeros(pad_shape, a.dtype)])

        prob = prob._replace(
            obs_frame=jnp.asarray(_extend(prob.obs_frame)),
            obs_point=jnp.asarray(_extend(prob.obs_point)),
            obs_uv=jnp.asarray(_extend(prob.obs_uv)),
            obs_valid=jnp.asarray(np.concatenate([np.asarray(prob.obs_valid), np.zeros(grow, bool)])),
        )
        valid = np.asarray(prob.obs_valid)
        # keep the per-row new-point map indexable for the pad rows (their
        # values are overridden by pad_point below)
        obs_p_new = np.concatenate([obs_p_new, np.zeros(grow, np.int64)])
        O = O_new
    pad_pool = list(np.nonzero(~valid)[0])
    order = []
    pad_point = []  # per final slot: override obs_point for padding rows
    for s in range(n_shards):
        take = list(by_shard[s])
        need = cap - len(take)
        fills = [pad_pool.pop() for _ in range(need)]
        order.extend(take + fills)
        pad_point.extend([-1] * len(take) + [s * Pl] * need)
    order = np.asarray(order)
    pad_point = np.asarray(pad_point)

    obs_point_final = obs_p_new[order]
    obs_point_final = np.where(pad_point >= 0, pad_point, obs_point_final)

    return BAProblem(
        R_wc=prob.R_wc,
        t_wc=prob.t_wc,
        frame_valid=prob.frame_valid,
        frame_fixed=prob.frame_fixed,
        X=prob.X[perm_p],
        point_valid=prob.point_valid[perm_p],
        obs_frame=prob.obs_frame[order],
        obs_point=jnp.asarray(obs_point_final.astype(np.int32)),
        obs_uv=prob.obs_uv[order],
        obs_valid=prob.obs_valid[order],
    )


# Small LRU: long-running multi-sequence sessions see many distinct
# (shape, config) keys; an unbounded dict would retain every compiled
# shard_map executable (and its device buffers) for the process lifetime.
from collections import OrderedDict as _OrderedDict

_DIST_BA_CACHE: "_OrderedDict" = _OrderedDict()
_DIST_BA_CACHE_MAX = 8


def dist_bundle_adjust(
    prob: BAProblem,
    mesh: Mesh,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float = 0.0,
    cfg: BAConfig = BAConfig(),
) -> BAResult:
    """Sharded two-phase LM BA. ``prob`` must come from
    :func:`shard_problem` with ``n_shards = mesh size``.

    The jitted shard_map program is cached per (mesh, problem shapes,
    intrinsics, config) — a fresh ``jax.jit`` object every call would
    miss XLA's trace cache and re-trace seconds of program each
    invocation (measured on the scaling bench)."""
    key = (
        mesh,
        tuple((a.shape, str(a.dtype)) for a in prob),
        float(fx), float(fy), float(cx), float(cy), float(bf), cfg,
    )
    fn = _DIST_BA_CACHE.get(key)
    if fn is not None:
        _DIST_BA_CACHE.move_to_end(key)
        return fn(prob)
    n = mesh.shape[AXIS]
    F = prob.R_wc.shape[0]

    pspec_point = P(AXIS)
    pspec_rep = P()

    in_specs = BAProblem(
        R_wc=pspec_rep, t_wc=pspec_rep, frame_valid=pspec_rep, frame_fixed=pspec_rep,
        X=pspec_point, point_valid=pspec_point,
        obs_frame=pspec_point, obs_point=pspec_point, obs_uv=pspec_point, obs_valid=pspec_point,
    )

    P_ = prob.X.shape[0]
    Pl = P_ // n  # local points per shard

    def local_fn(prob_l: BAProblem):
        """Runs per shard: full LM with psum'd reduced camera system."""
        shard = jax.lax.axis_index(AXIS)
        # Points are block-partitioned: shard s owns globals
        # [s*Pl, (s+1)*Pl), so the local index is an offset subtract.
        obs_point_local = prob_l.obs_point - shard * Pl
        point_free = prob_l.point_valid

        prob_local = prob_l._replace(obs_point=obs_point_local)

        R_cw0, t_cw0 = _invert_poses(prob_l.R_wc, prob_l.t_wc)

        from ur_mvo_tpu.ops.ba import (
            _effective_free,
            _free_rank,
            build_normal_terms,
            build_normal_terms_matmul,
            make_one_hots,
        )

        O_l = prob_local.obs_frame.shape[0]
        if cfg.assembly != "scatter" and O_l * Pl <= 128 * 1024 * 1024:
            # loop-invariant per-shard indicators: build once outside the
            # scan. ("auto"/"pallas" resolve to the one-hot matmul here:
            # the Pallas reduction is a single-device kernel and the
            # per-shard point counts are small.)
            from functools import partial as _partial

            builder = _partial(build_normal_terms_matmul, one_hots=make_one_hots(prob_local, cfg))
        else:
            # scatter assembly: exact, O(P + O) memory — the (O_l, P_l)
            # bf16 one-hot would exceed ~256 MB per shard beyond this
            # size (see ops.ba.resolve_assembly)
            builder = build_normal_terms
        FF = cfg.max_free_frames
        free_rank = _free_rank(prob_local, FF)
        frame_free = _effective_free(prob_local, FF)
        slot_active = jnp.arange(FF) < jnp.sum(frame_free.astype(jnp.int32))

        def build(R_cw, t_cw, X, active, use_huber):
            # shared builders work unchanged on the local shard: P is the
            # local block size, frame arrays are replicated
            return builder(prob_local, R_cw, t_cw, X, fx, fy, cx, cy, bf, cfg, active, use_huber)

        def lm_phase(state, active, n_iters, use_huber):
            def cond(carry):
                i = carry[0]
                done = carry[-1]
                return (i < n_iters) & ~done

            def step(carry):
                i, R_cw, t_cw, X, lam, cost_prev, _ = carry
                H_cc, b_c, H_pp, b_p, U, _ = build(R_cw, t_cw, X, active, use_huber)
                eye3 = jnp.eye(3)
                eye6 = jnp.eye(6)
                H_ppd = H_pp + lam * eye3[None] + (~point_free)[:, None, None] * eye3[None]
                Hpp_inv = inv3x3(H_ppd) * point_free[:, None, None]
                Ur = U.reshape(Pl, FF * 6, 3)
                V = einsum("pif,pfg->pig", Ur, Hpp_inv)
                S_part = einsum("pif,pjf->ij", V, Ur)
                b_red_part = einsum("pif,pf->i", V, b_p)
                # --- collectives: global reduced (free-frame) camera system ---
                H_cc = jax.lax.psum(H_cc, AXIS)
                b_c = jax.lax.psum(b_c, AXIS)
                S_red = jax.lax.psum(S_part, AXIS)
                b_red = jax.lax.psum(b_red_part, AXIS)

                H_cc_d = H_cc + lam * eye6[None]
                S_full = jnp.zeros((FF, 6, FF, 6))
                idx = jnp.arange(FF)
                S_full = S_full.at[idx, :, idx, :].set(H_cc_d).reshape(FF * 6, FF * 6) - S_red
                M = jnp.repeat(slot_active, 6).astype(S_full.dtype)
                S_full = S_full * M[:, None] * M[None, :] + jnp.diag(1.0 - M)
                b_s = (b_c.reshape(FF * 6) - b_red) * M
                chol = jax.scipy.linalg.cho_factor(S_full)
                delta_c_free = jax.scipy.linalg.cho_solve(chol, b_s).reshape(FF, 6)
                delta_c = delta_c_free[free_rank] * frame_free[:, None].astype(delta_c_free.dtype)
                rhs_p = b_p - einsum("pif,i->pf", Ur, delta_c_free.reshape(FF * 6))
                delta_p = einsum("pfg,pg->pf", Hpp_inv, rhs_p)

                R_try, t_try, X_try = _apply_update(R_cw, t_cw, X, delta_c, delta_p, frame_free, point_free)
                r, _, _, is_stereo, _ = _residuals(R_try, t_try, X_try, prob_local, fx, fy, cx, cy, bf)
                cost_try = jax.lax.psum(
                    jnp.sum(_robust_cost(_chi2(r, is_stereo), is_stereo, cfg.chi2_mono, cfg.chi2_stereo, use_huber) * active),
                    AXIS,
                )
                accept = cost_try < cost_prev
                # convergence early exit: cost_try/cost_prev are psum'd
                # (identical on every shard), so the while condition
                # agrees across the mesh (see ops.ba lm_phase)
                rel = (cost_prev - cost_try) / jnp.maximum(cost_prev, 1e-12)
                done = accept & (rel < cfg.tol)
                R_cw = jnp.where(accept, R_try, R_cw)
                t_cw = jnp.where(accept, t_try, t_cw)
                X = jnp.where(accept, X_try, X)
                lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6)
                cost = jnp.where(accept, cost_try, cost_prev)
                return (i + 1, R_cw, t_cw, X, lam, cost, done)

            R_cw, t_cw, X = state
            r0, _, _, st0, _ = _residuals(R_cw, t_cw, X, prob_local, fx, fy, cx, cy, bf)
            cost0 = jax.lax.psum(
                jnp.sum(_robust_cost(_chi2(r0, st0), st0, cfg.chi2_mono, cfg.chi2_stereo, use_huber) * active),
                AXIS,
            )
            init = (
                jnp.asarray(0, jnp.int32), R_cw, t_cw, X,
                jnp.asarray(cfg.lm_lambda0), cost0, jnp.asarray(False),
            )
            _, R_cw, t_cw, X, _, cost, _ = jax.lax.while_loop(cond, step, init)
            return (R_cw, t_cw, X), cost

        active0 = prob_l.obs_valid.astype(jnp.float32)
        state = (R_cw0, t_cw0, prob_l.X)
        state, _ = lm_phase(state, active0, cfg.iters_phase1, True)

        r, _, _, is_stereo, depth_pos = _residuals(*state, prob_local, fx, fy, cx, cy, bf)
        chi2 = _chi2(r, is_stereo)
        th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
        inlier = prob_l.obs_valid & (chi2 <= th) & depth_pos
        state, cost = lm_phase(state, inlier.astype(jnp.float32), cfg.iters_phase2, False)

        r, _, _, is_stereo, depth_pos = _residuals(*state, prob_local, fx, fy, cx, cy, bf)
        chi2 = _chi2(r, is_stereo)
        inlier = prob_l.obs_valid & (chi2 <= th) & depth_pos

        R_cw, t_cw, X = state
        R_wc = jnp.swapaxes(R_cw, -1, -2)
        t_wc = -einsum("fij,fj->fi", R_wc, t_cw)
        return BAResult(R_wc=R_wc, t_wc=t_wc, X=X, obs_inlier=inlier, cost=cost)

    out_specs = BAResult(R_wc=pspec_rep, t_wc=pspec_rep, X=pspec_point, obs_inlier=pspec_point, cost=pspec_rep)
    fn = jax.jit(
        jax.shard_map(local_fn, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs)
    )
    _DIST_BA_CACHE[key] = fn
    while len(_DIST_BA_CACHE) > _DIST_BA_CACHE_MAX:
        _DIST_BA_CACHE.popitem(last=False)
    return fn(prob)
