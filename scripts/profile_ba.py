"""One-shot sub-profile of the window-BA kernel on TPU.

Measures bundle_adjust end-to-end plus each internal piece (residuals,
matmul assembly, Schur solve, 96x96 Cholesky, per-LM-iteration slope) at
the production padded shapes, using the slope method (bench.sustained_ms).
Batch everything into one script: remote compiles are minutes each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(F, P, O, fx, fy, cx, cy):
    import jax.numpy as jnp
    import numpy as np

    from ur_mvo_tpu.ops.ba import BAProblem

    rng = np.random.default_rng(0)
    n_frames = min(F - 1, 20)
    n_pts = P // 2
    Xw = rng.uniform([-4, -4, 4], [4, 4, 10], (n_pts, 3)).astype(np.float32)
    t_wc = np.stack([np.linspace(0, 2, n_frames), np.zeros(n_frames), np.zeros(n_frames)], 1).astype(np.float32)
    per_frame = O // n_frames
    obs_f = np.repeat(np.arange(n_frames), per_frame)
    obs_p = np.tile(rng.integers(0, n_pts, per_frame), n_frames)
    pc_z = Xw[obs_p][:, 2]
    u = fx * (Xw[obs_p][:, 0] - t_wc[obs_f][:, 0]) / pc_z + cx
    v = fy * Xw[obs_p][:, 1] / pc_z + cy
    obs_uv = np.stack([u, v, -np.ones_like(u)], 1).astype(np.float32)
    n_obs = len(obs_f)

    def pad(a, n, tail=(), dtype=np.float32):
        out = np.zeros((n,) + tail, dtype)
        out[: len(a)] = np.asarray(a, dtype).reshape((-1,) + tail)[:n]
        return jnp.asarray(out)

    return BAProblem(
        R_wc=jnp.tile(jnp.eye(3)[None], (F, 1, 1)),
        t_wc=pad(t_wc, F, (3,)),
        frame_valid=jnp.arange(F) < n_frames,
        frame_fixed=jnp.arange(F) < max(2, n_frames - 14),
        X=pad(Xw, P, (3,)),
        point_valid=jnp.arange(P) < n_pts,
        obs_frame=pad(obs_f, O, (), np.int32),
        obs_point=pad(obs_p, O, (), np.int32),
        obs_uv=pad(obs_uv, O, (3,)),
        obs_valid=jnp.arange(O) < n_obs,
    )


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import _enable_compile_cache, sustained_ms

    _enable_compile_cache()
    import jax.numpy as jnp

    from ur_mvo_tpu.ops import ba as B

    tiny = "--tiny" in sys.argv
    F, P, O = (8, 256, 1024) if tiny else (40, 2048, 8192)
    fx = fy = 413.3
    cx, cy = 320.0, 256.0
    cfg = B.BAConfig()
    FF = cfg.max_free_frames
    prob = make_problem(F, P, O, fx, fy, cx, cy)
    dev = jax.devices()[0]
    print(f"# profile_ba on {dev.platform}:{dev.device_kind} F={F} P={P} O={O} FF={FF}", file=sys.stderr)

    R_cw, t_cw = B._invert_poses(prob.R_wc, prob.t_wc)
    X = prob.X
    active = prob.obs_valid.astype(jnp.float32)
    one_hots = jax.jit(lambda p: B.make_one_hots(p, cfg))(prob)

    lin = jax.jit(
        lambda R, t, X: B.build_normal_terms_matmul(
            prob, R, t, X, fx, fy, cx, cy, 0.0, cfg, active, True, one_hots=one_hots
        )
    )
    H_cc, b_c, H_pp, b_p, U, _ = lin(R_cw, t_cw, X)

    frame_free = B._effective_free(prob, FF)
    slot_active = jnp.arange(FF) < jnp.sum(frame_free.astype(jnp.int32))
    point_free = prob.point_valid

    solve = jax.jit(
        lambda H_cc, b_c, H_pp, b_p, U: B.solve_schur(
            H_cc, b_c, H_pp, b_p, U, slot_active, point_free, jnp.asarray(1e-4)
        )
    )

    resid = jax.jit(lambda R, t, X: B._residuals(R, t, X, prob, fx, fy, cx, cy, 0.0))

    # Schur pieces
    import numpy as np

    S96 = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (FF * 6, FF * 6)))
    S96 = jnp.asarray(S96 @ S96.T + 96 * np.eye(FF * 6), jnp.float32)
    bs = jnp.ones((FF * 6,), jnp.float32)
    chol = jax.jit(lambda S, b: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b))

    def sred(U, H_pp):
        eye3 = jnp.eye(3)
        H_ppd = H_pp + 1e-4 * eye3[None] + (~point_free)[:, None, None] * eye3[None]
        Hpp_inv = B.inv3x3(H_ppd) * point_free[:, None, None]
        Ur = U.reshape(P, FF * 6, 3)
        V = B.einsum("pif,pfg->pig", Ur, Hpp_inv)
        return B.einsum("pif,pjf->ij", V, Ur)

    sred_j = jax.jit(sred)

    one_hots_p = jax.jit(lambda p: B.make_one_hots_pallas(p, cfg))(prob)
    lin_pallas = jax.jit(
        lambda R, t, X: B.build_normal_terms_pallas(
            prob, R, t, X, fx, fy, cx, cy, 0.0, cfg, active, True, one_hots=one_hots_p
        )
    )
    # on-device correctness vs the matmul path
    lp = lin_pallas(R_cw, t_cw, X)
    lm = (H_cc, b_c, H_pp, b_p, U)
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(lp[:5], lm)]
    print(f"# pallas-vs-matmul builder max|err| H_cc/b_c/H_pp/b_p/U: {errs}", file=sys.stderr)

    # sorted-window assembly: loop-invariant layout + per-iter builder
    from ur_mvo_tpu.ops.ba import (
        build_normal_terms_sorted,
        make_sorted_layout,
    )

    mk_layout = jax.jit(lambda p: make_sorted_layout(p, cfg))
    order, prob_s, layout = mk_layout(prob)
    active_s = prob_s.obs_valid.astype(jnp.float32)
    lin_sorted = jax.jit(
        lambda R, t, X: build_normal_terms_sorted(
            prob_s, R, t, X, fx, fy, cx, cy, 0.0, cfg, active_s, True, layout=layout
        )
    )
    ls = lin_sorted(R_cw, t_cw, X)
    errs_s = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(ls[:5], lm)]
    print(f"# sorted-vs-matmul builder max|err| H_cc/b_c/H_pp/b_p/U: {errs_s}", file=sys.stderr)

    mk = lambda asm, i1, i2: cfg._replace(assembly=asm, iters_phase1=i1, iters_phase2=i2)
    ba_short = jax.jit(lambda p: B.bundle_adjust(p, fx, fy, cx, cy, 0.0, mk("matmul", 2, 1)))
    ba_full = jax.jit(lambda p: B.bundle_adjust(p, fx, fy, cx, cy, 0.0, mk("matmul", 10, 5)))
    ba_short_pl = jax.jit(lambda p: B.bundle_adjust(p, fx, fy, cx, cy, 0.0, mk("pallas", 2, 1)))
    ba_full_pl = jax.jit(lambda p: B.bundle_adjust(p, fx, fy, cx, cy, 0.0, mk("pallas", 10, 5)))

    ba_short_s = jax.jit(lambda p: B.bundle_adjust(p, fx, fy, cx, cy, 0.0, mk("sorted", 2, 1)))
    ba_full_s = jax.jit(lambda p: B.bundle_adjust(p, fx, fy, cx, cy, 0.0, mk("sorted", 10, 5)))

    results = {}
    results["linearize_matmul"] = sustained_ms(lin, (R_cw, t_cw, X), n2=52)
    results["linearize_pallas"] = sustained_ms(lin_pallas, (R_cw, t_cw, X), n2=52)
    results["linearize_sorted"] = sustained_ms(lin_sorted, (R_cw, t_cw, X), n2=52)
    results["sorted_layout_once"] = sustained_ms(mk_layout, (prob,), n2=52)
    results["residuals_only"] = sustained_ms(resid, (R_cw, t_cw, X), n2=52)
    results["solve_schur"] = sustained_ms(solve, (H_cc, b_c, H_pp, b_p, U), n2=52)
    results["cho_96"] = sustained_ms(chol, (S96, bs), n2=52)
    results["S_red_einsums"] = sustained_ms(sred_j, (U, H_pp), n2=52)
    t_short = sustained_ms(ba_short, (prob,), n1=1, n2=9, reps=4)
    t_full = sustained_ms(ba_full, (prob,), n1=1, n2=9, reps=4)
    results["ba_3_iters"] = t_short
    results["ba_15_iters"] = t_full
    results["per_iter_slope"] = (t_full - t_short) / 12.0
    t_short_pl = sustained_ms(ba_short_pl, (prob,), n1=1, n2=9, reps=4)
    t_full_pl = sustained_ms(ba_full_pl, (prob,), n1=1, n2=9, reps=4)
    results["ba_3_iters_pallas"] = t_short_pl
    results["ba_15_iters_pallas"] = t_full_pl
    results["per_iter_slope_pallas"] = (t_full_pl - t_short_pl) / 12.0
    t_short_s = sustained_ms(ba_short_s, (prob,), n1=1, n2=9, reps=4)
    t_full_s = sustained_ms(ba_full_s, (prob,), n1=1, n2=9, reps=4)
    results["ba_3_iters_sorted"] = t_short_s
    results["ba_15_iters_sorted"] = t_full_s
    results["per_iter_slope_sorted"] = (t_full_s - t_short_s) / 12.0

    for k, v in results.items():
        print(f"{k:24s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
