import jax
import jax.numpy as jnp
import numpy as np

import ur_mvo_tpu.ops.lie as lie
from ur_mvo_tpu.ops.ba import BAConfig, BAProblem, bundle_adjust

FX = FY = 400.0
CX, CY = 320.0, 256.0
BF = 48.0


def build_problem(key, n_frames=6, n_points=120, F=8, P=160, O=1024, noise=0.3,
                  pose_perturb=0.02, point_perturb=0.05, n_outliers=0, stereo=False):
    """Synthetic BA problem: circular-ish trajectory observing a point cloud,
    padded to static shapes (F, P, O)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    X_true = jax.random.uniform(
        k1, (n_points, 3), minval=jnp.array([-3.0, -3.0, 6.0]), maxval=jnp.array([3.0, 3.0, 12.0])
    )
    # camera path along x with small rotations
    ts = jnp.linspace(0.0, 1.0, n_frames)
    t_wc_true = jnp.stack([2.0 * ts, 0.1 * jnp.sin(3 * ts), 0.05 * ts], axis=1)
    R_wc_true = lie.so3_exp(jnp.stack([0.03 * jnp.sin(2 * ts), 0.1 * ts, 0.02 * ts], axis=1))

    # observations: every frame observes every point that projects inside
    obs_f, obs_p, obs_uv = [], [], []
    R_cw = np.swapaxes(np.asarray(R_wc_true), 1, 2)
    t_cw = -np.einsum("fij,fj->fi", R_cw, np.asarray(t_wc_true))
    rngn = np.random.default_rng(0)
    for f in range(n_frames):
        pc = np.asarray(X_true) @ R_cw[f].T + t_cw[f]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        ur = u - BF / pc[:, 2] if stereo else np.full_like(u, -1.0)
        ok = (pc[:, 2] > 0.1) & (u > 0) & (u < 640) & (v > 0) & (v < 512)
        for p in np.nonzero(ok)[0]:
            obs_f.append(f)
            obs_p.append(int(p))
            obs_uv.append(
                [u[p] + noise * rngn.normal(), v[p] + noise * rngn.normal(), ur[p]]
            )
    n_obs = len(obs_f)
    assert n_obs <= O, n_obs
    # gross outliers
    for i in range(n_outliers):
        obs_uv[i][0] += 50.0
        obs_uv[i][1] -= 40.0

    # perturb initial geometry (keep first two frames fixed = gauge)
    dR = lie.so3_exp(pose_perturb * jax.random.normal(k2, (n_frames, 3)))
    R_wc0 = jnp.einsum("fij,fjk->fik", dR, R_wc_true)
    t_wc0 = t_wc_true + pose_perturb * 5 * jax.random.normal(k3, (n_frames, 3))
    R_wc0 = R_wc0.at[:2].set(R_wc_true[:2])
    t_wc0 = t_wc0.at[:2].set(t_wc_true[:2])
    X0 = X_true + point_perturb * jax.random.normal(k4, X_true.shape)

    def pad(a, n, shape_tail=()):
        out = np.zeros((n,) + shape_tail, dtype=np.float32)
        out[: len(a)] = a
        return jnp.asarray(out)

    prob = BAProblem(
        R_wc=jnp.concatenate([R_wc0, jnp.tile(jnp.eye(3)[None], (F - n_frames, 1, 1))]),
        t_wc=jnp.concatenate([t_wc0, jnp.zeros((F - n_frames, 3))]),
        frame_valid=jnp.arange(F) < n_frames,
        frame_fixed=jnp.arange(F) < 2,
        X=jnp.concatenate([X0, jnp.zeros((P - n_points, 3))]),
        point_valid=jnp.arange(P) < n_points,
        obs_frame=pad(obs_f, O).astype(jnp.int32),
        obs_point=pad(obs_p, O).astype(jnp.int32),
        obs_uv=pad(np.asarray(obs_uv), O, (3,)),
        obs_valid=jnp.arange(O) < n_obs,
    )
    return prob, R_wc_true, t_wc_true, X_true, n_obs


def _pose_errors(res, R_true, t_true, n_frames):
    Rerr = np.abs(np.asarray(res.R_wc[:n_frames]) - np.asarray(R_true)).max()
    terr = np.abs(np.asarray(res.t_wc[:n_frames]) - np.asarray(t_true)).max()
    return Rerr, terr


def test_ba_converges_mono():
    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(0))
    res = bundle_adjust(prob, FX, FY, CX, CY)
    Rerr, terr = _pose_errors(res, R_true, t_true, 6)
    # noise 0.3px over ~100 points/frame: mm-level recovery expected
    assert Rerr < 5e-3, Rerr
    assert terr < 2e-2, terr
    Xerr = np.linalg.norm(np.asarray(res.X[:120]) - np.asarray(X_true), axis=1)
    # depth std at z~8m, f=400, baseline 2m, 0.3px noise is ~2.4cm
    assert np.median(Xerr) < 5e-2
    assert int(res.obs_inlier.sum()) > 0.95 * n_obs


def test_ba_improves_over_init():
    prob, R_true, t_true, X_true, _ = build_problem(jax.random.PRNGKey(1), pose_perturb=0.03)
    init_terr = np.abs(np.asarray(prob.t_wc[:6]) - np.asarray(t_true)).max()
    res = bundle_adjust(prob, FX, FY, CX, CY)
    _, terr = _pose_errors(res, R_true, t_true, 6)
    assert terr < 0.2 * init_terr


def test_ba_fixed_frames_unchanged():
    prob, *_ = build_problem(jax.random.PRNGKey(2))
    res = bundle_adjust(prob, FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(res.R_wc[:2]), np.asarray(prob.R_wc[:2]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.t_wc[:2]), np.asarray(prob.t_wc[:2]), atol=1e-7)


def test_ba_outlier_gating():
    prob, R_true, t_true, X_true, n_obs = build_problem(
        jax.random.PRNGKey(3), n_outliers=40
    )
    res = bundle_adjust(prob, FX, FY, CX, CY)
    inl = np.asarray(res.obs_inlier)
    assert inl[:40].mean() < 0.1  # planted outliers rejected
    assert inl[40:n_obs].mean() > 0.9
    Rerr, terr = _pose_errors(res, R_true, t_true, 6)
    assert Rerr < 1e-2 and terr < 5e-2


def test_ba_stereo_observations():
    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(4), stereo=True)
    res = bundle_adjust(prob, FX, FY, CX, CY, bf=BF)
    Rerr, terr = _pose_errors(res, R_true, t_true, 6)
    assert Rerr < 5e-3 and terr < 2e-2
    assert int(res.obs_inlier.sum()) > 0.9 * n_obs


def test_ba_padding_invariance():
    """Growing the padded capacities must not change the solution."""
    prob, R_true, t_true, X_true, _ = build_problem(jax.random.PRNGKey(5))
    res1 = bundle_adjust(prob, FX, FY, CX, CY)
    # re-pad to double sizes
    F2, P2, O2 = 16, 320, 2048
    prob2 = BAProblem(
        R_wc=jnp.concatenate([prob.R_wc, jnp.tile(jnp.eye(3)[None], (F2 - 8, 1, 1))]),
        t_wc=jnp.concatenate([prob.t_wc, jnp.zeros((F2 - 8, 3))]),
        frame_valid=jnp.pad(prob.frame_valid, (0, F2 - 8)),
        frame_fixed=jnp.pad(prob.frame_fixed, (0, F2 - 8)),
        X=jnp.concatenate([prob.X, jnp.zeros((P2 - 160, 3))]),
        point_valid=jnp.pad(prob.point_valid, (0, P2 - 160)),
        obs_frame=jnp.pad(prob.obs_frame, (0, O2 - 1024)),
        obs_point=jnp.pad(prob.obs_point, (0, O2 - 1024)),
        obs_uv=jnp.pad(prob.obs_uv, ((0, O2 - 1024), (0, 0))),
        obs_valid=jnp.pad(prob.obs_valid, (0, O2 - 1024)),
    )
    # exact (scatter) assembly: padding must be bit-stable
    cfg_exact = BAConfig(assembly="scatter")
    res1 = bundle_adjust(prob, FX, FY, CX, CY, cfg=cfg_exact)
    res2 = bundle_adjust(prob2, FX, FY, CX, CY, cfg=cfg_exact)
    np.testing.assert_allclose(np.asarray(res1.t_wc[:6]), np.asarray(res2.t_wc[:6]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res1.R_wc[:6]), np.asarray(res2.R_wc[:6]), atol=1e-5)
    # matmul assembly (bf16 coupling): solutions agree to optimizer noise
    res3 = bundle_adjust(prob2, FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(res3.t_wc[:6]), np.asarray(res1.t_wc[:6]), atol=1e-2)


def test_matmul_assembly_matches_scatter():
    """The one-hot MXU assembly must agree with the scatter assembly."""
    import jax.numpy as jnp

    from ur_mvo_tpu.ops.ba import (
        BAConfig,
        build_normal_terms,
        build_normal_terms_matmul,
        _invert_poses,
    )

    prob, *_ = build_problem(jax.random.PRNGKey(6))
    R_cw, t_cw = _invert_poses(prob.R_wc, prob.t_wc)
    cfg = BAConfig()
    act = prob.obs_valid.astype(jnp.float32)
    a = build_normal_terms(prob, R_cw, t_cw, prob.X, FX, FY, CX, CY, 0.0, cfg, act, True)
    b = build_normal_terms_matmul(prob, R_cw, t_cw, prob.X, FX, FY, CX, CY, 0.0, cfg, act, True)
    names = ["H_cc", "b_c", "H_pp", "b_p", "U", "cost"]
    for name, x, y in zip(names, a, b):
        x = np.asarray(x)
        y = np.asarray(y)
        scale = max(np.abs(x).max(), 1.0)
        # the whole point side (H_pp, b_p, U) rides one bf16 matmul with
        # f32 accumulation; the frame side and cost stay exact f32
        tol = 1e-5 if name in ("H_cc", "b_c", "cost") else 5e-3
        np.testing.assert_allclose(y / scale, x / scale, atol=tol, err_msg=name)


def test_ba_matmul_assembly_converges():
    from ur_mvo_tpu.ops.ba import BAConfig

    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(7))
    res = bundle_adjust(prob, FX, FY, CX, CY, cfg=BAConfig(assembly="matmul"))
    Rerr, terr = _pose_errors(res, R_true, t_true, 6)
    assert Rerr < 5e-3 and terr < 2e-2
    assert int(res.obs_inlier.sum()) > 0.95 * n_obs


def test_pallas_assembly_matches_scatter():
    """The Pallas VMEM-resident assembly (interpret mode on CPU) must
    agree with the scatter assembly to the same tolerance as the matmul
    path (identical bf16 summands)."""
    import functools

    import jax.numpy as jnp

    from ur_mvo_tpu.ops.ba import (
        BAConfig,
        build_normal_terms,
        build_normal_terms_pallas,
        _invert_poses,
    )

    prob, *_ = build_problem(jax.random.PRNGKey(6))
    R_cw, t_cw = _invert_poses(prob.R_wc, prob.t_wc)
    cfg = BAConfig()
    act = prob.obs_valid.astype(jnp.float32)
    a = build_normal_terms(prob, R_cw, t_cw, prob.X, FX, FY, CX, CY, 0.0, cfg, act, True)
    b = build_normal_terms_pallas(
        prob, R_cw, t_cw, prob.X, FX, FY, CX, CY, 0.0, cfg, act, True, interpret=True
    )
    names = ["H_cc", "b_c", "H_pp", "b_p", "U", "cost"]
    for name, x, y in zip(names, a, b):
        x = np.asarray(x)
        y = np.asarray(y)
        scale = max(np.abs(x).max(), 1.0)
        tol = 1e-5 if name in ("H_cc", "b_c", "cost") else 5e-3
        np.testing.assert_allclose(y / scale, x / scale, atol=tol, err_msg=name)


def test_ba_early_exit_matches_fixed_schedule():
    """tol>0 only skips no-op LM iterations: the solution must match the
    full fixed 10+5 schedule (tol=0) to optimizer-noise tolerance."""
    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(9))
    res_full = bundle_adjust(prob, FX, FY, CX, CY, cfg=BAConfig(tol=0.0))
    res_ee = bundle_adjust(prob, FX, FY, CX, CY, cfg=BAConfig())  # default tol
    np.testing.assert_allclose(
        np.asarray(res_ee.t_wc[:6]), np.asarray(res_full.t_wc[:6]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_ee.R_wc[:6]), np.asarray(res_full.R_wc[:6]), atol=1e-3
    )
    agree = np.mean(np.asarray(res_ee.obs_inlier) == np.asarray(res_full.obs_inlier))
    assert agree > 0.99, agree
    # and it still solves the problem
    Rerr, terr = _pose_errors(res_ee, R_true, t_true, 6)
    assert Rerr < 5e-3 and terr < 2e-2


def test_sorted_assembly_matches_scatter():
    """The sorted-window assembly (interpret mode on CPU) must agree with
    the scatter assembly on the point-sorted problem (same bf16 summand
    class as the matmul path)."""
    from ur_mvo_tpu.ops.ba import (
        BAConfig,
        build_normal_terms,
        build_normal_terms_sorted,
        make_sorted_layout,
        _invert_poses,
    )

    prob, *_ = build_problem(jax.random.PRNGKey(6))
    cfg = BAConfig()
    order, prob_s, layout = make_sorted_layout(prob, cfg)
    R_cw, t_cw = _invert_poses(prob_s.R_wc, prob_s.t_wc)
    act = prob_s.obs_valid.astype(jnp.float32)
    a = build_normal_terms(prob_s, R_cw, t_cw, prob_s.X, FX, FY, CX, CY, 0.0, cfg, act, True)
    b = build_normal_terms_sorted(
        prob_s, R_cw, t_cw, prob_s.X, FX, FY, CX, CY, 0.0, cfg, act, True,
        layout=layout, interpret=True,
    )
    names = ["H_cc", "b_c", "H_pp", "b_p", "U", "cost"]
    for name, x, y in zip(names, a, b):
        x = np.asarray(x)
        y = np.asarray(y)
        scale = max(np.abs(x).max(), 1.0)
        tol = 1e-5 if name in ("H_cc", "b_c", "cost") else 5e-3
        np.testing.assert_allclose(y / scale, x / scale, atol=tol, err_msg=name)


def test_ba_sorted_assembly_converges():
    """End-to-end bundle_adjust with the sorted assembly: same solution
    quality as the other assemblies, and the inlier verdicts come back in
    the caller's (unsorted) observation order."""
    prob, R_true, t_true, X_true, n_obs = build_problem(jax.random.PRNGKey(7))
    res_ref = bundle_adjust(prob, FX, FY, CX, CY, cfg=BAConfig(assembly="matmul"))
    res = bundle_adjust(prob, FX, FY, CX, CY, cfg=BAConfig(assembly="sorted"))
    Rerr, terr = _pose_errors(res, R_true, t_true, 6)
    assert Rerr < 5e-3 and terr < 2e-2
    assert int(res.obs_inlier.sum()) > 0.95 * n_obs
    # verdict order: inliers must mark the same (valid) observation slots
    agree = np.mean(np.asarray(res.obs_inlier) == np.asarray(res_ref.obs_inlier))
    assert agree > 0.98, agree


def test_point_reduce_pallas_segments():
    """Direct check of the Pallas segment reduction against numpy, with
    odd O (internal chunk padding) and collision-heavy point ids."""
    import jax.numpy as jnp

    from ur_mvo_tpu.ops.pallas_ba import point_reduce_pallas

    rng = np.random.default_rng(3)
    O, P, FF = 700, 40, 4
    A = rng.normal(size=(O, 18)).astype(np.float32)
    Vp = rng.normal(size=(O, 12)).astype(np.float32)
    pts = rng.integers(0, P, O).astype(np.int32)
    slots = rng.integers(0, FF, O).astype(np.int32)
    out = np.asarray(
        point_reduce_pallas(
            jnp.asarray(A), jnp.asarray(Vp), jnp.asarray(pts), jnp.asarray(slots),
            P, FF, interpret=True,
        )
    )
    A16 = A.astype(np.float32)  # summands are bf16 in-kernel; tolerance below
    ref = np.zeros((P, FF * 18 + 12), np.float32)
    for o in range(O):
        ref[pts[o], slots[o] * 18 : slots[o] * 18 + 18] += A16[o]
        ref[pts[o], FF * 18 :] += Vp[o]
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=5e-3)


def test_auto_assembly_large_problem_fallback():
    """"auto" must not materialize an (O, P) one-hot beyond ~128M
    elements (a long-sequence global BA would be a multi-GB indicator);
    it falls back to the sorted-window assembly, which is O(P + O)."""
    from ur_mvo_tpu.ops.ba import BAConfig, resolve_assembly

    cfg = BAConfig()
    assert resolve_assembly(cfg, n_obs=8192, n_points=2048) == "matmul"
    assert resolve_assembly(cfg, n_obs=500_000, n_points=65_536) == "sorted"
    assert resolve_assembly(cfg._replace(assembly="matmul"), n_obs=500_000, n_points=65_536) == "matmul"
