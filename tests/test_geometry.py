import jax
import jax.numpy as jnp
import numpy as np

import ur_mvo_tpu.ops.lie as lie
from ur_mvo_tpu.ops.epipolar import (
    check_rt,
    decompose_essential,
    decompose_homography,
    two_view_init,
)
from ur_mvo_tpu.ops.pnp import dlt_pnp, ransac_pnp
from ur_mvo_tpu.ops.pose_opt import PoseObs, optimize_pose
from ur_mvo_tpu.ops.triangulation import triangulate_bearings, triangulate_dlt


FX = FY = 400.0
CX, CY = 320.0, 256.0
K = jnp.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])


def make_scene(key, n=200, depth=(4.0, 8.0), rot=(0.02, -0.1, 0.03), trans=(0.5, 0.05, 0.02)):
    """World points + two cameras. Camera1 at origin; x2 = R21 x1 + t21."""
    X = jax.random.uniform(
        key, (n, 3), minval=jnp.array([-2.0, -2.0, depth[0]]), maxval=jnp.array([2.0, 2.0, depth[1]])
    )
    R21 = lie.so3_exp(jnp.array(rot))
    t21 = jnp.array(trans)
    X2 = X @ R21.T + t21

    def proj(P):
        return jnp.stack([FX * P[:, 0] / P[:, 2] + CX, FY * P[:, 1] / P[:, 2] + CY], -1)

    return X, proj(X), proj(X2), R21, t21


def test_triangulate_dlt_exact():
    key = jax.random.PRNGKey(0)
    X, p1, p2, R21, t21 = make_scene(key, n=50)
    P1 = jnp.concatenate([K, jnp.zeros((3, 1))], 1)
    P2 = K @ jnp.concatenate([R21, t21[:, None]], 1)
    Xt = triangulate_dlt(P1, P2, p1, p2)
    np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=1e-2)


def test_triangulate_bearings_exact():
    key = jax.random.PRNGKey(1)
    X_true = jnp.array([0.5, -0.3, 6.0])
    # 4 cameras observing the point
    origins = jax.random.normal(key, (4, 3)) * 0.5
    bearings = X_true - origins
    valid = jnp.ones((4,), bool)
    X, ok = triangulate_bearings(origins, bearings, valid)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_true), atol=1e-4)


def test_triangulate_bearings_degenerate():
    # parallel rays -> rank deficient -> ok=False
    origins = jnp.zeros((3, 3)).at[:, 0].set(jnp.arange(3.0) * 0.0)
    bearings = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    X, ok = triangulate_bearings(origins, bearings, jnp.ones((3,), bool))
    assert not bool(ok)
    # fewer than 2 valid rays -> ok=False
    X2, ok2 = triangulate_bearings(origins, bearings, jnp.array([True, False, False]))
    assert not bool(ok2)


def test_decompose_essential_recovers_motion():
    key = jax.random.PRNGKey(2)
    X, p1, p2, R21, t21 = make_scene(key, n=100)
    t_unit = t21 / jnp.linalg.norm(t21)
    E = lie.hat(t_unit) @ R21
    Rs, ts = decompose_essential(E)
    # one hypothesis should match (R21, +-t_unit)
    errs_R = [float(jnp.abs(Rs[i] - R21).max()) for i in range(4)]
    errs_t = [float(jnp.abs(ts[i] - t_unit).max()) for i in range(4)]
    assert min(errs_R) < 1e-4
    assert min(errs_t) < 1e-4


def test_check_rt_selects_true_motion():
    key = jax.random.PRNGKey(3)
    X, p1, p2, R21, t21 = make_scene(key, n=150)
    t_unit = t21 / jnp.linalg.norm(t21)
    E = lie.hat(t_unit) @ R21
    Rs, ts = decompose_essential(E)
    valid = jnp.ones((150,), bool)
    goods = [int(check_rt(Rs[i], ts[i], p1, p2, valid, K)[0]) for i in range(4)]
    best = int(np.argmax(goods))
    assert goods[best] > 140
    assert sorted(goods)[-2] < 0.3 * goods[best]
    np.testing.assert_allclose(np.asarray(Rs[best]), np.asarray(R21), atol=1e-4)


def test_two_view_init_general_scene():
    key = jax.random.PRNGKey(4)
    X, p1, p2, R21, t21 = make_scene(key, n=256)
    p1 = p1 + 0.3 * jax.random.normal(jax.random.PRNGKey(5), p1.shape)
    p2 = p2 + 0.3 * jax.random.normal(jax.random.PRNGKey(6), p2.shape)
    valid = jnp.ones((256,), bool)
    res = two_view_init(jax.random.PRNGKey(7), p1, p2, valid, K)
    assert bool(res.success)
    assert not bool(res.used_homography)
    # direction of translation recovered (scale is free)
    t_est = np.asarray(res.t21)
    t_true = np.asarray(t21 / jnp.linalg.norm(t21))
    assert abs(float(np.dot(t_est, t_true))) > 0.99
    # unrefined 8-point estimate under 0.3 px noise: ~1e-2 accuracy
    np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R21), atol=2e-2)
    assert int(jnp.sum(res.triangulated)) > 150


def test_two_view_init_planar_scene_uses_homography():
    key = jax.random.PRNGKey(8)
    # points on a plane z = 5 + 0.1x
    xy = jax.random.uniform(key, (256, 2), minval=-2.0, maxval=2.0)
    X = jnp.concatenate([xy, 5.0 + 0.1 * xy[:, :1]], axis=1)
    R21 = lie.so3_exp(jnp.array([0.03, -0.12, 0.02]))
    t21 = jnp.array([0.6, 0.1, 0.05])
    X2 = X @ R21.T + t21

    def proj(P):
        return jnp.stack([FX * P[:, 0] / P[:, 2] + CX, FY * P[:, 1] / P[:, 2] + CY], -1)

    p1, p2 = proj(X), proj(X2)
    # On a plane any F fits the coplanar points, so the F model's score
    # ties/wins but its motion decomposition fails acceptance; the
    # initializer must fall back to the homography path.
    p1 = p1 + 0.3 * jax.random.normal(jax.random.PRNGKey(20), p1.shape)
    p2 = p2 + 0.3 * jax.random.normal(jax.random.PRNGKey(21), p2.shape)
    res = two_view_init(jax.random.PRNGKey(9), p1, p2, jnp.ones((256,), bool), K)
    assert bool(res.used_homography)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R21), atol=3e-2)


def test_two_view_init_no_parallax_fails():
    key = jax.random.PRNGKey(10)
    X, p1, _, _, _ = make_scene(key, n=256)
    # identical views: no parallax -> must refuse to initialize
    res = two_view_init(jax.random.PRNGKey(11), p1, p1, jnp.ones((256,), bool), K)
    assert not bool(res.success)


def test_dlt_pnp_exact():
    key = jax.random.PRNGKey(12)
    X, p1, p2, R21, t21 = make_scene(key, n=6)
    rays = (jnp.linalg.inv(K) @ jnp.concatenate([p2, jnp.ones((6, 1))], 1).T).T[:, :2]
    R, t = dlt_pnp(X, rays)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R21), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t21), atol=1e-3)


def test_ransac_pnp_with_outliers():
    key = jax.random.PRNGKey(13)
    X, p1, p2, R21, t21 = make_scene(key, n=200)
    p2_noisy = p2 + 0.5 * jax.random.normal(jax.random.PRNGKey(14), p2.shape)
    p2_noisy = p2_noisy.at[:40].add(80.0)  # 40 gross outliers
    res = ransac_pnp(jax.random.PRNGKey(15), X, p2_noisy, jnp.ones((200,), bool), K, iterations=100)
    assert int(res.n_inliers) > 140
    inl = np.asarray(res.inliers)
    assert inl[:40].mean() < 0.2
    np.testing.assert_allclose(np.asarray(res.R_cw), np.asarray(R21), atol=2e-2)


def test_optimize_pose_converges_and_gates():
    key = jax.random.PRNGKey(16)
    X, p1, p2, R_true, t_true = make_scene(key, n=150)
    uv = jnp.concatenate([p2, -jnp.ones((150, 1))], axis=1)  # mono rows
    uv = uv.at[:, :2].add(0.5 * jax.random.normal(jax.random.PRNGKey(17), (150, 2)))
    uv = uv.at[:15, :2].add(60.0)  # 15 outliers
    obs = PoseObs(X=X, uv=uv, valid=jnp.ones((150,), bool))
    # perturbed initial pose
    dR, dt = lie.se3_exp(jnp.array([0.02, -0.01, 0.015, 0.1, -0.05, 0.08]))
    R0 = dR @ R_true
    t0 = dR @ t_true + dt
    res = optimize_pose(R0, t0, obs, FX, FY, CX, CY)
    assert int(res.n_inliers) > 120
    inl = np.asarray(res.inliers)
    assert inl[:15].mean() < 0.2
    np.testing.assert_allclose(np.asarray(res.R_cw), np.asarray(R_true), atol=3e-3)
    np.testing.assert_allclose(np.asarray(res.t_cw), np.asarray(t_true), atol=2e-2)


def test_optimize_pose_stereo_rows():
    key = jax.random.PRNGKey(18)
    bf = 48.0
    X, p1, p2, R_true, t_true = make_scene(key, n=100)
    pc = X @ R_true.T + t_true
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    ur = u - bf / pc[:, 2]
    uv = jnp.stack([u, v, ur], axis=1)
    obs = PoseObs(X=X, uv=uv, valid=jnp.ones((100,), bool))
    dR, dt = lie.se3_exp(jnp.array([0.01, 0.02, -0.01, 0.05, 0.03, -0.04]))
    res = optimize_pose(dR @ R_true, dR @ t_true + dt, obs, FX, FY, CX, CY, bf=bf)
    assert int(res.n_inliers) == 100
    np.testing.assert_allclose(np.asarray(res.R_cw), np.asarray(R_true), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.t_cw), np.asarray(t_true), atol=1e-3)


def test_decompose_homography_planar():
    # H for a plane with normal n, depth d: H = K (R + t n^T / d) K^-1
    R21 = lie.so3_exp(jnp.array([0.05, -0.1, 0.03]))
    t21 = jnp.array([0.4, 0.1, 0.05])
    n = jnp.array([0.05, 0.0, -1.0])
    n = n / jnp.linalg.norm(n)
    d = 5.0
    A = R21 + jnp.outer(t21, n) / d
    H = K @ A @ jnp.linalg.inv(K)
    Rs, ts, feasible = decompose_homography(H, K)
    assert bool(feasible[0])
    errs = [float(jnp.abs(Rs[i] - R21).max()) for i in range(8)]
    assert min(errs) < 1e-3
    i = int(np.argmin(errs))
    t_dir = ts[i] / jnp.linalg.norm(ts[i])
    t_true_dir = t21 / jnp.linalg.norm(t21)
    assert abs(float(jnp.dot(t_dir, t_true_dir))) > 0.999
