"""True image->trajectory run through the NEURAL path (no oracle).

Renders views of a textured plane (exact homographies), extracts
features with a random-init SuperPoint (a random conv net is a
repeatable corner detector + random-projection descriptor), matches with
the mutual-NN matcher, and runs the full VO runtime. Validates the whole
image pipeline — undistort-free extraction, matching, H-path two-view
init, PnP tracking, BA — without any trained checkpoint.
"""

import numpy as np
import pytest

import ur_mvo_tpu.ops.lie as lie
from ur_mvo_tpu.camera import make_pinhole
from ur_mvo_tpu.components import Frame, Image
from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.engine import UR_MVO
from ur_mvo_tpu.utils.metrics import ate_rmse


def render_plane_sequence(n_frames, H=240, W=320, fx=260.0, seed=0):
    """Camera looking at the textured plane z=Z0 (world), translating and
    yawing gently. Returns (images u8 (N,H,W), T_wc (N,4,4))."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # rich band-limited texture, upsampled for smooth interpolation
    tex_coarse = rng.random((200, 260))
    texture = np.kron(tex_coarse, np.ones((4, 4)))  # 800x1040
    texture = (texture * 255).astype(np.float32)
    TH, TW = texture.shape
    Z0 = 4.0
    scale_px = 90.0  # texture pixels per world meter

    cx, cy = W / 2.0, H / 2.0
    images = np.zeros((n_frames, H, W), np.uint8)
    poses = np.zeros((n_frames, 4, 4))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    for i in range(n_frames):
        yaw = 0.03 * np.sin(0.3 * i)
        R = np.asarray(lie.so3_exp(jnp.array([0.0, yaw, 0.015 * np.sin(0.2 * i)])))
        t = np.array([0.08 * i, 0.04 * np.sin(0.3 * i), 0.02 * np.sin(0.17 * i)])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = t
        poses[i, 3, 3] = 1.0
        # back-project pixel rays to the plane z=Z0 (world), sample texture
        rays = np.stack([(xx - cx) / fx, (yy - cy) / fx, np.ones_like(xx)], -1)
        rays_w = rays @ R.T
        lam = (Z0 - t[2]) / rays_w[..., 2]
        pw = t + rays_w * lam[..., None]
        u = pw[..., 0] * scale_px + TW / 2
        v = pw[..., 1] * scale_px + TH / 2
        u0 = np.clip(np.floor(u).astype(int), 0, TW - 2)
        v0 = np.clip(np.floor(v).astype(int), 0, TH - 2)
        du = np.clip(u - u0, 0, 1)
        dv = np.clip(v - v0, 0, 1)
        img = (
            texture[v0, u0] * (1 - du) * (1 - dv)
            + texture[v0, u0 + 1] * du * (1 - dv)
            + texture[v0 + 1, u0] * (1 - du) * dv
            + texture[v0 + 1, u0 + 1] * du * dv
        )
        images[i] = np.clip(img, 0, 255).astype(np.uint8)
    return images, poses


@pytest.mark.slow
def test_neural_3d_scene_trajectory():
    """Harder neural benchmark: a genuinely 3D rendered scene — three
    textured planes at different depths (occlusion, depth discontinuity)
    plus 2%/frame brightness decay — through the SHIPPED v3 checkpoint.
    Unlike the single-plane render below (homography-degenerate, ideal
    photometry), this exercises F-model init geometry, parallax-dependent
    matching, and photometric drift (the reference's underwater regime)."""
    import os

    from ur_mvo_tpu.utils.synthscene import render_sequence

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "weights", "superpoint_scratch_v3.npz")
    if not os.path.exists(path):
        pytest.skip("v3 checkpoint not present")
    H, W, fx = 240, 320, 260.0
    n = 24
    images, T_wc, _ = render_sequence(n, H, W, fx, seed=5, n_planes=3, brightness_decay=0.02)
    cam = make_pinhole(W, H, fx, fx, W / 2, H / 2)
    cfg = Configs()
    cfg.superpoint.capacity = 512
    cfg.superpoint.max_keypoints = 400
    cfg.superpoint.keypoint_threshold = 1e-4
    cfg.superpoint.weights_path = path
    cfg.superglue.matcher = "nn"
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    cfg.initializer.min_matches = 60
    cfg.initializer.min_features_first = 100
    cfg.backend.window_opt_frames = 8
    cfg.backend.window_fixed_frames = 6
    cfg.backend.ba_max_points = 1024
    cfg.backend.ba_max_observations = 4096
    cfg.backend.ba_iterations_phase1 = 6
    cfg.backend.ba_iterations_phase2 = 3
    cfg.runtime.compute_dtype = "float32"
    # Single 24-frame runs on this scene swing ~0.36-0.6 with nothing but
    # the PnP RNG stream (the repo's measurement doctrine: never judge
    # single runs) — gate the MEAN over three tracker seeds instead.
    # reset() keeps the compiled kernels, so the extra runs are cheap.
    import jax as _jax

    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam)
    ates = []
    for seed in (0, 1, 2):
        vo.reset()
        vo.tracker._rng = _jax.random.PRNGKey(seed + 7)
        for i in range(n):
            vo.process(Frame(image=Image(images[i], i / 30.0)))
        assert vo.tracker.initialized, "3D-scene neural pipeline failed to initialize"
        kts, kpos, _ = vo.keyframe_trajectory()
        assert len(kts) >= 4
        idx = np.clip((np.asarray(kts) * 30.0).round().astype(int), 0, n - 1)
        gt = T_wc[idx, :3, 3]
        ates.append(ate_rmse(kpos, gt, align=True, correct_scale=True))
    # measured post-track-id-fix: 0.593/0.361/0.374 (mean 0.443); a real
    # regression (lost tracking, bad init) lands >1 on every seed.
    assert float(np.mean(ates)) < 0.55, ates


@pytest.mark.slow
def test_neural_image_to_trajectory():
    H, W, fx = 240, 320, 260.0
    n = 24
    images, T_wc = render_plane_sequence(n, H, W, fx)
    cam = make_pinhole(W, H, fx, fx, W / 2, H / 2)

    cfg = Configs()
    cfg.superpoint.capacity = 512
    cfg.superpoint.max_keypoints = 400
    cfg.superpoint.keypoint_threshold = 1e-4  # random-net scores are flat
    cfg.superglue.matcher = "nn"
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    cfg.initializer.min_matches = 60
    cfg.initializer.min_features_first = 100
    cfg.backend.window_opt_frames = 8
    cfg.backend.window_fixed_frames = 6
    cfg.backend.ba_max_points = 1024
    cfg.backend.ba_max_observations = 4096
    cfg.backend.ba_iterations_phase1 = 6
    cfg.backend.ba_iterations_phase2 = 3
    cfg.runtime.compute_dtype = "float32"  # repeatability of random net

    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam)
    for i in range(n):
        vo.process(Frame(image=Image(images[i], i / 30.0)))
    assert vo.tracker.initialized, "neural pipeline failed to initialize"
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kts) >= 4
    idx = np.clip((np.asarray(kts) * 30.0).round().astype(int), 0, n - 1)
    gt = T_wc[idx, :3, 3]
    ate = ate_rmse(kpos, gt, align=True, correct_scale=True)
    # Random-weight features + NN matching drift fast; the gate here is
    # that the full image pipeline runs and produces a sane trajectory
    # (trained checkpoints are what accuracy rides on).
    assert ate < 0.6, ate
