"""Weights-free patch descriptor source: sampling correctness and the
full from-scratch pipeline (scratch detector + patch descriptors)."""

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.gridsample import patch_descriptors


def test_patch_descriptors_shape_and_normalization():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((120, 160)).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(20, 100, (32, 2)).astype(np.float32))
    d = patch_descriptors(img, kpts)
    assert d.shape == (32, 256)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.mean(d, axis=1)), 0.0, atol=1e-5)


def test_patch_descriptors_match_under_translation():
    """The same texture shifted by a few pixels: descriptors at shifted
    keypoints must be near-identical; at unrelated points, dissimilar."""
    rng = np.random.default_rng(1)
    base = rng.random((160, 200)).astype(np.float32)
    dx, dy = 7, 4
    img0 = jnp.asarray(base)
    img1 = jnp.asarray(np.roll(np.roll(base, dy, axis=0), dx, axis=1))
    kpts0 = jnp.asarray(rng.uniform(30, 120, (24, 2)).astype(np.float32))
    kpts1 = kpts0 + jnp.array([dx, dy], jnp.float32)
    d0 = patch_descriptors(img0, kpts0)
    d1 = patch_descriptors(img1, kpts1)
    sims = np.asarray(jnp.sum(d0 * d1, axis=1))
    assert sims.min() > 0.99
    # unrelated keypoints: near-zero expected correlation
    d_far = patch_descriptors(img1, kpts0 + jnp.array([40.0, 55.0]))
    cross = np.asarray(jnp.sum(d0 * d_far, axis=1))
    assert np.abs(cross).max() < 0.6


def test_from_scratch_pipeline_initializes(tmp_path):
    """Scratch-pretrained detector + patch descriptors + NN matching must
    initialize and track the rendered plane (no external weights at all)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_neural_e2e import render_plane_sequence

    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.components import Frame, Image
    from ur_mvo_tpu.config import Configs, SensorSetup
    from ur_mvo_tpu.engine import UR_MVO
    from ur_mvo_tpu.utils.metrics import ate_rmse

    H, W, fx = 240, 320, 260.0
    n = 24
    images, T_wc = render_plane_sequence(n, H, W, fx)
    cam = make_pinhole(W, H, fx, fx, W / 2, H / 2)
    cfg = Configs()
    cfg.superpoint.capacity = 512
    cfg.superpoint.max_keypoints = 400
    cfg.superpoint.keypoint_threshold = 1e-4
    cfg.superpoint.weights_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights", "superpoint_scratch_v2.npz"
    )
    cfg.superpoint.descriptor_source = "patch"
    cfg.superglue.matcher = "nn"
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    cfg.initializer.min_matches = 50
    cfg.initializer.min_features_first = 100
    cfg.backend.window_opt_frames = 8
    cfg.backend.window_fixed_frames = 6
    cfg.backend.ba_max_points = 1024
    cfg.backend.ba_max_observations = 4096
    cfg.backend.ba_iterations_phase1 = 6
    cfg.backend.ba_iterations_phase2 = 3
    cfg.runtime.compute_dtype = "float32"
    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam)
    for i in range(n):
        vo.process(Frame(image=Image(images[i], i / 30.0)))
    assert vo.tracker.initialized, "from-scratch pipeline failed to initialize"
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kts) >= 4
    idx = np.clip((np.asarray(kts) * 30.0).round().astype(int), 0, n - 1)
    ate = ate_rmse(kpos, T_wc[idx, :3, 3], align=True, correct_scale=True)
    # measured ~0.16 m on this sequence; generous gate for robustness
    assert ate < 0.45, ate
