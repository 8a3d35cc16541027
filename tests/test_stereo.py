"""Stereo VO path: single-frame init, disparity-gated stereo matching,
metric scale recovery (no scale ambiguity)."""

import numpy as np

from tests.synthetic import make_landmarks, make_trajectory
from ur_mvo_tpu.camera import make_pinhole
from ur_mvo_tpu.components import Frame, Image
from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.engine import UR_MVO
from ur_mvo_tpu.runtime.extractor import OracleExtractor
from ur_mvo_tpu.utils.metrics import ate_rmse


def stereo_config():
    cfg = Configs()
    cfg.superpoint.capacity = 512
    cfg.superpoint.max_keypoints = 512
    cfg.backend.window_opt_frames = 8
    cfg.backend.window_fixed_frames = 6
    cfg.backend.ba_max_points = 512
    cfg.backend.ba_max_observations = 4096
    cfg.backend.ba_iterations_phase1 = 6
    cfg.backend.ba_iterations_phase2 = 3
    return cfg


def test_stereo_uvr_gating():
    cfg = stereo_config()
    cam = make_pinhole(640, 512, 400.0, 400.0, 320.0, 256.0, bf=48.0)
    cam.depth_lower_thr, cam.depth_upper_thr, cam.max_y_diff = 0.1, 10.0, 2.0
    X = make_landmarks(300, along=1.0)
    oracle = OracleExtractor(X, cam, capacity=512, noise_px=0.0, seed=0)
    vo = UR_MVO(cfg, SensorSetup.STEREO, camera=cam, extractor=oracle)
    T = np.eye(4)
    bank = oracle.extract_with_pose(T)
    bank_r = oracle.extract_with_pose(T, right=True)
    uvr = vo.tracker._stereo_uvr(bank, bank_r)
    both = np.asarray(bank.valid) & np.asarray(bank_r.valid)
    gated = both & (uvr[:, 2] > 0)
    assert gated.sum() > 200
    # disparity must equal bf/z of the true landmark depth (slots 0..n-1
    # hold landmarks in order)
    z = X[gated[: len(X)]][:, 2]
    disp = uvr[gated][:, 0] - uvr[gated][:, 2]
    np.testing.assert_allclose(disp, 48.0 / z, atol=1e-2)


def test_stereo_e2e_metric_scale():
    cfg = stereo_config()
    cam = make_pinhole(640, 512, 400.0, 400.0, 320.0, 256.0, bf=48.0)
    cam.depth_lower_thr, cam.depth_upper_thr, cam.max_y_diff = 0.1, 15.0, 2.0
    n = 40
    T_wc, ts = make_trajectory(n, advance=0.05)
    X = make_landmarks(500, along=2.5)
    oracle = OracleExtractor(X, cam, capacity=512, noise_px=0.2, seed=1)
    vo = UR_MVO(cfg, SensorSetup.STEREO, camera=cam, extractor=oracle)
    for i in range(n):
        f = Frame(image=Image(np.zeros((2, 2), np.uint8), ts[i]))
        f.meta["T_wc"] = T_wc[i]
        vo.process(f)
    assert vo.tracker.initialized
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kts) >= 3
    idx = np.searchsorted(ts, kts)
    gt = T_wc[np.clip(idx, 0, n - 1), :3, 3]
    # stereo: metric scale observable -> evaluate WITHOUT scale correction
    ate = ate_rmse(kpos, gt, align=True, correct_scale=False)
    assert ate < 0.05, ate
    travel_est = np.linalg.norm(kpos[-1] - kpos[0])
    travel_gt = np.linalg.norm(gt[-1] - gt[0])
    assert abs(travel_est / max(travel_gt, 1e-9) - 1.0) < 0.05
