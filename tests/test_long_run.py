"""Long-run stability: 200 frames at production-like settings — no
capacity blowups, bounded drift, timers populated."""

import numpy as np
import pytest

from tests.synthetic import make_camera, make_landmarks, make_trajectory
from ur_mvo_tpu.components import Frame, Image
from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.engine import UR_MVO
from ur_mvo_tpu.runtime.extractor import OracleExtractor
from ur_mvo_tpu.utils.metrics import ate_rmse


@pytest.mark.slow
def test_long_run_200_frames():
    cfg = Configs()
    cfg.superpoint.capacity = 512
    cfg.superpoint.max_keypoints = 512
    cfg.backend.ba_max_points = 1024
    cfg.backend.ba_max_observations = 4096
    cfg.backend.ba_iterations_phase1 = 5
    cfg.backend.ba_iterations_phase2 = 2
    cam = make_camera()
    n = 200
    T_wc, ts = make_trajectory(n, advance=0.04)
    X = make_landmarks(500, along=n * 0.04, seed=11)
    oracle = OracleExtractor(X, cam, capacity=512, noise_px=0.3, seed=12)
    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam, extractor=oracle)
    for i in range(n):
        f = Frame(image=Image(np.zeros((2, 2), np.uint8), ts[i]))
        f.meta["T_wc"] = T_wc[i]
        vo.process(f)
    assert vo.tracker.initialized
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kts) >= 15
    idx = np.searchsorted(ts, kts)
    gt = T_wc[np.clip(idx, 0, n - 1), :3, 3]
    ate = ate_rmse(kpos, gt, align=True, correct_scale=True)
    # 8m of travel with windowed-only optimization: sub-decimeter drift
    assert ate < 0.1, ate
    summary = vo.tracker.timer.summary()
    assert "match" in summary and summary["match"]["count"] > 100
    # map stayed inside capacity with sane stats
    st = vo.tracker.backend.store
    assert st._next_mp < st.cfg.max_mappoints // 2


@pytest.mark.slow
def test_unbounded_run_with_culling_and_slot_reuse():
    """Bounded store capacities must sustain arbitrarily long runs when
    culling is on: culled keyframe slots and zero-observation mappoint
    ids are recycled (without reuse this configuration exhausts its
    24-slot keyframe store ~40 frames in and raises)."""
    cfg = Configs()
    cfg.superpoint.capacity = 512
    cfg.superpoint.max_keypoints = 512
    cfg.backend.ba_max_points = 1024
    cfg.backend.ba_max_observations = 4096
    cfg.backend.ba_iterations_phase1 = 5
    cfg.backend.ba_iterations_phase2 = 2
    cfg.backend.window_opt_frames = 6
    cfg.backend.window_fixed_frames = 4
    cfg.backend.enable_culling = True
    cfg.backend.cull_max_keyframes = 12
    cfg.backend.cull_max_mappoints = 2000
    cfg.backend.max_keyframes = 24
    cfg.backend.max_mappoints = 4000
    cam = make_camera()
    n = 240
    T_wc, ts = make_trajectory(n, advance=0.04)
    X = make_landmarks(500, along=n * 0.04, seed=21)
    oracle = OracleExtractor(X, cam, capacity=512, noise_px=0.3, seed=22)
    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam, extractor=oracle)
    for i in range(n):
        f = Frame(image=Image(np.zeros((2, 2), np.uint8), ts[i]))
        f.meta["T_wc"] = T_wc[i]
        vo.process(f)
    assert vo.tracker.initialized
    st = vo.tracker.backend.store
    # capacities held: fresh allocation never passed the hard caps
    assert st._next_kf <= cfg.backend.max_keyframes
    assert st._next_mp <= cfg.backend.max_mappoints
    assert st.num_keyframes() <= cfg.backend.cull_max_keyframes + 1
    # the surviving (recent) window is still metrically consistent
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kts) >= 8
    assert float(kts[-1]) > ts[n - 10]  # tracked to the end
    idx = np.searchsorted(ts, kts)
    gt = T_wc[np.clip(idx, 0, n - 1), :3, 3]
    ate = ate_rmse(kpos, gt, align=True, correct_scale=True)
    assert ate < 0.3, ate
