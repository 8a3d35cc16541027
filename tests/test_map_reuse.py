"""Map persistence + localization mode (beyond the reference).

Session A maps a corridor and saves a snapshot; session B is a brand-new
engine that loads the map and starts in LOCALIZATION mode
(`UR_MVO.load_map_snapshot` -> `Tracker.adopt_map`): its first frames
view the EARLY corridor — disjoint from the newest stored keyframe — so
continuing requires relocalizing into the loaded map. All poses of both
sessions must live in ONE world frame.
"""

import numpy as np

from tests.synthetic import make_camera, make_trajectory
from tests.test_relocalization import corridor_landmarks
from ur_mvo_tpu.components import Frame, Image
from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.engine import UR_MVO
from ur_mvo_tpu.runtime.extractor import OracleExtractor
from ur_mvo_tpu.utils.metrics import ate_rmse


def _config():
    cfg = Configs()
    cfg.superpoint.capacity = 1024
    cfg.superpoint.max_keypoints = 1024
    cfg.backend.window_opt_frames = 8
    cfg.backend.window_fixed_frames = 6
    cfg.backend.ba_max_points = 2048
    cfg.backend.ba_max_observations = 8192
    return cfg


def test_localization_mode_into_saved_map(tmp_path):
    cam = make_camera()
    n_a = 20
    T_a, _ = make_trajectory(n_a, advance=0.3)
    X = corridor_landmarks(900, -4.0, 10.0)

    # --- session A: map the corridor, save the snapshot ----------------
    oracle = OracleExtractor(X, cam, capacity=1024, noise_px=0.2, seed=3)
    vo_a = UR_MVO(_config(), SensorSetup.MONO, camera=cam, extractor=oracle)
    for i in range(n_a):
        f = Frame(image=Image(np.zeros((cam.height, cam.width), np.uint8), i / 30.0))
        f.meta["T_wc"] = T_a[i]
        vo_a.process(f)
    assert vo_a.tracker.initialized
    path = str(tmp_path / "map.npz")
    vo_a.save_map_snapshot(path)
    n_kf_a = vo_a.tracker.backend.store.num_keyframes()

    # --- session B: fresh engine, load map, start in the EARLY corridor
    oracle_b = OracleExtractor(X, cam, capacity=1024, noise_px=0.2, seed=9)
    vo_b = UR_MVO(_config(), SensorSetup.MONO, camera=cam, extractor=oracle_b)
    vo_b.load_map_snapshot(path)
    assert vo_b.tracker.initialized  # localization mode: no re-init needed
    seq_b = [((n_a + 2 + k) / 30.0, T_a[i]) for k, i in enumerate(range(3, 10))]
    for ts, T in seq_b:
        f = Frame(image=Image(np.zeros((cam.height, cam.width), np.uint8), ts))
        f.meta["T_wc"] = T
        vo_b.process(f)

    st = vo_b.tracker.backend.store
    assert st.num_keyframes() > n_kf_a, "session B never localized/keyframed"
    # both sessions' keyframes under ONE similarity alignment match GT:
    # session B localized in session A's world frame, not a fresh map
    kts, kpos, _ = vo_b.keyframe_trajectory()
    gt = {round(i / 30.0, 6): T_a[i][:3, 3] for i in range(n_a)}
    gt.update({round(ts, 6): T[:3, 3] for ts, T in seq_b})
    gt_pos = np.stack([gt[round(t, 6)] for t in kts])
    ate = ate_rmse(kpos, gt_pos, align=True, correct_scale=True)
    assert ate < 0.1, ate
    # the resumed keyframes connect into the loaded covisibility graph
    slots = st.keyframe_slots()
    order = slots[np.argsort(st.kf_frame_id[slots])]
    new = order[n_kf_a:]
    old = order[:n_kf_a]
    assert st.covis[new][:, old].max() >= 15


def test_resume_tracks_reconstructed_reference_bank(tmp_path):
    """Resume where session A left off: the first session-B frames view
    the SAME place as the newest stored keyframe, so tracking proceeds
    directly against the reference bank reconstructed from the store's
    descriptor banks — no relocalization needed (lost counter stays 0)."""
    cam = make_camera()
    n_a = 20
    T_all, _ = make_trajectory(n_a + 8, advance=0.3)
    X = corridor_landmarks(1000, -4.0, 14.0)

    oracle = OracleExtractor(X, cam, capacity=1024, noise_px=0.2, seed=3)
    vo_a = UR_MVO(_config(), SensorSetup.MONO, camera=cam, extractor=oracle)
    for i in range(n_a):
        f = Frame(image=Image(np.zeros((cam.height, cam.width), np.uint8), i / 30.0))
        f.meta["T_wc"] = T_all[i]
        vo_a.process(f)
    path = str(tmp_path / "map.npz")
    vo_a.save_map_snapshot(path)
    n_kf_a = vo_a.tracker.backend.store.num_keyframes()

    oracle_b = OracleExtractor(X, cam, capacity=1024, noise_px=0.2, seed=9)
    vo_b = UR_MVO(_config(), SensorSetup.MONO, camera=cam, extractor=oracle_b)
    vo_b.load_map_snapshot(path)
    seq_b = []
    for k, i in enumerate(range(n_a, n_a + 8)):
        ts = (n_a + k) / 30.0
        seq_b.append((ts, T_all[i]))
        f = Frame(image=Image(np.zeros((cam.height, cam.width), np.uint8), ts))
        f.meta["T_wc"] = T_all[i]
        vo_b.process(f)
    st = vo_b.tracker.backend.store
    assert st.num_keyframes() > n_kf_a
    assert vo_b.tracker._lost_count == 0  # pure resume, no loss/reloc
    kts, kpos, _ = vo_b.keyframe_trajectory()
    gt = {round(i / 30.0, 6): T_all[i][:3, 3] for i in range(n_a + 8)}
    gt_pos = np.stack([gt[round(t, 6)] for t in kts])
    ate = ate_rmse(kpos, gt_pos, align=True, correct_scale=True)
    assert ate < 0.1, ate
