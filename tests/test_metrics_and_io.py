import numpy as np

from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.utils import ate_rmse, associate, read_tum, umeyama_alignment, write_tum


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    # ground-truth similarity
    theta = 0.8
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    s, t = 2.5, np.array([1.0, -2.0, 3.0])
    dst = (s * (R @ src.T)).T + t
    s2, R2, t2 = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s2, s, atol=1e-9)
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-9)


def test_ate_zero_after_alignment():
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(30, 3))
    est = (0.5 * gt) @ np.eye(3) + 7.0
    assert ate_rmse(est, gt, align=True, correct_scale=True) < 1e-9
    assert ate_rmse(gt + 0.1, gt, align=False) > 0.09


def test_tum_roundtrip(tmp_path):
    path = str(tmp_path / "traj.txt")
    ts = [0.0, 0.1, 0.2]
    pos = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], dtype=np.float64)
    quat = np.tile(np.array([1.0, 0, 0, 0]), (3, 1))
    write_tum(path, ts, pos, quat)
    ts2, pos2, quat2 = read_tum(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(pos2, pos, atol=1e-6)
    np.testing.assert_allclose(quat2, quat, atol=1e-6)


def test_associate():
    a = np.array([0.0, 1.0, 2.0])
    b = np.array([0.005, 0.9, 3.0])
    ia, ib = associate(a, b, max_diff=0.15)
    np.testing.assert_array_equal(ia, [0, 1])
    np.testing.assert_array_equal(ib, [0, 1])


def test_config_load_reference_yaml():
    cfg = Configs.from_yaml("/root/reference/configs/configs_aqua.yaml", SensorSetup.MONO)
    assert cfg.superpoint.max_keypoints == 1000
    assert cfg.superpoint.keypoint_threshold == 0.0005
    assert cfg.superglue.matching_threshold == 0.5
    assert cfg.keyframe.max_num_passed_frame == 10
    assert cfg.tracking_optimization.mono_point == 10.0
    assert cfg.backend_optimization.stereo_point == 75.0
    assert cfg.camera_config_path.endswith("camera_settings/aqua.yaml")
    cfg.validate()


def test_config_overrides():
    cfg = Configs()
    cfg.apply_overrides({"superpoint.max_keypoints": 500, "keyframe.max_angle": 0.3})
    assert cfg.superpoint.max_keypoints == 500
    assert cfg.keyframe.max_angle == 0.3
    try:
        cfg.apply_overrides({"superpoint.nonexistent": 1})
        raise AssertionError("should have raised")
    except KeyError:
        pass
