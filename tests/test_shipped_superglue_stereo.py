"""Gates for the shipped stereo-domain SuperGlue checkpoint
(``weights/superglue_v4stereo.npz`` — round-4 fine-tune of the mono
checkpoint on multires temporal pairs PLUS stereo left-right pairs, half
rendered through the rectification-resampling blur of a distorted right
lens; see scripts/train_superglue_v3.py ``data --stereo``).

What it is for (measured, round 4): on the distorted-right plane
benchmark the MONO checkpoint's CLI run emits only 4 poses over 24
frames (late init, lost tracking), while this checkpoint initializes
immediately and tracks (13-17 poses, ATE 0.018-0.023 scale-corrected).
Frame-0 LR matching is NOT the differential (both produce ~500 gated
stereo matches); the gain is temporal robustness on the
resampling-blurred right domain the LR training pairs cover. What it is NOT: the production default —
it regresses mono (plane-scene init failures on 2/3 seeds) and the
metric stereo/rgbd temporal ATE still trails the NN fallback
(ACCURACY.json), so auto-discovery keeps the mono checkpoint and the
NN default for metric setups; this one is an opt-in via --sg-weights.
"""

import os

import numpy as np
import pytest

from ur_mvo_tpu.camera import make_pinhole
from ur_mvo_tpu.components import Frame, Image
from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.engine import UR_MVO
from ur_mvo_tpu.utils.metrics import ate_rmse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SP_V3 = os.path.join(REPO, "weights", "superpoint_scratch_v3.npz")
SG_STEREO = os.path.join(REPO, "weights", "superglue_v4stereo.npz")

H, W, FX = 240, 320, 260.0
BASELINE = 0.1

needs_ckpt = pytest.mark.skipif(
    not (os.path.exists(SG_STEREO) and os.path.exists(SP_V3)),
    reason="shipped checkpoints not present",
)


@needs_ckpt
@pytest.mark.slow
def test_stereo_distorted_right_initializes_and_tracks():
    """The domain that motivated this checkpoint: plane scene, right
    camera rendered through a radtan-distorted lens and rectified by the
    separate RIGHT_K/D/R/P map (camera.cc:61-75,117-127 parity). Under
    the mono checkpoint the CLI run on this domain emitted 4 poses over
    24 frames; v4stereo initializes immediately and tracks."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_synthetic_dataset import render_plane_sequence

    n = 24
    images, T_wc, images_r = render_plane_sequence(
        n, H, W, FX, seed=0, baseline=BASELINE, d_right=(-0.28, 0.07, 0.0, 0.0))
    cam = make_pinhole(W, H, FX, FX, W / 2, H / 2, bf=FX * BASELINE)
    # the right images are DISTORTED captures: give the camera the
    # right-lens rectify map exactly as the generated calib block would
    # (camera.from_yaml builds it from RIGHT_K/D/R/P the same way)
    K_r = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    cam.undistort_map_right = cam._build_undistort_map(
        K_r, np.array([-0.28, 0.07, 0.0, 0.0]), np.eye(3), 0)
    cfg = Configs()
    cfg.superpoint.weights_path = SP_V3
    cfg.superpoint.capacity = 1024
    cfg.superpoint.max_keypoints = 1000
    cfg.superpoint.keypoint_threshold = 1e-4
    cfg.superglue.weights_path = SG_STEREO
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    vo = UR_MVO(cfg, SensorSetup.STEREO, camera=cam)
    for i in range(n):
        f = Frame(image=Image(images[i], i / 30.0))
        f.right_image = Image(images_r[i], i / 30.0)
        vo.process(f)
    assert vo.tracker.initialized, "stereo init failed under v4stereo"
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kpos) >= 3
    idx = np.clip((np.asarray(kts) * 30.0).round().astype(int), 0, n - 1)
    gt = T_wc[idx][:, :3, 3]
    # The capability gates are the init + tracking assertions above
    # (the mono checkpoint loses tracking on this domain — its CLI run
    # emits 4 poses; frame-0 LR matching is NOT the differential, both
    # checkpoints pass ~500 gated stereo matches there — the gain is
    # TEMPORAL robustness on the blurred right domain). The trajectory
    # gate is deliberately
    # loose: a CONSTANT-DEPTH plane is yaw/x-translation degenerate for
    # metric stereo VO (make_synthetic_dataset.py --scene notes), and
    # even scale-corrected the in-process keyframe ATE measures ~0.35
    # on this scene (the CLI's 0.018 rode on 3 GT associations). Real
    # accuracy gates live on the 3d scenes in ACCURACY.json.
    ate = ate_rmse(kpos, gt, align=True, correct_scale=True)
    assert np.isfinite(ate) and ate < 0.6, ate
