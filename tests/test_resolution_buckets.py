"""Resolution bucketing (``superpoint.resolution_buckets``).

The reference's TRT engines accept any H x W from 100^2 to 1500^2 in one
engine (``super_point.cpp:55-61,115-118``); XLA compiles per exact shape.
The TPU-native equivalent: inputs are edge-padded (bottom/right) to a
small ladder of bucket shapes, the pad region is masked out of keypoint
selection, and each bucket compiles ONCE — one engine instance then
serves any input size that fits a bucket without retrace-per-shape.
Inputs are treated as top-left crops of the calibrated sensor, so
intrinsics and rectify maps stay exact over the cropped region.
"""

import numpy as np
import pytest

from ur_mvo_tpu.camera import make_pinhole
from ur_mvo_tpu.components import Frame, Image
from ur_mvo_tpu.config import Configs, SensorSetup
from ur_mvo_tpu.runtime.extractor import NeuralExtractor
from ur_mvo_tpu.utils.synthscene import render_sequence

H, W, FX = 240, 320, 260.0
V3 = "weights/superpoint_scratch_v3.npz"


def _cfg(buckets=None, cap=512):
    cfg = Configs()
    cfg.superpoint.capacity = cap
    cfg.superpoint.max_keypoints = 400
    cfg.superpoint.keypoint_threshold = 1e-4
    cfg.superpoint.weights_path = V3
    cfg.superpoint.resolution_buckets = buckets
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    return cfg


@pytest.fixture(scope="module")
def scene():
    images, T_wc, _ = render_sequence(16, H, W, FX, seed=4, n_planes=3)
    return images, T_wc


def test_bucketed_extraction_matches_native(scene):
    """A 240x320 input padded into a (288, 384) bucket must produce the
    same interior keypoints as a native 240x320 compile: padding only
    perturbs convolutions within a receptive field of the pad seam, and
    the mask removes the pad region plus the true-edge border margin."""
    images, _ = scene
    cam = make_pinhole(W, H, FX, FX, W / 2, H / 2)
    ext_native = NeuralExtractor(_cfg(), cam)
    ext_bucket = NeuralExtractor(_cfg(buckets=[(288, 384)]), cam)
    b0 = ext_native.extract(images[0])
    b1 = ext_bucket.extract(images[0])
    v0 = np.asarray(b0.valid)
    k0 = np.asarray(b0.kpts)[v0]
    k1 = np.asarray(b1.kpts)[np.asarray(b1.valid)]
    # all bucketed keypoints live inside the true image (border-trimmed)
    assert (k1[:, 0] <= W - 4).all() and (k1[:, 1] <= H - 4).all()
    assert len(k1) > 100
    # interior sets agree: native keypoints outside the pad seam's
    # effective receptive field appear in the bucketed set at the same
    # pixel. The margin is measured, not guessed: the encoder + heads
    # see ~5 stacked 3x3 convs across 3 pooling levels, and every
    # keypoint that differs between the two compiles sits within 42 px
    # of the seam (the native compile zero-pads at the true edge, the
    # bucket continues with replicated content — a boundary-condition
    # difference inherent to cropping, not a defect of the padding).
    interior = (k0[:, 0] < W - 48) & (k0[:, 1] < H - 48)
    assert interior.sum() > 150
    d = np.abs(k0[interior][:, None, :] - k1[None, :, :]).sum(-1).min(1)
    assert (d < 0.5).mean() > 0.99, (d < 0.5).mean()


def test_one_program_serves_two_resolutions(scene):
    """Two input sizes that map to the same bucket share ONE compiled
    program (the verdict's no-retrace-per-shape requirement)."""
    images, _ = scene
    cam = make_pinhole(W, H, FX, FX, W / 2, H / 2)
    ext = NeuralExtractor(_cfg(buckets=[(H, W)]), cam)
    b_full = ext.extract(images[0])
    b_crop = ext.extract(images[1][: H - 16, : W - 16])
    assert len(ext._bucket_progs) == 1
    prog = next(iter(ext._bucket_progs.values()))
    assert prog._cache_size() == 1  # one trace covers both input sizes
    kc = np.asarray(b_crop.kpts)[np.asarray(b_crop.valid)]
    assert (kc[:, 0] <= W - 20).all() and (kc[:, 1] <= H - 20).all()
    assert np.asarray(b_full.valid).sum() > 100 and len(kc) > 100


def test_vo_trajectory_through_mixed_resolutions(scene):
    """One engine, frames arriving at two sizes (full sensor and a
    bottom/right crop): the bucketed pipeline initializes and produces a
    sane trajectory — a non-bucket input size is handled through
    padding, not a recompile or a crash."""
    from ur_mvo_tpu.engine import UR_MVO
    from ur_mvo_tpu.utils.metrics import ate_rmse

    images, T_wc = scene
    n = len(images)
    cam = make_pinhole(W, H, FX, FX, W / 2, H / 2)
    cfg = _cfg(buckets=[(H, W)])
    cfg.initializer.min_matches = 40
    cfg.initializer.min_features_first = 80
    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam)
    for i in range(n):
        img = images[i] if i % 3 else images[i][: H - 24, : W - 32]
        vo.process(Frame(image=Image(img, i / 30.0)))
    assert vo.tracker.initialized
    kts, kpos, _ = vo.keyframe_trajectory()
    assert len(kpos) >= 2
    idx = np.clip((np.asarray(kts) * 30.0).round().astype(int), 0, n - 1)
    ate = ate_rmse(kpos, T_wc[idx][:, :3, 3], align=True, correct_scale=True)
    assert np.isfinite(ate) and ate < 0.6, ate
