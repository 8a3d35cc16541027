"""Unit tests for the fused frame step (frontend._fused_track): the
single device program that replaced the match/track two-program flow
(round 3). End-to-end equivalence with the legacy path is pinned by the
CLI A/B (identical trajectories); these tests pin the branches the
system tests rarely hit — the packed-output layout and the jump-guard
rescue (a ``lax.cond``) that hard-fails a teleporting PnP prior.

Reference anchor: the stereo |dt| > 0.5 rejection in
``tracking.cc:800-818`` (see _track_frame's jump-guard rationale).
"""

import numpy as np
import pytest

from ur_mvo_tpu.camera import make_pinhole
from ur_mvo_tpu.config import Configs
from ur_mvo_tpu.ops.keypoints import FeatureBank
from ur_mvo_tpu.runtime.extractor import NeuralExtractor
from ur_mvo_tpu.runtime.frontend import Tracker

K = 64
W = H = 256
FX = 100.0


@pytest.fixture(scope="module")
def tracker():
    cfg = Configs()
    cfg.superpoint.capacity = K
    cfg.superglue.matcher = "nn"
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    cfg.backend.max_keyframes = 8
    cfg.backend.max_mappoints = 256
    cfg.backend.ba_max_points = 64
    cfg.backend.ba_max_observations = 128
    cam = make_pinhole(W, H, FX, FX, W / 2, H / 2)
    ext = NeuralExtractor(cfg, cam)
    return Tracker(cfg, cam, ext), ext, cam


def _scene(rng):
    X = np.stack(
        [rng.uniform(0.0, 5.0, K), rng.uniform(-1.0, 1.0, K), rng.uniform(6.0, 10.0, K)], 1
    ).astype(np.float32)
    desc = rng.normal(size=(K, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return X, desc


def _project(X, t_wc):
    Xc = X - np.asarray(t_wc, np.float32)[None]
    uv = np.stack(
        [FX * Xc[:, 0] / Xc[:, 2] + W / 2, FX * Xc[:, 1] / Xc[:, 2] + H / 2], 1
    ).astype(np.float32)
    return uv


def _bank(kpts, desc):
    import jax.numpy as jnp

    return FeatureBank(
        scores=jnp.ones(K), kpts=jnp.asarray(kpts), desc=jnp.asarray(desc),
        valid=jnp.ones(K, bool),
    )


def _snapshot(X):
    snap = np.zeros((K, 6), np.float32)
    snap[:, 0:3] = X
    snap[:, 3] = 2.0  # 2 = triangulated candidate; 1 = live id only
    snap[:, 4] = np.arange(K)
    snap[0:9, 5] = np.eye(3, dtype=np.float32).reshape(-1)  # last pose = I
    return snap


def _run(trk, ext, X, desc, t_cur):
    import jax
    import jax.numpy as jnp

    bank_ref = _bank(_project(X, [0, 0, 0]), desc)
    bank_cur = _bank(_project(X, t_cur), desc)
    key = jax.random.PRNGKey(0)
    _k, packed = trk._fused_kernel(ext.sg_params, key, bank_ref, bank_cur, jnp.asarray(_snapshot(X)))
    arr = np.asarray(packed)
    num_match, n_inl = int(arr[0]), int(arr[1])
    R_cw = arr[2:11].reshape(3, 3)
    t_cw = arr[11:14]
    frame_track = arr[14 : 14 + K].astype(np.int32)
    uvr = arr[14 + K : 14 + 4 * K].reshape(K, 3)
    t_wc = -R_cw.T @ t_cw
    return num_match, n_inl, R_cw, t_wc, frame_track, uvr


def test_fused_recovers_pose_and_tracks(tracker):
    trk, ext, cam = tracker
    rng = np.random.default_rng(0)
    X, desc = _scene(rng)
    t_true = np.array([0.1, 0.0, 0.0], np.float32)
    num_match, n_inl, R_cw, t_wc, frame_track, uvr = _run(trk, ext, X, desc, t_true)
    assert num_match > 40
    assert n_inl > 40
    np.testing.assert_allclose(R_cw, np.eye(3), atol=2e-3)
    np.testing.assert_allclose(t_wc, t_true, atol=2e-2)
    # identity data association: ref slot i -> current slot i -> track i
    inl = frame_track >= 0
    assert inl.sum() > 40
    assert (frame_track[inl] == np.nonzero(inl)[0]).all()
    # mono uvr rides back in the packed output
    np.testing.assert_allclose(uvr[:, :2], _project(X, t_true), atol=1e-4)
    assert (uvr[:, 2] < 0).all()


def test_fused_propagates_untriangulated_track_ids(tracker):
    """Matches to LIVE-but-untriangulated mappoints must carry their
    track ids into frame_track (snapshot flag 1) without contributing a
    3D constraint — this is how new mono points accumulate the >2
    observers required to triangulate (tracking.cc:723-728 writes track
    ids for every match; mapping.cc:107-110 triangulates at 3 observers).
    Dropping them starves the mono map of all post-init points."""
    import jax

    trk, ext, cam = tracker
    rng = np.random.default_rng(2)
    X, desc = _scene(rng)
    t_true = np.array([0.1, 0.0, 0.0], np.float32)
    snap = _snapshot(X)
    live_only = np.arange(K) % 3 == 0  # a third of the slots: id, no 3D
    snap[live_only, 3] = 1.0
    snap[live_only, 0:3] = 777.0  # garbage position: must never be used

    import jax.numpy as jnp

    bank_ref = _bank(_project(X, [0, 0, 0]), desc)
    bank_cur = _bank(_project(X, t_true), desc)
    _k, packed = trk._fused_kernel(
        ext.sg_params, jax.random.PRNGKey(0), bank_ref, bank_cur, jnp.asarray(snap)
    )
    arr = np.asarray(packed)
    n_inl = int(arr[1])
    frame_track = arr[14 : 14 + K].astype(np.int32)
    t_wc = -arr[2:11].reshape(3, 3).T @ arr[11:14]
    # pose solved from the triangulated two-thirds only, unpolluted
    np.testing.assert_allclose(t_wc, t_true, atol=2e-2)
    # live-only ids propagated; identity association => track == slot
    kept = frame_track >= 0
    assert kept[live_only].sum() > K // 6
    assert (frame_track[kept] == np.nonzero(kept)[0]).all()
    # and inlier count counts only 3D-constrained slots
    assert n_inl <= (~live_only).sum()


def test_fused_jump_guard_hard_fails_teleport(tracker):
    """A correspondence set that is perfectly consistent with a camera
    4x max_distance away must NOT be accepted: the PnP prior finds the
    far pose, the rescue re-refines from the last pose, lands far again,
    and the kernel reports 0 inliers (the host then keeps the last pose
    and declares tracking failure, _track_frame semantics)."""
    trk, ext, cam = tracker
    rng = np.random.default_rng(1)
    X, desc = _scene(rng)
    max_jump = 4.0 * trk.cfg.keyframe.max_distance
    t_far = np.array([max_jump + 3.0, 0.0, 0.0], np.float32)
    num_match, n_inl, _R, t_wc, frame_track, _uvr = _run(trk, ext, X, desc, t_far)
    assert num_match > 40  # matching is fine; geometry triggers the guard
    assert n_inl == 0, (n_inl, t_wc)
    assert (frame_track == -1).all()
