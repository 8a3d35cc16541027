"""Multi-sequence concurrent VO: batched programs match per-item results;
S oracle sequences all converge."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.synthetic import make_camera, make_landmarks, make_trajectory
from tests.test_e2e_synthetic import small_config
from ur_mvo_tpu.parallel.multi_seq import MultiSequenceVO
from ur_mvo_tpu.runtime.extractor import OracleExtractor
from ur_mvo_tpu.utils.metrics import ate_rmse


def test_batched_extract_matches_single():
    cfg = small_config()
    cfg.superpoint.capacity = 256
    cfg.superpoint.max_keypoints = 200
    cfg.superglue.num_layers = 1
    cam = make_camera(160, 128)
    msvo = MultiSequenceVO(cfg, cam, num_sequences=2)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 160))
    banks = msvo._extract_batched(imgs)
    # single-image path through the view facade
    view = msvo.trackers[0].extractor
    b0 = view.extract(np.asarray(imgs[0]))
    np.testing.assert_allclose(np.asarray(banks.kpts[0]), np.asarray(b0.kpts), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(banks.valid[0]), np.asarray(b0.valid))


def test_multi_sequence_oracle_convergence():
    cfg = small_config()
    cam = make_camera()
    S, n_frames = 3, 35
    T_wc, ts = make_trajectory(n_frames, advance=0.05)
    # different landmark clouds + trajectory offsets per sequence
    extractors = []
    gts = []
    for s in range(S):
        X = make_landmarks(400, along=2.0, seed=10 + s)
        extractors.append(OracleExtractor(X, cam, capacity=cfg.superpoint.capacity, noise_px=0.2, seed=20 + s))
        off = np.eye(4)
        off[:3, 3] = [0, 0, 0.1 * s]
        gts.append(np.einsum("ij,njk->nik", off, T_wc))
    msvo = MultiSequenceVO(cfg, cam, num_sequences=S, extractors=extractors)
    for i in range(n_frames):
        msvo.process_batch_with_oracle([g[i] for g in gts], [ts[i]] * S)
    for s, (kts, kR, kt) in enumerate(msvo.trajectories()):
        assert len(kts) >= 4, f"seq {s} produced {len(kts)} keyframes"
        idx = np.searchsorted(ts, kts)
        gt_pos = gts[s][np.clip(idx, 0, n_frames - 1), :3, 3]
        ate = ate_rmse(kt, gt_pos, align=True, correct_scale=True)
        assert ate < 0.08, (s, ate)


def test_process_batch_runs_neural():
    """Mechanics: the lock-step neural path runs without error and keeps
    per-sequence state independent (random weights won't initialize)."""
    cfg = small_config()
    cfg.superpoint.capacity = 256
    cfg.superpoint.max_keypoints = 200
    cfg.superglue.num_layers = 1
    cam = make_camera(160, 128)
    msvo = MultiSequenceVO(cfg, cam, num_sequences=2)
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 128, 160)).astype(np.float32)
    for i in range(3):
        out = msvo.process_batch(imgs, [i * 0.033] * 2)
        assert len(out) == 2
    assert not msvo.trackers[0].initialized
