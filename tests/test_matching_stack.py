import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.models import superglue
from ur_mvo_tpu.ops.keypoints import FeatureBank
from ur_mvo_tpu.ops.matching import decode_assignment, filter_matches
from ur_mvo_tpu.ops.ransac import (
    fit_fundamental_8pt,
    fit_homography_dlt,
    ransac_fundamental,
    ransac_homography,
    score_fundamental,
)
from ur_mvo_tpu.ops.sinkhorn import log_optimal_transport


def make_bank(key, n_valid, capacity=64, w=640, h=512):
    k1, k2, k3 = jax.random.split(key, 3)
    kpts = jax.random.uniform(k1, (capacity, 2)) * jnp.array([w - 1, h - 1])
    desc = jax.random.normal(k2, (capacity, 256))
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    scores = jax.random.uniform(k3, (capacity,))
    valid = jnp.arange(capacity) < n_valid
    return FeatureBank(
        scores=jnp.where(valid, scores, 0),
        kpts=jnp.where(valid[:, None], kpts, 0),
        desc=jnp.where(valid[:, None], desc, 0),
        valid=valid,
    )


def test_sinkhorn_doubly_stochastic():
    key = jax.random.PRNGKey(0)
    M = N = 16
    scores = jax.random.normal(key, (M, N))
    v0 = jnp.ones((M,), bool)
    v1 = jnp.ones((N,), bool)
    Z = log_optimal_transport(scores, v0, v1, jnp.asarray(1.0), iterations=100)
    P = np.exp(np.asarray(Z, np.float64)) / (M + N)
    # rows 0..M-1 sum (incl. dustbin) to 1/(M+N), row M to N/(M+N)
    np.testing.assert_allclose(P[:M].sum(axis=1), 1.0 / (M + N), rtol=1e-3)
    np.testing.assert_allclose(P[:, :N].sum(axis=0), 1.0 / (M + N), rtol=1e-3)
    np.testing.assert_allclose(P[M].sum(), N / (M + N), rtol=1e-3)


def test_sinkhorn_masked_matches_dense():
    """A padded problem must produce the same transport as its dense
    (unpadded) equivalent — masking invariance."""
    key = jax.random.PRNGKey(1)
    m, n, M, N = 10, 12, 16, 20
    scores_small = jax.random.normal(key, (m, n))
    Zs = log_optimal_transport(
        scores_small, jnp.ones((m,), bool), jnp.ones((n,), bool), jnp.asarray(0.7), 50
    )
    scores_big = jnp.full((M, N), 37.0).at[:m, :n].set(scores_small)
    v0 = jnp.arange(M) < m
    v1 = jnp.arange(N) < n
    Zb = log_optimal_transport(scores_big, v0, v1, jnp.asarray(0.7), 50)
    np.testing.assert_allclose(np.asarray(Zb[:m, :n]), np.asarray(Zs[:m, :n]), atol=1e-4)
    # dustbin entries for valid rows also agree
    np.testing.assert_allclose(np.asarray(Zb[:m, N]), np.asarray(Zs[:m, n]), atol=1e-4)


def test_decode_mutual_and_threshold():
    # construct an assignment where 0<->1 is strong and mutual, 2 is weak
    K = 8
    Z = jnp.full((K + 1, K + 1), -10.0)
    Z = Z.at[0, 1].set(0.0)     # p = 1.0 > thr
    Z = Z.at[2, 3].set(-3.0)    # p = 0.05 < thr
    v = jnp.arange(K) < 4
    m = decode_assignment(Z, v, v, threshold=0.5)
    idx = np.asarray(m.idx1)
    assert idx[0] == 1
    assert idx[2] == -1
    assert int(m.num_valid()) == 1


def test_superglue_permutation_equivariance():
    """The matcher must be permutation-equivariant over keypoint slots:
    permuting bank1's valid slots permutes the assignment columns
    identically. This validates attention/Sinkhorn mechanics without
    depending on trained weights."""
    params = superglue.init_params(jax.random.PRNGKey(0), num_layers=2)
    n, cap = 24, 32
    bank0 = make_bank(jax.random.PRNGKey(3), n_valid=n, capacity=cap)
    bank1 = make_bank(jax.random.PRNGKey(4), n_valid=n, capacity=cap)
    perm = np.concatenate([np.random.default_rng(0).permutation(n), np.arange(n, cap)])
    bank1p = FeatureBank(
        scores=bank1.scores[perm],
        kpts=bank1.kpts[perm],
        desc=bank1.desc[perm],
        valid=bank1.valid[perm],
    )
    Z = np.asarray(superglue.match_scores(params, bank0, bank1, 640, 512, 20))
    Zp = np.asarray(superglue.match_scores(params, bank0, bank1p, 640, 512, 20))
    # column j of Z appears at position inv_perm[j] in Zp
    inv = np.argsort(perm)
    np.testing.assert_allclose(Zp[:n, inv[:n]], Z[:n, :n], atol=5e-2, rtol=1e-4)


def test_superglue_masking_invariance():
    """Adding padded slots must not change scores for valid pairs."""
    params = superglue.init_params(jax.random.PRNGKey(0), num_layers=1)
    small = make_bank(jax.random.PRNGKey(5), n_valid=16, capacity=16)
    pad = 32

    def pad_bank(b):
        return FeatureBank(
            scores=jnp.pad(b.scores, (0, pad)),
            kpts=jnp.pad(b.kpts, ((0, pad), (0, 0))),
            desc=jnp.pad(b.desc, ((0, pad), (0, 0))),
            valid=jnp.pad(b.valid, (0, pad)),
        )

    Z_small = superglue.match_scores(params, small, small, 640, 512, 20)
    big = pad_bank(small)
    Z_big = superglue.match_scores(params, big, big, 640, 512, 20)
    np.testing.assert_allclose(np.asarray(Z_big[:16, :16]), np.asarray(Z_small[:16, :16]), atol=2e-3)


def _synthetic_two_view(key, n=100, noise=0.0, outliers=0):
    """Points on two views of a known E = [t]x R configuration."""
    import ur_mvo_tpu.ops.lie as lie

    kp, kn, ko = jax.random.split(key, 3)
    X = jax.random.uniform(kp, (n, 3), minval=jnp.array([-2, -2, 4.0]), maxval=jnp.array([2, 2, 8.0]))
    fx = fy = 400.0
    cx, cy = 320.0, 256.0
    R = lie.so3_exp(jnp.array([0.02, -0.1, 0.03]))
    t = jnp.array([0.5, 0.05, 0.02])
    X2 = X @ R.T + t

    def proj(P):
        return jnp.stack([fx * P[:, 0] / P[:, 2] + cx, fy * P[:, 1] / P[:, 2] + cy], -1)

    p1 = proj(X)
    p2 = proj(X2)
    if noise > 0:
        p1 += noise * jax.random.normal(kn, p1.shape)
        p2 += noise * jax.random.normal(kn, p2.shape)
    if outliers > 0:
        bad = jax.random.uniform(ko, (outliers, 2)) * jnp.array([640.0, 512.0])
        p2 = p2.at[:outliers].set(bad)
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    return p1, p2, K, R, t


def test_fundamental_8pt_exact():
    p1, p2, K, R, t = _synthetic_two_view(jax.random.PRNGKey(7), n=8)
    F = fit_fundamental_8pt(p1, p2)
    x1 = np.concatenate([np.asarray(p1), np.ones((8, 1))], 1)
    x2 = np.concatenate([np.asarray(p2), np.ones((8, 1))], 1)
    resid = np.abs(np.einsum("ni,ij,nj->n", x2, np.asarray(F), x1))
    assert resid.max() < 1e-2


def test_ransac_fundamental_rejects_outliers():
    p1, p2, K, R, t = _synthetic_two_view(jax.random.PRNGKey(8), n=120, noise=0.3, outliers=30)
    valid = jnp.ones((120,), bool)
    res = ransac_fundamental(jax.random.PRNGKey(0), p1, p2, valid, iterations=200, sigma=1.0)
    inl = np.asarray(res.inliers)
    # outliers occupy slots 0..29
    assert inl[:30].mean() < 0.2
    assert inl[30:].mean() > 0.8


def test_homography_dlt_exact():
    key = jax.random.PRNGKey(9)
    H_true = jnp.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -5e-5, 1.0]])
    p1 = jax.random.uniform(key, (8, 2)) * 300 + 100
    x1 = jnp.concatenate([p1, jnp.ones((8, 1))], 1)
    y = x1 @ H_true.T
    p2 = y[:, :2] / y[:, 2:3]
    H = fit_homography_dlt(p1, p2)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_true), atol=1e-3)


def test_ransac_homography_planar_scene():
    key = jax.random.PRNGKey(10)
    H_true = jnp.array([[0.9, 0.1, 20.0], [-0.05, 1.05, -10.0], [5e-5, 1e-4, 1.0]])
    p1 = jax.random.uniform(key, (100, 2)) * 400 + 50
    x1 = jnp.concatenate([p1, jnp.ones((100, 1))], 1)
    y = x1 @ H_true.T
    p2 = y[:, :2] / y[:, 2:3]
    p2 = p2.at[:20].add(50.0)  # 20 outliers
    res = ransac_homography(jax.random.PRNGKey(1), p1, p2, jnp.ones((100,), bool), 200)
    inl = np.asarray(res.inliers)
    assert inl[:20].mean() < 0.2 and inl[20:].mean() > 0.9


def test_score_fundamental_masked():
    p1, p2, K, R, t = _synthetic_two_view(jax.random.PRNGKey(11), n=50)
    F = fit_fundamental_8pt(p1[:8], p2[:8])
    valid = jnp.arange(50) < 25
    s_masked, inl = score_fundamental(F, p1, p2, valid)
    assert not bool(inl[30])  # masked slots can't be inliers
    s_full, _ = score_fundamental(F, p1, p2, jnp.ones((50,), bool))
    assert float(s_masked) < float(s_full)


def test_auto_matcher_resolution():
    """'auto' resolves to NN without SuperGlue weights and to SuperGlue
    with them; explicit choices are respected."""
    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.runtime.extractor import NeuralExtractor

    cam = make_pinhole(160, 128, 120.0, 120.0, 80.0, 64.0)
    cfg = Configs()
    cfg.superpoint.capacity = 128
    cfg.superglue.image_width, cfg.superglue.image_height = 160, 128
    assert cfg.superglue.matcher == "auto"
    ex = NeuralExtractor(cfg, cam)
    assert ex._matcher == "nn"

    cfg2 = Configs()
    cfg2.superpoint.capacity = 128
    cfg2.superglue.matcher = "superglue"
    ex2 = NeuralExtractor(cfg2, cam)
    assert ex2._matcher == "superglue"


def test_decode_ambiguity_margin():
    """The margin gate rejects matches whose row or column runner-up
    sits within ``margin`` nats of the best — the ratio-test analog for
    texture-aliased confident Sinkhorn assignments (round-4 metric-ATE
    failure mode)."""
    K = 8
    v = jnp.arange(K) < 6
    Z = jnp.full((K + 1, K + 1), -30.0)
    # slot 0: unambiguous strong match to 1 (runner-up 25 nats away)
    Z = Z.at[0, 1].set(0.0)
    # slot 2: confident best to 3 but a near-tied ROW runner-up at 4
    Z = Z.at[2, 3].set(0.0)
    Z = Z.at[2, 4].set(-0.2)
    # slot 4 -> 5 confident, but COLUMN 5 also wanted by slot 5 (near tie)
    Z = Z.at[4, 5].set(0.0)
    Z = Z.at[5, 5].set(-0.2)

    m0 = decode_assignment(Z, v, v, threshold=0.5, margin=0.0)
    assert bool(m0.valid[0]) and bool(m0.valid[2]) and bool(m0.valid[4])

    m1 = decode_assignment(Z, v, v, threshold=0.5, margin=0.5)
    assert bool(m1.valid[0])          # peaked both ways: kept
    assert not bool(m1.valid[2])      # row-ambiguous: rejected
    assert not bool(m1.valid[4])      # column-contested: rejected
    assert int(m1.num_valid()) == 1


def test_nn_fallback_min_matches():
    """When the SuperGlue decode leaves too few matches, the extractor's
    match program substitutes mutual-NN matches in the same dispatch
    (min-match floor — init/dropout rescue)."""
    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.runtime.extractor import NeuralExtractor

    cam = make_pinhole(160, 128, 120.0, 120.0, 80.0, 64.0)
    cfg = Configs()
    cfg.superpoint.capacity = 128
    cfg.superglue.image_width, cfg.superglue.image_height = 160, 128
    cfg.superglue.matcher = "superglue"  # random init -> garbage scores
    cfg.superglue.matching_threshold = 0.99  # decode leaves ~nothing
    cfg.superglue.nn_fallback_min_matches = 10
    cfg.superglue.nn_min_similarity = 0.9
    ex = NeuralExtractor(cfg, cam)

    key = jax.random.PRNGKey(3)
    b0 = make_bank(key, 40, capacity=128, w=160, h=128)
    # bank1 = same descriptors (cos=1 self-pairs) at shifted positions
    b1 = FeatureBank(
        scores=b0.scores,
        kpts=b0.kpts + 1.5,
        desc=b0.desc,
        valid=b0.valid,
    )
    m = ex.match(b0, b1, outlier_rejection=False)
    idx = np.asarray(m.idx1)
    valid = np.asarray(m.valid)
    # NN fallback fired: identity self-matches on the valid slots
    assert valid.sum() >= 30
    assert (idx[valid] == np.nonzero(valid)[0]).mean() > 0.9

    # floor disabled -> the over-thresholded SG decode yields ~nothing
    cfg2 = Configs()
    cfg2.superpoint.capacity = 128
    cfg2.superglue.image_width, cfg2.superglue.image_height = 160, 128
    cfg2.superglue.matcher = "superglue"
    cfg2.superglue.matching_threshold = 0.99
    ex2 = NeuralExtractor(cfg2, cam)
    m2 = ex2.match(b0, b1, outlier_rejection=False)
    assert int(np.asarray(m2.valid).sum()) < 10


def test_hybrid_matcher_policy():
    """matcher='hybrid': NN primary — bit-identical to the NN matcher
    when NN has support — with the SuperGlue assignment substituted in
    the same program when NN starves (the metric-setup production
    policy; rgbd/3d metric nn 0.056 vs sg 0.33, but NN collapses under
    photometric decay where SG holds)."""
    import os

    import pytest

    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.runtime.extractor import NeuralExtractor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sg_ckpt = os.path.join(repo, "weights", "superglue_v3scene.npz")
    if not os.path.exists(sg_ckpt):
        pytest.skip("shipped SuperGlue checkpoint not present")

    cam = make_pinhole(160, 128, 120.0, 120.0, 80.0, 64.0)

    def cfg_for(matcher, min_sim=0.2):
        cfg = Configs()
        cfg.superpoint.capacity = 256
        cfg.superglue.image_width, cfg.superglue.image_height = 160, 128
        cfg.superglue.matcher = matcher
        cfg.superglue.weights_path = sg_ckpt
        cfg.superglue.nn_min_similarity = min_sim
        return cfg

    key = jax.random.PRNGKey(5)
    b0 = make_bank(key, 80, capacity=256, w=160, h=128)
    b1 = FeatureBank(scores=b0.scores, kpts=b0.kpts + 2.0, desc=b0.desc, valid=b0.valid)

    # plentiful NN support -> hybrid IS the NN matcher
    m_h = NeuralExtractor(cfg_for("hybrid"), cam).match(b0, b1, outlier_rejection=False)
    m_n = NeuralExtractor(cfg_for("nn"), cam).match(b0, b1, outlier_rejection=False)
    assert int(np.asarray(m_n.valid).sum()) >= 40  # NN has support here
    np.testing.assert_array_equal(np.asarray(m_h.idx1), np.asarray(m_n.idx1))

    # starved NN (impossible similarity bar) -> hybrid falls through to SG
    m_h2 = NeuralExtractor(cfg_for("hybrid", min_sim=2.0), cam).match(b0, b1, outlier_rejection=False)
    m_n2 = NeuralExtractor(cfg_for("nn", min_sim=2.0), cam).match(b0, b1, outlier_rejection=False)
    m_s2 = NeuralExtractor(cfg_for("superglue"), cam).match(b0, b1, outlier_rejection=False)
    assert int(np.asarray(m_n2.valid).sum()) == 0
    np.testing.assert_array_equal(np.asarray(m_h2.idx1), np.asarray(m_s2.idx1))

    # hybrid without SG weights degrades to plain NN
    cfg_now = cfg_for("hybrid")
    cfg_now.superglue.weights_path = None
    assert NeuralExtractor(cfg_now, cam)._matcher == "nn"
