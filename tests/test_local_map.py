import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.keypoints import FeatureBank
from ur_mvo_tpu.ops.local_map import search_by_projection

FX = FY = 300.0
CX, CY = 160.0, 120.0
W, H = 320, 240


def make_case(n_pts=40, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1.0, 1.0, n_pts), rng.uniform(3.0, 6.0, n_pts)],
        axis=1,
    ).astype(np.float32)
    desc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    u = FX * X[:, 0] / X[:, 2] + CX
    v = FY * X[:, 1] / X[:, 2] + CY
    kpts = np.zeros((cap, 2), np.float32)
    bdesc = np.zeros((cap, 64), np.float32)
    valid = np.zeros(cap, bool)
    kpts[:n_pts] = np.stack([u, v], 1)
    bdesc[:n_pts] = desc
    valid[:n_pts] = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    bank = FeatureBank(
        scores=jnp.asarray(valid.astype(np.float32)),
        kpts=jnp.asarray(kpts),
        desc=jnp.asarray(bdesc),
        valid=jnp.asarray(valid),
    )
    mp_pos = np.zeros((cap, 3), np.float32)
    mp_desc = np.zeros((cap, 64), np.float32)
    mp_valid = np.zeros(cap, bool)
    mp_pos[:n_pts] = X
    mp_desc[:n_pts] = desc
    mp_valid[:n_pts] = True
    return bank, jnp.asarray(mp_pos), jnp.asarray(mp_desc), jnp.asarray(mp_valid), valid


def test_search_by_projection_identity():
    """At the true pose, every visible map point associates with its own
    feature (identical descriptors, zero pixel distance)."""
    bank, mp_pos, mp_desc, mp_valid, valid = make_case()
    m = search_by_projection(
        jnp.eye(3), jnp.zeros(3), mp_pos, mp_desc, mp_valid, bank,
        FX, FY, CX, CY, W, H, radius_px=10.0,
    )
    fi = np.asarray(m.feat_idx)
    mv = np.asarray(m.valid)
    n_vis = valid.sum()
    assert mv.sum() >= 0.9 * n_vis
    idx = np.nonzero(mv)[0]
    np.testing.assert_array_equal(fi[idx], idx)  # slot identity
    assert np.asarray(m.similarity)[idx].min() > 0.99


def test_search_by_projection_radius_gate():
    """With a pose error pushing projections beyond the radius, nothing
    associates; widening the radius recovers the matches."""
    bank, mp_pos, mp_desc, mp_valid, valid = make_case()
    t_cw = jnp.array([0.5, 0.0, 0.0])  # ~38 px shift at z=4
    m_tight = search_by_projection(
        jnp.eye(3), t_cw, mp_pos, mp_desc, mp_valid, bank,
        FX, FY, CX, CY, W, H, radius_px=10.0,
    )
    m_wide = search_by_projection(
        jnp.eye(3), t_cw, mp_pos, mp_desc, mp_valid, bank,
        FX, FY, CX, CY, W, H, radius_px=80.0,
    )
    assert int(m_tight.valid.sum()) < int(m_wide.valid.sum())
    assert int(m_wide.valid.sum()) > 0.5 * valid.sum()


def test_search_by_projection_behind_camera():
    bank, mp_pos, mp_desc, mp_valid, valid = make_case()
    # move camera far forward: points end up behind it
    t_cw = jnp.array([0.0, 0.0, -10.0])
    m = search_by_projection(
        jnp.eye(3), t_cw, mp_pos, mp_desc, mp_valid, bank,
        FX, FY, CX, CY, W, H,
    )
    assert int(m.valid.sum()) == 0
