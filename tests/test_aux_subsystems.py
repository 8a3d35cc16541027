"""Aux subsystems: viz drawing, publisher channels, dataset reader,
map snapshots, timers."""

import os
import time

import numpy as np

from ur_mvo_tpu.dataset import Dataset, load_colmap_images_txt, parse_timestamp
from ur_mvo_tpu.runtime.map_store import MapStore, StoreConfig
from ur_mvo_tpu.runtime.publisher import FramePoseMessage, Publisher
from ur_mvo_tpu.utils.timing import StageTimer
from ur_mvo_tpu.utils.viz import draw_features, draw_matches, draw_reprojections


def test_viz_drawing():
    img = np.zeros((64, 80), np.uint8)
    kpts = np.array([[10.0, 10.0], [40.0, 30.0], [70.0, 60.0]])
    canvas = draw_features(img, kpts, valid=np.array([True, True, False]))
    assert canvas.shape == (64, 80, 3)
    assert canvas.sum() > 0  # something was drawn
    m = draw_matches(img, kpts, img, kpts, np.array([0, 1, -1]), np.array([True, True, False]))
    assert m.shape == (64, 160, 3)
    r = draw_reprojections(img, kpts, kpts + 2.0, np.array([True, False, True]))
    assert r.sum() > 0


def test_publisher_callbacks():
    pub = Publisher()
    got = []
    pub.register("frame_pose", lambda msg: got.append(msg.time))
    for i in range(5):
        pub.publish_frame_pose(FramePoseMessage(time=float(i), pose=np.eye(4)))
    deadline = time.time() + 2.0
    while len(got) < 5 and time.time() < deadline:
        time.sleep(0.01)
    assert got == [0.0, 1.0, 2.0, 3.0, 4.0]
    pub.shutdown()


def test_publisher_disabled_channel_is_free():
    pub = Publisher()
    pub.publish_map(None)  # no callback registered: no queue, no thread
    assert pub.channels["map"]._thread is None
    pub.shutdown()


def test_dataset_reader(tmp_path):
    data = tmp_path / "cam0" / "data"
    data.mkdir(parents=True)
    ts0 = 1403636579763555584
    for i in range(3):
        np.save(str(data / f"{ts0 + i * 50000000}.npy"), np.full((8, 8), i, np.uint8))
    os.rename(str(data / f"{ts0}.npy"), str(data / f"{ts0}.npy"))
    ds = Dataset(str(tmp_path))
    assert len(ds) == 3
    d0 = ds.get(0)
    assert abs(d0.time - ts0 * 1e-9) < 1e-6
    assert d0.image[0, 0] == 0
    assert parse_timestamp("1403636579763555584.png") is not None


def test_colmap_gt_loader(tmp_path):
    p = tmp_path / "images.txt"
    p.write_text(
        "# comment\n"
        "1 1 0 0 0 0.5 0.1 -0.2 1 frame000100.png\n"
        "0 0\n"
        "2 0.9238795 0 0.3826834 0 1.0 0.0 0.0 1 frame000200.png\n"
        "0 0\n"
    )
    ts, pos, quat = load_colmap_images_txt(str(p))
    assert len(ts) == 2
    # first image: identity rotation -> center = -t
    np.testing.assert_allclose(pos[0], [-0.5, -0.1, 0.2], atol=1e-6)


def test_map_snapshot_roundtrip(tmp_path):
    cfg = StoreConfig(max_keyframes=8, max_mappoints=64, keypoints_per_frame=16)
    st = MapStore(cfg)
    kpts = np.random.default_rng(0).random((16, 3)).astype(np.float32)
    valid = np.ones(16, bool)
    desc = np.random.default_rng(1).random((16, cfg.descriptor_dim)).astype(np.float16)
    st.alloc_keyframe(0, 0.0, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), kpts, valid,
                      desc=desc)
    mp = st.alloc_mappoints(5)
    st.mp_pos[mp] = 1.5
    st.mp_good[mp] = True
    st.add_observations(0, mp, np.arange(5))
    path = str(tmp_path / "map.npz")
    st.save_snapshot(path)
    st2 = MapStore.load_snapshot(path, cfg)
    assert st2.num_keyframes() == 1
    np.testing.assert_array_equal(st2.kf_kpts, st.kf_kpts)
    np.testing.assert_array_equal(st2.obs_slot, st.obs_slot)
    assert st2.frame_id_to_slot == {0: 0}
    assert st2._next_mp == 5
    # observer-descriptor banks (exact-medoid inputs) survive the roundtrip
    np.testing.assert_array_equal(st2.kf_desc[0], st.kf_desc[0])


def test_batch_remove_observations_matches_sequential():
    """remove_observations (vectorized BA outlier write-back) must leave
    the store byte-identical to the sequential remove_observation loop —
    including covisibility, track slots, and observation counts — on a
    randomized store with shared/duplicate/dead pairs."""
    import copy

    rng = np.random.default_rng(3)
    cfg = StoreConfig(max_keyframes=12, max_mappoints=96, keypoints_per_frame=24)

    def build():
        st = MapStore(cfg)
        for f in range(8):
            kpts = rng.random((24, 3)).astype(np.float32)
            st.alloc_keyframe(f, float(f), np.eye(3, dtype=np.float32), np.zeros(3, np.float32), kpts, np.ones(24, bool))
        mp = st.alloc_mappoints(60)
        st.mp_good[mp] = True
        for f in range(8):
            sel = rng.choice(60, size=18, replace=False)
            st.add_observations(f, mp[sel], rng.choice(24, size=18, replace=False))
        return st

    st_seq = build()
    st_bat = copy.deepcopy(st_seq)
    # removal set: random pairs incl. duplicates and not-observed pairs
    kfs = rng.integers(0, 8, size=90)
    mps = rng.integers(0, 60, size=90)
    kfs = np.concatenate([kfs, kfs[:10]])  # duplicates
    mps = np.concatenate([mps, mps[:10]])
    for k, m in zip(kfs, mps):
        st_seq.remove_observation(int(k), int(m))
    st_bat.remove_observations(kfs, mps)
    np.testing.assert_array_equal(st_bat.obs_slot, st_seq.obs_slot)
    np.testing.assert_array_equal(st_bat.kf_track, st_seq.kf_track)
    np.testing.assert_array_equal(st_bat.mp_obs_count, st_seq.mp_obs_count)
    np.testing.assert_array_equal(st_bat.covis, st_seq.covis)


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        time.sleep(0.02)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["mean_ms"] >= 10
    t.write_csv(str(tmp_path / "t.csv"))
    assert (tmp_path / "t.csv").read_text().startswith("stage,")


def test_keyframe_culling():
    cfg = StoreConfig(max_keyframes=16, max_mappoints=128, keypoints_per_frame=8)
    st = MapStore(cfg)
    kpts = np.zeros((8, 3), np.float32)
    for i in range(10):
        st.alloc_keyframe(i, float(i), np.eye(3, dtype=np.float32), np.zeros(3, np.float32), kpts, np.ones(8, bool))
        mp = st.alloc_mappoints(4)
        st.mp_good[mp] = True
        st.add_observations(i, mp, np.arange(4))
    assert st.num_keyframes() == 10
    st.cull(max_keyframes=5, max_mappoints=12)
    assert st.num_keyframes() == 5
    # oldest removed, newest kept
    remaining = sorted(st.kf_frame_id[st.keyframe_slots()].tolist())
    assert remaining == [5, 6, 7, 8, 9]
    # cap enforced: the 20 orphans (points of the removed keyframes) are
    # reaped first, then least-observed points detach down to the cap —
    # protecting the newest keyframe's points; all reaped ids recycle
    assert int((st.mp_alloc & ~st.mp_bad).sum()) == 12
    assert len(st._free_mp) == 28
    alive = st.mp_alloc & ~st.mp_bad
    newest_pts = st.kf_track[st.frame_id_to_slot[9]]
    assert alive[newest_pts[newest_pts >= 0]].all()
    obs_counts = (st.obs_slot[alive] >= 0).sum(axis=1)
    assert (obs_counts > 0).all()
    # covisibility rows of removed slots are zeroed
    removed = np.nonzero(~st.kf_valid[:10])[0]
    assert st.covis[removed].sum() == 0


def test_stablehlo_export_roundtrip(tmp_path):
    """Model export capability: serialize the fused frame step, reload,
    and verify numerically (the reference's ONNX-export check analog)."""
    import jax

    from ur_mvo_tpu.models import export, superglue, superpoint

    sp = superpoint.init_params(jax.random.PRNGKey(0))
    sg = superglue.init_params(jax.random.PRNGKey(1), num_layers=1)
    path = str(tmp_path / "frame_step.stablehlo")
    export.export_frame_step(path, sp, sg, height=64, width=80, capacity=128, max_keypoints=100,
                             sinkhorn_iterations=10)
    assert os.path.getsize(path) > 1000
    err = export.verify_roundtrip(path, sp, sg, height=64, width=80, capacity=128, max_keypoints=100,
                                  sinkhorn_iterations=10)
    assert err < 1e-3, err


def test_dataset_flat_layout(tmp_path):
    """Raw Aqualoc-style flat image folder (no cam0/data)."""
    for i in range(3):
        np.save(str(tmp_path / f"frame{i:06d}.npy"), np.full((4, 4), i, np.uint8))
    ds = Dataset(str(tmp_path))
    assert len(ds) == 3
    assert ds.get(1).image[0, 0] == 1


def test_neural_extractor_mask_filtering():
    """Engine-level semantic mask: masked-out regions yield no keypoints
    (reference filter_points semantics, super_point.cpp:178-194)."""
    import jax

    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.runtime.extractor import NeuralExtractor

    cfg = Configs()
    cfg.superpoint.capacity = 256
    cfg.superpoint.max_keypoints = 200
    cfg.superpoint.keypoint_threshold = 1e-5
    cfg.superglue.num_layers = 1
    cam = make_pinhole(128, 96, 100.0, 100.0, 64.0, 48.0)
    ext = NeuralExtractor(cfg, cam)
    rng = np.random.default_rng(0)
    img = (rng.random((96, 128)) * 255).astype(np.uint8)
    mask = np.ones((96, 128), np.uint8)
    mask[:, :64] = 0
    bank = ext.extract(img, mask)
    k = np.asarray(bank.kpts)[np.asarray(bank.valid)]
    assert len(k) > 10
    assert k[:, 0].min() >= 64


def test_mappoint_descriptor_medoid_update():
    """Exact-medoid parity with mapping.cc:207-258: the stored descriptor
    is the observation minimizing the summed distance 2(1 - f·f') to all
    other live observations (brute-force cross-check), and an observer
    removed as an outlier drops out of the medoid on the next update."""
    D = 32
    K = 4
    cfg = StoreConfig(max_keyframes=8, max_mappoints=16, keypoints_per_frame=K, descriptor_dim=D)
    st = MapStore(cfg)
    mp = st.alloc_mappoints(1)
    rng = np.random.default_rng(0)
    center = rng.normal(size=D)
    center /= np.linalg.norm(center)

    def observe(kf_idx, d):
        bank = rng.normal(size=(K, D)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        bank[0] = d
        slot = st.alloc_keyframe(kf_idx, float(kf_idx), np.eye(3, dtype=np.float32),
                                 np.zeros(3, np.float32), np.zeros((K, 3), np.float32),
                                 np.ones(K, bool), desc=bank)
        st.add_observations(slot, mp, np.array([0]))
        st.update_descriptors(mp)
        return slot

    outlier = rng.normal(size=D)
    outlier /= np.linalg.norm(outlier)
    # f16 round-trip like the store's own banks
    obs_descs = [outlier.astype(np.float16).astype(np.float32)]
    slot_out = observe(0, outlier)
    for i in range(5):
        d = center + 0.1 * rng.normal(size=D)
        d /= np.linalg.norm(d)
        obs_descs.append(d.astype(np.float16).astype(np.float32))
        observe(i + 1, d)

    def brute_medoid(descs):
        A = np.stack(descs)
        dist = 2.0 * (1.0 - A @ A.T)
        return A[np.argmin(dist.sum(1))]

    stored = st.mp_desc[mp[0]].astype(np.float32)
    np.testing.assert_allclose(stored, brute_medoid(obs_descs), atol=2e-3)
    assert float(stored @ outlier) < 0.5  # outlier never the medoid here
    # remove one near-center observer: the medoid recomputes over the
    # survivors the next time the point is touched
    st.remove_observation(2, int(mp[0]))
    st.remove_observation(slot_out, int(mp[0]))
    st.update_descriptors(mp)
    survivors = [d for i, d in enumerate(obs_descs) if i not in (0, 2)]
    stored = st.mp_desc[mp[0]].astype(np.float32)
    np.testing.assert_allclose(stored, brute_medoid(survivors), atol=2e-3)


def test_cull_recycles_slots_and_orphan_mappoints():
    """Bounded-capacity store under culling: freed keyframe slots are
    reused, and over-cap orphan mappoints (zero live observations) are
    reaped onto the free list and recycled with scrubbed state."""
    K = 8
    cfg = StoreConfig(max_keyframes=4, max_mappoints=12, keypoints_per_frame=K,
                      descriptor_dim=16)
    st = MapStore(cfg)
    kpts = np.zeros((K, 3), np.float32)
    valid = np.ones(K, bool)

    def add_kf(fid, mps):
        desc = np.full((K, 16), 0.25, np.float16)
        s = st.alloc_keyframe(fid, float(fid), np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), kpts, valid, desc=desc)
        st.add_observations(s, mps, np.arange(len(mps)))
        return s

    m0 = st.alloc_mappoints(6)
    st.mp_good[m0] = True
    st.mp_pos[m0] = 7.0
    add_kf(0, m0)
    add_kf(1, m0)
    # cull to 1 keyframe: kf 0 removed, its slot freed; m0 loses an
    # observer each but stays observed by kf 1 -> NOT reaped
    st.cull(max_keyframes=1, max_mappoints=100)
    assert len(st._free_kf) == 1
    assert st.num_keyframes() == 1
    assert (st.mp_alloc[m0]).all()
    # new keyframe reuses the freed slot; capacity 4 never grows
    s2 = add_kf(2, m0)
    assert st._free_kf == [] and s2 < 4
    # drop kf1+kf2 observations of m0 -> orphans; over-cap cull reaps them
    st.remove_observations(np.array([1, 1, 1, s2, s2, s2]), np.array([m0[0], m0[1], m0[2]] * 2))
    st.cull(max_keyframes=4, max_mappoints=3)
    assert len(st._free_mp) == 3
    assert not st.mp_alloc[m0[:3]].any()
    # recycled ids come back scrubbed
    m1 = st.alloc_mappoints(3)
    assert set(m1.tolist()) == set(m0[:3].tolist())
    assert not st.mp_good[m1].any() and not st.mp_bad[m1].any()
    assert (st.mp_pos[m1] == 0).all() and (st.mp_obs_count[m1] == 0).all()
    assert (st.mp_desc[m1] == 0).all()


def test_cull_cap_pressure_detaches_least_observed_but_protects_newest():
    """When orphans alone can't meet the mappoint cap, cull detaches the
    least-observed points — but NEVER points observed by the newest
    keyframe (the tracker's live reference horizon), keeping id
    recycling safe under cap pressure."""
    K = 8
    cfg = StoreConfig(max_keyframes=8, max_mappoints=32, keypoints_per_frame=K,
                      descriptor_dim=16)
    st = MapStore(cfg)
    kpts = np.zeros((K, 3), np.float32)

    def add_kf(fid, mps, slots):
        s = st.alloc_keyframe(fid, float(fid), np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), kpts, np.ones(K, bool),
                              desc=np.full((K, 16), 0.25, np.float16))
        st.add_observations(s, mps, slots)
        return s

    # 16 points, ALL observed: 8 old (1 observer each, an old keyframe)
    # + 8 new (observed by the newest keyframe)
    old = st.alloc_mappoints(8)
    new = st.alloc_mappoints(8)
    st.mp_good[np.concatenate([old, new])] = True
    add_kf(0, old, np.arange(8))
    add_kf(1, new, np.arange(8))
    # no orphans exist; cap 10 forces detaching 6 of the old points
    st.cull(max_keyframes=8, max_mappoints=10)
    alive = st.mp_alloc & ~st.mp_bad
    assert int(alive.sum()) == 10
    assert alive[new].all(), "newest keyframe's points must survive"
    assert len(st._free_mp) == 6  # detached points reaped for reuse
