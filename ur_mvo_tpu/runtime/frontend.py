"""VO tracking front end: the host state machine.

Orchestration parity with the reference's ``Tracking``
(``/root/reference/src/tracking.cc``): monocular/RGB-D initialization
(``:379-648``), frame-to-keyframe tracking with PnP prior + pose-only
refinement (``:711-911``), tracking-loss fallback that promotes the last
frame to keyframe (``:253-276``), the keyframe policy (``:913-958``), and
keyframe insertion into the mapping backend (``:962-995``) — which is the
only event that emits a pose to the caller (``:989``; non-keyframe frames
are interpolated by the engine, as in ``engine.py:22-40``).

Design difference: the reference runs this as 3 threads with mutex-guarded
queues; here it is a single-owner host loop issuing asynchronous device
programs (extraction/matching/PnP/pose-opt are jitted; JAX's async
dispatch overlaps host bookkeeping with device compute). Decisions
(init success, fallback, keyframe) read back tiny scalars only.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.camera import Camera
from ur_mvo_tpu.config import Configs
from ur_mvo_tpu.ops import lie
from ur_mvo_tpu.ops.epipolar import two_view_init
from ur_mvo_tpu.ops.matching import Matches
from ur_mvo_tpu.ops.local_map import search_by_projection
from ur_mvo_tpu.ops.pnp import ransac_pnp
from ur_mvo_tpu.ops.pose_opt import PoseObs, optimize_pose
from ur_mvo_tpu.runtime.backend import Backend
from ur_mvo_tpu.runtime.publisher import (
    FramePoseMessage,
    KeyframeMessage,
    MapMessage,
    Publisher,
)
from ur_mvo_tpu.utils.timing import StageTimer

# per-frame tracking-health trace (num_match / n_inl per frame + per
# chunk row) — the round-5 silent-loss audit tool; resolved once at
# import so the hot path pays nothing when off
_DEBUG_TRACK = bool(os.environ.get("URMVO_DEBUG_CHUNK"))


def fused_track_core(k_pnp, m, uvr, snapshot, K_mat, fx, fy, cx, cy, bf,
                     chi2_mono, chi2_stereo, pnp_iterations, pnp_threshold_px,
                     min_match, max_jump):
    """Traceable post-match half of the fused frame step: candidate
    scatter + PnP prior + pose refinement + jump-guard rescue.

    Shared by the Tracker's per-frame fused program, the multi-sequence
    driver's vmapped batched-track program, and the multi-frame chunk
    kernel. Returns the packed f32 vector [num_match, n_inliers, R_cw(9),
    t_cw(3), frame_track(K), uvr(3K)] (see Tracker._parse_fused_packed)."""
    K = m.idx1.shape[0]
    cand_pos = snapshot[:, 0:3]
    # col 3 is a 2-level flag: 2 = triangulated (Good) candidate with a
    # usable 3D position, 1 = live but untriangulated mappoint (its
    # TRACK ID must still propagate so the point can accumulate
    # observers and triangulate at a later keyframe — the reference
    # writes track ids for every match, tracking.cc:723-728, and only
    # chi2-classifies the triangulated ones, :896-911), 0 = none.
    cand_ok = snapshot[:, 3] > 1.5
    cand_live = snapshot[:, 3] > 0.5
    ref_track = snapshot[:, 4]
    R_last_cw = snapshot[0:9, 5].reshape(3, 3)
    t_last_cw = snapshot[9:12, 5]
    num_match = m.num_valid()

    # scatter ref-slot candidates to current-frame slots
    # (the host-side gather in _track_frame, on device)
    src_ok = m.valid & cand_ok
    dst = jnp.where(src_ok, m.idx1, K)  # K = dump row
    X = jnp.zeros((K + 1, 3), jnp.float32).at[dst].set(cand_pos)[:K]
    valid_cur = jnp.zeros(K + 1, bool).at[dst].set(src_ok)[:K]
    live_ok = m.valid & cand_live
    dst_live = jnp.where(live_ok, m.idx1, K)
    mp_slot = (
        jnp.full(K + 1, -1.0, jnp.float32)
        .at[dst_live]
        .set(jnp.where(live_ok, ref_track, -1.0))[:K]
    )
    obs = PoseObs(X=X, uv=uvr, valid=valid_cur)

    pnp = ransac_pnp(
        k_pnp, X, uvr[:, :2], valid_cur, K_mat,
        iterations=pnp_iterations, threshold_px=pnp_threshold_px,
    )
    weak = (
        (pnp.n_inliers < min_match)
        | (jnp.sum(valid_cur.astype(jnp.int32)) < 6)
        | ~jnp.all(jnp.isfinite(pnp.t_cw))
    )
    R0 = jnp.where(weak, R_last_cw, pnp.R_cw)
    t0 = jnp.where(weak, t_last_cw, pnp.t_cw)
    res = optimize_pose(
        R0, t0, obs, fx, fy, cx, cy, bf,
        chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
    )
    # jump guard + rescue (see _track_frame for rationale)
    t_wc_last = -R_last_cw.T @ t_last_cw
    t_wc = -res.R_cw.T @ res.t_cw
    jump = jnp.linalg.norm(t_wc - t_wc_last)
    ok1 = res.n_inliers >= min_match
    bad_jump = ~jnp.isfinite(jump) | (jump > max_jump)

    def rescue(_):
        r2 = optimize_pose(
            R_last_cw, t_last_cw, obs, fx, fy, cx, cy, bf,
            chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
        )
        t2 = -r2.R_cw.T @ r2.t_cw
        j2 = jnp.linalg.norm(t2 - t_wc_last)
        ok2 = jnp.isfinite(j2) & (j2 <= max_jump) & (r2.n_inliers >= min_match)
        return r2.R_cw, r2.t_cw, r2.inliers & ok2, jnp.where(ok2, r2.n_inliers, 0)

    def keep(_):
        return res.R_cw, res.t_cw, res.inliers, res.n_inliers

    R_f, t_f, inl_f, n_f = jax.lax.cond(ok1 & bad_jump, rescue, keep, None)
    # chi2 inlier classification applies only to slots that carried a 3D
    # constraint; matched-but-untriangulated ids are kept as-is
    # (tracking.cc:896-911 sets inliers[idx]=-1 only for constraints).
    keep_id = jnp.where(valid_cur, inl_f, mp_slot >= 0)
    frame_track = jnp.where(keep_id, mp_slot, -1.0)
    return jnp.concatenate([
        jnp.stack([num_match.astype(jnp.float32), n_f.astype(jnp.float32)]),
        R_f.reshape(-1), t_f, frame_track, uvr.reshape(-1),
    ])


class _LazyBankSlice:
    """Deferred row of the chunk scan's stacked FeatureBank output.

    The chunk replay books one of these per frame instead of slicing the
    device arrays eagerly (4 gather dispatches/frame); only the rare
    consumers — the promote-keyframe fallback and keyframe insertion —
    pay for materialization."""

    __slots__ = ("banks", "idx", "capacity")

    def __init__(self, banks, idx):
        self.banks = banks
        self.idx = idx
        self.capacity = int(banks.kpts.shape[-2])

    def resolve(self):
        i = self.idx
        return jax.tree.map(lambda x: x[i], self.banks)


def _resolve_bank(bank):
    return bank.resolve() if isinstance(bank, _LazyBankSlice) else bank


class Tracker:
    def __init__(self, cfg: Configs, camera: Camera, extractor, backend: Optional[Backend] = None,
                 publisher: Optional[Publisher] = None):
        self.cfg = cfg
        self.camera = camera
        self.extractor = extractor
        self.publisher = publisher or Publisher()
        self.timer = StageTimer()
        self.backend = backend or Backend(
            camera, cfg.backend, cfg.backend_optimization,
            keypoints_per_frame=cfg.superpoint.capacity,
        )
        self.K_mat = jnp.asarray(camera.intrinsic_matrix())

        self._initialized = False
        self._init_bank = None
        self._init_time = None
        self._init_frame_id = None
        self._frame_counter = 0

        # last-frame state
        self._last_pose = np.eye(4, dtype=np.float32)  # T_wc
        self._last_bank = None
        self._last_track = None  # (K,) mappoint ids of last frame
        self._last_uvr = None  # lazily materialized (see _after_track)
        self._last_u_right = None  # stereo-chunk gated right-x column
        self._last_time = 0.0
        self._last_frame_id = -1
        self._last_track_well = False
        self._num_since_last_keyframe = 0
        self._lost_count = 0  # consecutive lost frames (relocalization)
        self._reloc_next_attempt = 0  # failed-reloc backoff (_handle_lost)

        # reference keyframe state
        self._ref_slot = None
        self._ref_bank = None
        self._ref_frame_id = -1
        self._last_keyframe_pose = np.eye(4, dtype=np.float32)
        self._last_keyframe_frame_id = -1
        self._last_keyframe_time = 0.0

        self._rng = jax.random.PRNGKey(cfg.runtime.seed + 7)

        kf = cfg.keyframe
        cam = camera
        topt = cfg.tracking_optimization
        rt = cfg.runtime

        @jax.jit
        def _track_kernel(key, X, uvr, valid, R_last_cw, t_last_cw):
            """PnP prior + pose-only refinement, one device program
            (parity with FramePoseOptimization, tracking.cc:793-911).
            ``uvr``: (K, 3) with u_right < 0 for mono rows."""
            pnp = ransac_pnp(
                key, X, uvr[:, :2], valid, self.K_mat,
                iterations=rt.pnp_ransac_iterations,
                threshold_px=rt.pnp_reprojection_threshold,
            )
            # fallback to last pose when PnP support is too weak. Beyond
            # the reference's inlier gate (tracking.cc:800-818): with
            # fewer than 6 correspondences the DLT minimal problem is
            # underdetermined and every hypothesis is garbage (OpenCV's
            # solvePnPRansac cannot even run there; our padded batched
            # solver produces finite-but-meaningless poses), and a
            # non-finite pose must never be carried forward.
            weak = (
                (pnp.n_inliers < kf.min_num_match)
                | (jnp.sum(valid.astype(jnp.int32)) < 6)
                | ~jnp.all(jnp.isfinite(pnp.t_cw))
            )
            R0 = jnp.where(weak, R_last_cw, pnp.R_cw)
            t0 = jnp.where(weak, t_last_cw, pnp.t_cw)
            obs = PoseObs(X=X, uv=uvr, valid=valid)
            res = optimize_pose(
                R0, t0, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                chi2_mono=topt.mono_point, chi2_stereo=topt.stereo_point,
            )
            return res

        self._track_kernel = _track_kernel

        @jax.jit
        def _track_kernel_nopnp(X, uvr, valid, R_last_cw, t_last_cw):
            """Pose-only refinement seeded at the last frame's pose —
            the rescue path when the PnP prior teleported the optimizer
            into a garbage basin (see the jump guard in _track_frame)."""
            obs = PoseObs(X=X, uv=uvr, valid=valid)
            return optimize_pose(
                R_last_cw, t_last_cw, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                chi2_mono=topt.mono_point, chi2_stereo=topt.stereo_point,
            )

        self._track_kernel_nopnp = _track_kernel_nopnp

        init_cfg = cfg.initializer

        @jax.jit
        def _init_kernel(key, p1, p2, valid):
            return two_view_init(
                key, p1, p2, valid, self.K_mat,
                iterations=init_cfg.ransac_iterations,
                sigma=init_cfg.sigma,
                min_triangulated=50,
                min_parallax_deg=init_cfg.min_parallax_deg,
            )

        self._init_kernel = _init_kernel
        # Fused mono-init attempt (neural path): match + two-view
        # epipolar init as ONE program with ONE packed readback —
        # [success, R21(9), t21(3), idx1(K), mvalid(K), tri(K), X(3K)].
        # The unfused attempt paid ~7 transfers (match idx/valid, the
        # result fields) PER RETRY FRAME until init succeeded; through
        # the dev relay each is a ~24 ms round trip.
        self._fused_init = None
        if hasattr(extractor, "match_traceable"):
            _match_for_init = extractor.match_traceable
            # init-only NN floor (config.py nn_fallback_min_matches_init):
            # the production mono stack's seed-dependent hard failures
            # were two-view-init match starvation; the floor rescues
            # those attempts without taxing tracking frames
            _init_floor = cfg.superglue.nn_fallback_min_matches_init or None

            @jax.jit
            def _fused_init(sg_params, key, b0, b1):
                k_m, k_i = jax.random.split(key)
                m = _match_for_init(sg_params, k_m, b0, b1, True, floor=_init_floor)
                p1 = b0.kpts
                p2 = b1.kpts[jnp.maximum(m.idx1, 0)]
                res = two_view_init(
                    k_i, p1, p2, m.valid, self.K_mat,
                    iterations=init_cfg.ransac_iterations,
                    sigma=init_cfg.sigma,
                    min_triangulated=50,
                    min_parallax_deg=init_cfg.min_parallax_deg,
                )
                return jnp.concatenate([
                    res.success.astype(jnp.float32)[None],
                    res.R21.reshape(-1), res.t21,
                    m.idx1.astype(jnp.float32),
                    m.valid.astype(jnp.float32),
                    res.triangulated.astype(jnp.float32),
                    res.points3d.reshape(-1),
                ])

            self._fused_init = _fused_init

        lmt = cfg.local_map_tracking

        @jax.jit
        def _local_map_kernel(R_cw, t_cw, mp_pos, mp_desc, mp_valid, bank):
            """Project local map points, associate by descriptor, refine
            the pose once more on the expanded set (TrackLocalMap's
            SearchLocalPoints + re-optimize flow)."""
            mm_ = search_by_projection(
                R_cw, t_cw, mp_pos, mp_desc, mp_valid, bank,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                radius_px=lmt.radius_px, min_similarity=lmt.min_similarity, ratio=lmt.ratio,
            )
            idx = jnp.maximum(mm_.feat_idx, 0)
            uv = jnp.concatenate([bank.kpts[idx], -jnp.ones((mp_pos.shape[0], 1))], axis=1)
            obs = PoseObs(X=mp_pos, uv=uv, valid=mm_.valid)
            res = optimize_pose(
                R_cw, t_cw, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                chi2_mono=topt.mono_point, chi2_stereo=topt.stereo_point,
                rounds=1,
            )
            return mm_, res

        self._local_map_kernel = _local_map_kernel

        # Fused frame step: match-vs-ref + correspondence scatter + PnP
        # prior + pose refinement + jump-guard rescue as ONE device
        # program with ONE packed f32 readback. The unfused path costs
        # ~12 host<->device round trips per frame (3 dispatches + 9
        # transfers), each floored by per-call latency (~24 ms through
        # the dev relay, ~0.1 ms locally); fused it is 1 dispatch + 1
        # small upload + 1 readback. Built only for extractors that
        # expose a traceable matcher (the neural path); the oracle /
        # stereo / precomputed-match paths keep the two-program flow.
        self._fused_kernel = None
        self._fused_kernel_stereo = None
        self._bank_pack = None
        self._chunk_builder = None
        self._chunk_kernels = {}
        if hasattr(extractor, "match_traceable"):
            match_impl = extractor.match_traceable
            min_match = kf.min_num_match
            max_jump = 4.0 * kf.max_distance
            # stereo disparity band (Frame::AddRightFeatures,
            # frame.cc:95-126) — closure constants from the calibration
            st_min_dx = cam.bf / cam.depth_upper_thr if cam.bf > 0 else 0.0
            st_max_dx = cam.bf / cam.depth_lower_thr if cam.bf > 0 else 0.0
            st_max_dy = cam.max_y_diff

            def _fused_impl(sg_params, key, ref_bank, bank, snapshot, bank_right):
                """``snapshot`` (K, 6) f32 packs every host-side input in
                one upload: [:, 0:3] candidate mappoint positions per REF
                slot, [:, 3] candidate-ok flag, [:, 4] ref track table
                (mappoint ids, exact in f32), [0:9, 5] last R_cw,
                [9:12, 5] last t_cw. Returns (next_key, packed) with
                packed = [num_match, n_inliers, R_cw(9), t_cw(3),
                frame_track(K), uvr(3K)]. With ``bank_right`` the
                left-right match + disparity gate run on device too."""
                key_next, k_lr, k_match, k_pnp = jax.random.split(key, 4)
                K = bank.kpts.shape[0]
                if bank_right is None:
                    uvr = jnp.concatenate([bank.kpts, -jnp.ones((K, 1), jnp.float32)], axis=1)
                else:
                    m_lr = match_impl(sg_params, k_lr, bank, bank_right, True)
                    ridx = jnp.maximum(m_lr.idx1, 0)
                    rx = bank_right.kpts[ridx, 0]
                    ry = bank_right.kpts[ridx, 1]
                    dx = bank.kpts[:, 0] - rx
                    dy = jnp.abs(bank.kpts[:, 1] - ry)
                    ok_lr = m_lr.valid & (dx > st_min_dx) & (dx < st_max_dx) & (dy <= st_max_dy)
                    uvr = jnp.concatenate(
                        [bank.kpts, jnp.where(ok_lr, rx, -1.0)[:, None]], axis=1
                    )
                m = match_impl(sg_params, k_match, ref_bank, bank, True)
                packed = fused_track_core(
                    k_pnp, m, uvr, snapshot, self.K_mat,
                    cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                    topt.mono_point, topt.stereo_point,
                    rt.pnp_ransac_iterations, rt.pnp_reprojection_threshold,
                    min_match, max_jump,
                )
                return key_next, packed

            @jax.jit
            def _fused_track(sg_params, key, ref_bank, bank, snapshot):
                return _fused_impl(sg_params, key, ref_bank, bank, snapshot, None)

            @jax.jit
            def _fused_track_stereo(sg_params, key, ref_bank, bank, snapshot, bank_right):
                return _fused_impl(sg_params, key, ref_bank, bank, snapshot, bank_right)

            self._fused_kernel = _fused_track
            self._fused_kernel_stereo = _fused_track_stereo if cam.bf > 0 else None

            @jax.jit
            def _bank_pack(bank):
                """Keyframe-path bank materialization as ONE transfer
                (kpts + valid + desc + scores were separate readbacks)."""
                return jnp.concatenate([
                    bank.kpts.reshape(-1),
                    bank.valid.astype(jnp.float32),
                    bank.desc.reshape(-1),
                    bank.scores.astype(jnp.float32),
                ])

            self._bank_pack = _bank_pack

            # Multi-frame chunk kernel: up to C frames of
            # extract+match+track as ONE device program (lax.while_loop),
            # CUT at the first keyframe decision or weak-tracking event.
            # Within a keyframe interval nothing in the host state
            # changes (the reference bank, candidate snapshot, and
            # keyframe-policy anchors are all functions of the last
            # keyframe), so the device loop makes EXACTLY the decisions
            # the per-frame path would — then stops, and the host replay
            # (keyframe insertion, triangulation, BA) runs with fresh
            # state before the next chunk. One dispatch + one packed
            # readback per chunk; the while_loop spends zero compute past
            # the cut. This is the TPU-first answer to the reference's
            # 2-thread pipeline (tracking.cc:57-59): the sequential frame
            # loop lives in compiled control flow, not host threads.
            # (A scan variant with on-device keyframe ROLLOVER was
            # measured first: tracking against the rolled-over candidate
            # set without BA/triangulation refresh doubled the keyframe
            # cadence on the bench scene — staleness made the match-count
            # criterion fire early — so the exact cut design won.)
            ext_traceable = getattr(extractor, "extract_traceable", None)
            topt_c, rt_c, kf_c, cam_c = topt, rt, kf, cam

            ext_right_traceable = getattr(extractor, "extract_right_traceable", None)

            def _build_chunk(C, stereo=False):
                K = cfg.superpoint.capacity

                @jax.jit
                def _chunk(sp_params, sg_params, key, ref_bank, scal, images,
                           images_right=None):
                    """``scal``: ONE packed (6K+26,) f32 upload —
                    [fused_snapshot (K,6) raveled | pose_pack(24):
                    R_last_cw(9) t_last_cw(3) kf_R_wc(9) kf_t_wc(3) |
                    passed0 | n_valid] (round 4: the four separate small
                    uploads each cost a relay round trip; one array is
                    one). ``images``: (C, H, W) u8; n_valid = leading
                    real frames (tail = padding). Returns (next_key,
                    flat readback, banks stacked): the flat readback is
                    [outs (C, 15+K or 15+2K) raveled | the CUT row's
                    packed bank (kpts, valid, desc, scores — what
                    _insert_keyframe materializes)], so a keyframe cut
                    costs no second transfer. Rows the loop never
                    reached have num_match = -1. The stereo variant also
                    extracts ``images_right``, folds the left-right
                    match + disparity gate into the loop (frame.cc:
                    95-126, as in _fused_impl), and appends the gated
                    u_right column per row."""
                    snap = scal[: 6 * K].reshape(K, 6)
                    pose_pack = scal[6 * K : 6 * K + 24]
                    passed0 = scal[6 * K + 24]
                    n_valid = scal[6 * K + 25].astype(jnp.int32)
                    H, W = images.shape[1], images.shape[2]
                    bank0 = ext_traceable(sp_params, jnp.zeros((H, W), images.dtype))
                    banks0 = jax.tree.map(
                        lambda a: jnp.zeros((C,) + a.shape, a.dtype), bank0)
                    outs0 = jnp.full((C, (15 + 2 * K) if stereo else (15 + K)), -1.0, jnp.float32)
                    R_last0 = pose_pack[0:9].reshape(3, 3)
                    t_last0 = pose_pack[9:12]
                    kfR = pose_pack[12:21].reshape(3, 3)
                    kft = pose_pack[21:24]

                    def cond(state):
                        key, i, stop, R_last, t_last, outs, banks = state
                        return (i < n_valid) & (stop == 0)

                    def body(state):
                        key, i, stop, R_last, t_last, outs, banks = state
                        # same split order + subkey assignment as
                        # _fused_impl, so a chunked run consumes the
                        # exact RNG stream the per-frame path would given
                        # identical host state (bit-comparable A/B)
                        key, k_lr, k_m, k_pnp = jax.random.split(key, 4)
                        img = jax.lax.dynamic_index_in_dim(images, i, keepdims=False)
                        bank = ext_traceable(sp_params, img)
                        if stereo:
                            img_r = jax.lax.dynamic_index_in_dim(images_right, i, keepdims=False)
                            bank_r = ext_right_traceable(sp_params, img_r)
                            m_lr = match_impl(sg_params, k_lr, bank, bank_r, True)
                            ridx = jnp.maximum(m_lr.idx1, 0)
                            rx = bank_r.kpts[ridx, 0]
                            dx = bank.kpts[:, 0] - rx
                            dy = jnp.abs(bank.kpts[:, 1] - bank_r.kpts[ridx, 1])
                            ok_lr = m_lr.valid & (dx > st_min_dx) & (dx < st_max_dx) & (dy <= st_max_dy)
                            u_right = jnp.where(ok_lr, rx, -1.0)
                            uvr = jnp.concatenate([bank.kpts, u_right[:, None]], axis=1)
                        else:
                            uvr = jnp.concatenate([bank.kpts, -jnp.ones((K, 1), jnp.float32)], axis=1)
                        m = match_impl(sg_params, k_m, ref_bank, bank, True)
                        posecol = (
                            jnp.zeros((K,), jnp.float32)
                            .at[0:9].set(R_last.reshape(-1))
                            .at[9:12].set(t_last)
                        )
                        snap_i = jnp.concatenate([snap[:, 0:5], posecol[:, None]], axis=1)
                        packed = fused_track_core(
                            k_pnp, m, uvr, snap_i, self.K_mat,
                            cam_c.fx, cam_c.fy, cam_c.cx, cam_c.cy, cam_c.bf,
                            topt_c.mono_point, topt_c.stereo_point,
                            rt_c.pnp_ransac_iterations, rt_c.pnp_reprojection_threshold,
                            min_match, max_jump,
                        )
                        n_match, n_inl = packed[0], packed[1]
                        R_cw = packed[2:11].reshape(3, 3)
                        t_cw = packed[11:14]
                        well = (n_match >= min_match) & (n_inl >= min_match)
                        R_wc = R_cw.T
                        t_wc = -R_cw.T @ t_cw
                        # keyframe policy (_add_keyframe_decision) against
                        # the HOST-refined last-keyframe pose — exact
                        # parity with the per-frame path
                        ang = jnp.arccos(jnp.clip((jnp.trace(kfR.T @ R_wc) - 1.0) * 0.5, -1.0, 1.0))
                        dist = jnp.linalg.norm(t_wc - kft)
                        is_kf = well & (
                            (n_inl < kf_c.max_num_match)
                            | (ang > kf_c.max_angle)
                            | (dist > kf_c.max_distance)
                            | (passed0 + i.astype(jnp.float32) >= kf_c.max_num_passed_frame)
                        )
                        if stereo:
                            out = jnp.concatenate([
                                packed[: 14 + K], u_right,
                                is_kf.astype(jnp.float32)[None],
                            ])
                        else:
                            out = jnp.concatenate([
                                packed[: 14 + K], is_kf.astype(jnp.float32)[None],
                            ])
                        outs = jax.lax.dynamic_update_slice(outs, out[None], (i, 0))
                        banks = jax.tree.map(
                            lambda buf, a: jax.lax.dynamic_update_slice(
                                buf, a[None].astype(buf.dtype), (i,) + (0,) * a.ndim),
                            banks, bank)
                        # stop: 1 = weak (row i NOT consumed by the host),
                        # 2 = keyframe (row i consumed; host inserts it)
                        stop = jnp.where(~well, 1, jnp.where(is_kf, 2, 0))
                        return (
                            key, i + 1, stop,
                            jnp.where(well, R_cw, R_last), jnp.where(well, t_cw, t_last),
                            outs, banks,
                        )

                    state = (key, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                             R_last0, t_last0, outs0, banks0)
                    key, i, stop, _R, _t, outs, banks = jax.lax.while_loop(cond, body, state)
                    # cut row's bank, packed exactly like _bank_pack —
                    # rides the one readback so a keyframe cut needs no
                    # separate _materialize_bank transfer
                    cut = jnp.maximum(i - 1, 0)
                    bank_cut = jax.tree.map(
                        lambda a: jax.lax.dynamic_index_in_dim(a, cut, keepdims=False), banks)
                    cut_pack = jnp.concatenate([
                        bank_cut.kpts.reshape(-1).astype(jnp.float32),
                        bank_cut.valid.astype(jnp.float32),
                        bank_cut.desc.reshape(-1).astype(jnp.float32),
                        bank_cut.scores.astype(jnp.float32),
                    ])
                    return key, jnp.concatenate([outs.reshape(-1), cut_pack]), banks

                return _chunk

            self._chunk_builder = _build_chunk if ext_traceable is not None else None
            self._chunk_kernels = {}

    # ------------------------------------------------------------------

    def reset_state(self) -> None:
        """Clear all per-sequence state, keep every compiled kernel (see
        Backend.reset_state — a rebuild retraces for tens of seconds)."""
        self.backend.reset_state()
        self._initialized = False
        self._init_bank = None
        self._init_time = None
        self._init_frame_id = None
        self._frame_counter = 0
        self._last_pose = np.eye(4, dtype=np.float32)
        self._last_bank = None
        self._last_track = None
        self._last_uvr = None
        self._last_u_right = None
        self._last_time = 0.0
        self._last_frame_id = -1
        self._last_track_well = False
        self._num_since_last_keyframe = 0
        self._lost_count = 0
        self._reloc_next_attempt = 0
        self._ref_slot = None
        self._ref_bank = None
        self._ref_frame_id = -1
        self._last_keyframe_pose = np.eye(4, dtype=np.float32)
        self._last_keyframe_frame_id = -1
        self._last_keyframe_time = 0.0
        self._rng = jax.random.PRNGKey(self.cfg.runtime.seed + 7)
        # re-seed the extractor/backend RNG streams too, so a reset run
        # reproduces a fresh engine (main_py.cpp's reset rebuilds
        # everything, re-seeding implicitly)
        if hasattr(self.extractor, "reset_state"):
            self.extractor.reset_state()

    def _next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def process(self, bank, timestamp: float, depth_lookup=None, bank_right=None,
                precomputed_match=None, precomputed_track=None) -> Optional[np.ndarray]:
        """One frame. ``bank``: FeatureBank (already extracted);
        ``bank_right``: right-image FeatureBank for the stereo path;
        ``precomputed_match``: optional Matches of (reference bank ->
        bank), supplied by the multi-sequence driver which batches the
        primary match across sequences. Returns the 4x4 keyframe pose
        when a keyframe was inserted, else None."""
        frame_id = self._frame_counter
        self._frame_counter += 1

        # The fused frame step covers the production neural paths (mono
        # AND stereo — the left-right match + disparity gate ride in the
        # same program); precomputed batched matches and local-map
        # tracking keep the two-program flow.
        use_fused = (
            self._fused_kernel is not None
            and (bank_right is None or self._fused_kernel_stereo is not None)
            and precomputed_match is None
            and not self.cfg.local_map_tracking.enabled
        )
        # uvr is a host array (np.asarray(kpts) is a device readback):
        # build it eagerly only where it is consumed — stereo init and
        # the unfused tracked path (the fused kernel RETURNS uvr in its
        # packed output instead).
        need_uvr = (bank_right is not None and not self._initialized) or (
            self._initialized and not use_fused and precomputed_track is None
        )
        uvr = self._stereo_uvr(bank, bank_right) if need_uvr else None

        if not self._initialized:
            if bank_right is not None:
                return self._init_stereo(bank, uvr, timestamp, frame_id)
            return self._try_initialize(bank, timestamp, frame_id, depth_lookup,
                                        precomputed_match=precomputed_match)

        pose_out = None
        min_match = self.cfg.keyframe.min_num_match

        if precomputed_track is not None:
            # batched multi-sequence track (parallel/multi_seq.py): the
            # driver already ran the vmapped fused core for all
            # sequences; adopt its lane unless tracking was weak — the
            # rare weak/promote path falls through to the per-sequence
            # legacy flow below.
            num_match, num_inliers, pose, frame_track, p_uvr = precomputed_track
            if num_match >= min_match and num_inliers >= min_match:
                if uvr is None:
                    uvr = p_uvr
                ref_frame_id = self._ref_frame_id
                if self.cfg.local_map_tracking.enabled:
                    pose, frame_track, num_inliers = self._track_local_map(
                        bank, pose, frame_track, num_inliers)
                return self._finish_tracked_frame(
                    bank, uvr, pose, frame_track, num_inliers, timestamp,
                    frame_id, ref_frame_id, depth_lookup)
            precomputed_track = None  # fall through to the legacy flow
            if uvr is None:
                uvr = self._stereo_uvr(bank, bank_right)

        if use_fused:
            num_match, num_inliers, pose, frame_track, uvr = self._track_frame_fused(bank, bank_right)
            if num_match < min_match:
                promoted = self._promote_last_frame(timestamp)
                if promoted is None:
                    return self._handle_lost(bank, timestamp, frame_id, depth_lookup, uvr=uvr)
                num_match, num_inliers, pose, frame_track, uvr = self._track_frame_fused(bank, bank_right)
            elif num_inliers < min_match:
                promoted = self._promote_last_frame(timestamp)
                if promoted is not None:
                    num_match, num_inliers, pose, frame_track, uvr = self._track_frame_fused(bank, bank_right)
            ref_frame_id = self._ref_frame_id
        else:
            with self.timer.span("match"):
                matches = precomputed_match if precomputed_match is not None else self.extractor.match(self._ref_bank, bank)
                num_match = int(matches.num_valid())

            ref_track = self.backend.store.kf_track[self._ref_slot]
            ref_frame_id = self._ref_frame_id

            def run_track(ref_track_arr, m: Matches):
                return self._track_frame(bank, uvr, ref_track_arr, m)

            if num_match < min_match:
                promoted = self._promote_last_frame(timestamp)
                if promoted is None:
                    return self._handle_lost(bank, timestamp, frame_id, depth_lookup, uvr=uvr)
                ref_track = self.backend.store.kf_track[self._ref_slot]
                ref_frame_id = self._ref_frame_id
                matches = self.extractor.match(self._ref_bank, bank)
                num_inliers, pose, frame_track = run_track(ref_track, matches)
            else:
                num_inliers, pose, frame_track = run_track(ref_track, matches)
                if num_inliers < min_match:
                    promoted = self._promote_last_frame(timestamp)
                    if promoted is not None:
                        ref_track = self.backend.store.kf_track[self._ref_slot]
                        ref_frame_id = self._ref_frame_id
                        matches = self.extractor.match(self._ref_bank, bank)
                        num_inliers, pose, frame_track = run_track(ref_track, matches)

        track_well = num_inliers >= self.cfg.keyframe.min_num_match
        if not track_well:
            return self._handle_lost(bank, timestamp, frame_id, depth_lookup, uvr=uvr)

        if self.cfg.local_map_tracking.enabled:
            pose, frame_track, num_inliers = self._track_local_map(bank, pose, frame_track, num_inliers)

        return self._finish_tracked_frame(
            bank, uvr, pose, frame_track, num_inliers, timestamp, frame_id,
            ref_frame_id, depth_lookup)

    def _finish_tracked_frame(self, bank, uvr, pose, frame_track, num_inliers,
                              timestamp, frame_id, ref_frame_id, depth_lookup):
        """Shared tail of a successfully tracked frame: keyframe decision
        + insertion, publishing, last-frame bookkeeping."""
        pose_out = None
        # keyframe decision (tracking.cc:913-958) — only when the ref
        # keyframe is still the latest keyframe.
        if self._add_keyframe_decision(pose, num_inliers, frame_id) and (
            ref_frame_id == self._last_keyframe_frame_id
        ):
            pose_out = self._insert_keyframe(bank, uvr, pose, frame_track, timestamp, frame_id, depth_lookup)

        # BA may have refined the pose of a just-inserted keyframe; carry
        # the optimized one forward (the reference mutates the shared
        # Frame object in Mapping's write-back).
        final_pose = pose_out if pose_out is not None else pose
        self._publish_tracked(final_pose, timestamp, pose_out is not None)
        self._after_track(bank, final_pose, timestamp, frame_id, track_well=True, track=frame_track, uvr=uvr)
        return pose_out

    def _publish_tracked(self, final_pose, timestamp, is_keyframe: bool) -> None:
        self.publisher.publish_frame_pose(FramePoseMessage(time=timestamp, pose=final_pose))
        if is_keyframe:
            st = self.backend.store
            if self.publisher.has_listeners("keyframe"):
                slots = st.keyframe_slots()
                n = len(slots)
                poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
                poses[:, :3, :3] = st.kf_R[slots]
                poses[:, :3, 3] = st.kf_t[slots]
                self.publisher.publish_keyframe(
                    KeyframeMessage(ids=st.kf_frame_id[slots].tolist(),
                                    poses=list(poses)))
            if self.publisher.has_listeners("map"):
                good = st.mp_good & ~st.mp_bad
                self.publisher.publish_map(
                    MapMessage(ids=np.nonzero(good)[0], points=st.mp_pos[good]))

    # ------------------------------------------------------------------
    # Multi-frame chunk tracking (see the chunk-kernel comment in
    # __init__): one dispatch + one packed readback per C frames.
    # ------------------------------------------------------------------

    def chunk_available(self) -> bool:
        # local-map tracking is a host-side refinement stage the chunk
        # kernel does not contain — chunking with it enabled would
        # silently drop the refinement, so fall back to per-frame.
        # Resolution buckets likewise: the chunk kernel extracts
        # in-program with the base rectify map and no pad masking, so
        # bucketed (variable-size) inputs must take the per-frame
        # bucketed extract path.
        return (
            self._chunk_builder is not None
            and self._initialized
            and self._ref_bank is not None
            and not self.cfg.local_map_tracking.enabled
            and getattr(self.extractor, "_buckets", None) is None
        )

    def process_chunk(self, images, timestamps, depth_lookups=None, n_valid=None,
                      images_right=None):
        """Track up to C frames in ONE device program.

        ``images``: (C, H, W) u8 stack; ``n_valid``: how many leading
        frames are real (the tail may be padding so every chunk length
        compiles the same program); ``images_right``: optional (C, H, W)
        right-camera stack — the chunk then also runs right extraction +
        left-right matching + disparity gating per frame (stereo).
        Returns ``(results, consumed)``: per-frame keyframe poses (None
        for tracked non-keyframes) for the first ``consumed`` frames.
        ``consumed < n_valid`` means frame ``consumed`` hit a
        weak-tracking event — its bank was NOT processed; the caller
        re-feeds it through the per-frame path (whose promote-keyframe
        recovery is host logic, tracking.cc:254-276)."""
        C = int(images.shape[0])
        n_valid = C if n_valid is None else int(n_valid)
        assert self.chunk_available()
        stereo = images_right is not None
        kern = self._chunk_kernels.get((C, stereo))
        if kern is None:
            kern = self._chunk_builder(C, stereo)
            self._chunk_kernels[(C, stereo)] = kern

        snap6 = self.fused_snapshot()
        R_last_cw = self._last_pose[:3, :3].T
        t_last_cw = -R_last_cw @ self._last_pose[:3, 3]
        kfp = self._last_keyframe_pose
        K = self.cfg.superpoint.capacity
        # one packed upload for everything scalar-sized (each separate
        # jnp.asarray is a relay round trip)
        scal = np.concatenate([
            snap6.reshape(-1).astype(np.float32),
            R_last_cw.reshape(-1).astype(np.float32), t_last_cw.astype(np.float32),
            kfp[:3, :3].reshape(-1).astype(np.float32), kfp[:3, 3].astype(np.float32),
            np.asarray([self._frame_counter - self._last_keyframe_frame_id,
                        n_valid], np.float32),
        ])
        ref_bank = _resolve_bank(self._ref_bank)
        with self.timer.span("track"):
            args = (
                self.extractor.sp_params, self.extractor.sg_params, self._rng,
                ref_bank, jnp.asarray(scal), jnp.asarray(images),
            )
            if stereo:
                args = args + (jnp.asarray(images_right),)
            self._rng, flat_d, banks = kern(*args)
            flat = np.asarray(flat_d)  # ONE readback for the whole chunk
        row_w = (15 + 2 * K) if stereo else (15 + K)
        outs = flat[: C * row_w].reshape(C, row_w)
        cut_pack = flat[C * row_w :]
        D = (len(cut_pack) - 4 * K) // K
        cut_mat = (
            cut_pack[: 2 * K].reshape(K, 2).astype(np.float32),
            cut_pack[2 * K : 3 * K] > 0.5,
            cut_pack[3 * K : 3 * K + K * D].reshape(K, D).astype(np.float32),
            cut_pack[3 * K + K * D :].astype(np.float32),
        )
        min_match = self.cfg.keyframe.min_num_match
        results = []
        consumed = 0
        for j in range(n_valid):
            row = outs[j]
            num_match = int(row[0])
            if _DEBUG_TRACK:
                print(f"# chunk row j={j} fid={self._frame_counter + j} "
                      f"num_match={num_match} n_inl={int(row[1])} "
                      f"is_kf={row[(14 + 2 * K) if stereo else (14 + K)] > 0.5}",
                      flush=True)
            if num_match < 0:
                break  # the device loop cut before this row
            n_inl = int(row[1])
            if (num_match < min_match or n_inl < min_match
                    or not np.all(np.isfinite(row[2:14]))):
                # weak or ill-conditioned (same non-finite guard as
                # parse_fused_packed): caller re-feeds frame j per-frame
                break
            is_kf = row[(14 + 2 * K) if stereo else (14 + K)] > 0.5
            u_right = row[14 + K : 14 + 2 * K].astype(np.float32) if stereo else None
            frame_track = row[14 : 14 + K].astype(np.int32)
            R_cw = row[2:11].reshape(3, 3)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R_cw.T
            pose[:3, 3] = -R_cw.T @ row[11:14]
            fid = self._frame_counter
            self._frame_counter += 1
            ts = timestamps[j]
            pose_out = None
            if is_kf:
                bank_j = _LazyBankSlice(banks, j).resolve()
                dl = depth_lookups[j] if depth_lookups is not None else None
                # the kernel packed THIS row's bank into the chunk
                # readback (the loop cuts at the keyframe row, so the
                # cut pack is row j's) — no second materialize transfer
                pose_out = self._insert_keyframe(
                    bank_j, None, pose, frame_track, ts, fid, dl, set_ref=True,
                    u_right=u_right, materialized=cut_mat)
            final_pose = pose_out if pose_out is not None else pose
            self._publish_tracked(final_pose, ts, pose_out is not None)
            self._after_track(_LazyBankSlice(banks, j), final_pose, ts, fid,
                              track_well=True, track=frame_track, u_right=u_right)
            results.append(pose_out)
            consumed += 1
            if is_kf:
                break  # chunk cut at the keyframe; next chunk sees fresh state
        weak = (
            consumed < n_valid
            and outs[consumed][0] >= 0
            and (outs[consumed][0] < min_match or outs[consumed][1] < min_match
                 or not np.all(np.isfinite(outs[consumed][2:14])))
        )
        if weak:
            # hand the weak frame's bank to the caller for the per-frame
            # retry (its extraction already ran on device)
            return results, consumed, _LazyBankSlice(banks, consumed)
        return results, consumed, None

    # ------------------------------------------------------------------
    # Stereo association (Frame::AddRightFeatures, frame.cc:95-126)
    # ------------------------------------------------------------------

    def _stereo_uvr(self, bank, bank_right) -> np.ndarray:
        """(K, 3) per-left-feature [u, v, u_right]; u_right = -1 when no
        gated stereo match. Disparity band gates from the calibration:
        bf/depth_upper < dx < bf/depth_lower, |dy| <= max_y_diff."""
        K = bank.capacity
        kpts = np.asarray(bank.kpts)
        uvr = np.concatenate([kpts, -np.ones((K, 1), np.float32)], axis=1)
        if bank_right is None:
            return uvr
        m = self.extractor.match(bank, bank_right)
        idx1 = np.asarray(m.idx1)
        valid = np.asarray(m.valid)
        right_k = np.asarray(bank_right.kpts)
        cam = self.camera
        min_dx = cam.bf / cam.depth_upper_thr
        max_dx = cam.bf / cam.depth_lower_thr
        src = np.nonzero(valid)[0]
        rx = right_k[idx1[src], 0]
        ry = right_k[idx1[src], 1]
        dx = kpts[src, 0] - rx
        dy = np.abs(kpts[src, 1] - ry)
        ok = (dx > min_dx) & (dx < max_dx) & (dy <= cam.max_y_diff)
        uvr[src[ok], 2] = rx[ok]
        return uvr

    def _init_stereo(self, bank, uvr, timestamp, frame_id) -> Optional[np.ndarray]:
        """Single-frame stereo initialization (InitStereo,
        tracking.cc:650-709): needs >=150 features and >=100 gated stereo
        points; all stereo points become map points immediately."""
        valid = np.asarray(bank.valid)
        if valid.sum() < 150:
            return None
        stereo_ok = valid & (uvr[:, 2] > 0)
        if stereo_ok.sum() < 100:
            return None
        pose = np.eye(4, dtype=np.float32)
        frame_track = np.full(bank.capacity, -1, np.int32)
        # backend seeds stereo mappoints from disparity (insert_keyframe)
        out = self._insert_keyframe(bank, uvr, pose, frame_track, timestamp, frame_id, None)
        self._initialized = True
        st = self.backend.store
        slot = st.frame_id_to_slot[frame_id]
        frame_track = st.kf_track[slot].copy()
        self._after_track(bank, pose, timestamp, frame_id, track_well=True, track=frame_track, uvr=uvr)
        self._num_since_last_keyframe = 0
        return pose

    # ------------------------------------------------------------------
    # Initialization (tracking.cc:379-648)
    # ------------------------------------------------------------------

    def _try_initialize(self, bank, timestamp, frame_id, depth_lookup=None, precomputed_match=None) -> Optional[np.ndarray]:
        n_feat = int(bank.num_valid())
        init_cfg = self.cfg.initializer

        if depth_lookup is not None:
            # RGB-D: single-frame init (tracking.cc:412-478)
            return self._init_rgbd(bank, timestamp, frame_id, depth_lookup)

        if self._init_bank is None:
            if n_feat < init_cfg.min_features_first:
                return None
            self._init_bank = bank
            self._init_time = timestamp
            self._init_frame_id = frame_id
            return None

        if timestamp - self._init_time > init_cfg.reseed_time:
            # re-seed (tracking.cc:500-513)
            if n_feat < 300:
                self._init_bank = None
                return None
            self._init_bank = bank
            self._init_time = timestamp
            self._init_frame_id = frame_id
            return None

        if precomputed_match is None and self._fused_init is not None:
            # ONE dispatch + ONE packed readback per init attempt
            K = bank.capacity
            flat = np.asarray(self._fused_init(
                self.extractor.sg_params, self._next_key(), self._init_bank, bank))
            success = flat[0] > 0.5
            R21 = flat[1:10].reshape(3, 3)
            t21 = flat[10:13]
            idx1 = flat[13 : 13 + K].astype(np.int32)
            tri = flat[13 + 2 * K : 13 + 3 * K] > 0.5
            X = flat[13 + 3 * K :].reshape(K, 3)
            # bank keypoints ride the packed bank materialization below
            # only on success; until then nothing else crosses the link
            n_tri = int(tri.sum())
            if not success or n_tri < self.cfg.initializer.min_matches:
                return None
            kpts0, valid0, desc0, scores0 = self._materialize_bank(self._init_bank)
            kpts1, valid1b, desc1, scores1 = self._materialize_bank(bank)
            p1 = kpts0
        else:
            matches = precomputed_match if precomputed_match is not None else self.extractor.match(self._init_bank, bank)
            # build padded match-pair arrays
            idx1 = np.asarray(matches.idx1)
            valid = np.asarray(matches.valid)
            K = idx1.shape[0]
            p1 = np.asarray(self._init_bank.kpts)
            kpts1 = np.asarray(bank.kpts)
            p2 = kpts1[np.maximum(idx1, 0)]
            res = self._init_kernel(self._next_key(), jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid))
            n_tri = int(res.triangulated.sum())
            if not bool(res.success) or n_tri < self.cfg.initializer.min_matches:
                return None
            X = np.asarray(res.points3d)
            tri = np.asarray(res.triangulated)
            R21 = np.asarray(res.R21)
            t21 = np.asarray(res.t21)
            kpts0, valid0 = p1, np.asarray(self._init_bank.valid)
            desc0, scores0 = np.asarray(self._init_bank.desc), np.asarray(self._init_bank.scores)
            valid1b = np.asarray(bank.valid)
            desc1, scores1 = np.asarray(bank.desc), np.asarray(bank.scores)

        # scale = 4.0 / median depth (tracking.cc:578-588)
        depths = np.sort(X[tri][:, 2])
        med = depths[(len(depths) - 1) // 2]
        scale = float(self.cfg.initializer.median_depth_scale) / max(med, 1e-6)
        Xw = X * scale  # world == first camera frame
        t21 = t21 * scale
        # T_wc2 = inv(T21) since world == cam1
        R_wc2 = R21.T
        t_wc2 = -R21.T @ t21

        st = self.backend.store
        # first keyframe (identity, fixed). Keypoint slots are valid for
        # ALL detected features (observations reference a subset; other
        # slots stay available for later association) — masking with the
        # triangulation mask is wrong for the SECOND frame, whose
        # observation slots live in bank-1 index space (feat2 = idx1[...])
        # while `tri` indexes bank-0 pairs; the mismatch zeroed some
        # observed keypoints and cost inlier observations on the neural
        # path (identity-matched oracle tests could not see it).
        uvr1 = np.concatenate([p1, -np.ones((K, 1), np.float32)], axis=1)
        slot0 = st.alloc_keyframe(self._init_frame_id, self._init_time, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), uvr1, valid0,
                                  desc=desc0, scores=scores0)
        mp_ids = st.alloc_mappoints(int(tri.sum()))
        st.mp_pos[mp_ids] = Xw[tri]
        st.mp_good[mp_ids] = True
        st.add_observations(slot0, mp_ids, np.nonzero(tri)[0])
        st.snapshot_keyframe_geometry(slot0)

        # second keyframe
        uvr2 = np.concatenate([kpts1, -np.ones((K, 1), np.float32)], axis=1)
        slot1 = st.alloc_keyframe(frame_id, timestamp, R_wc2.astype(np.float32), t_wc2.astype(np.float32), uvr2,
                                  valid1b, desc=desc1, scores=scores1)
        # observed feature slots in frame2 are idx1 of the matched slots
        feat2 = idx1[np.nonzero(tri)[0]]
        st.add_observations(slot1, mp_ids, feat2)
        st.snapshot_keyframe_geometry(slot1)
        # representative descriptors for the init-born mappoints
        # (mapping.cc:207-258 runs on every insertion; this path builds
        # the two init keyframes directly on the store and used to skip
        # it — init points never re-observed then kept ZERO descriptors,
        # which poisoned loop/relocalization retrieval-verification on
        # the neural path: 85/86 candidate rows zero-norm, 1 NN match)
        st.update_descriptors(mp_ids)

        # frame track table for the new frame
        frame_track = np.full(K, -1, np.int32)
        frame_track[feat2] = mp_ids

        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R_wc2
        pose[:3, 3] = t_wc2

        self._initialized = True
        self._ref_slot = slot1
        self._ref_bank = bank
        self._ref_frame_id = frame_id
        self._last_keyframe_pose = pose
        self._last_keyframe_frame_id = frame_id
        self._last_keyframe_time = timestamp
        self._after_track(bank, pose, timestamp, frame_id, track_well=True, track=frame_track)
        self._num_since_last_keyframe = 0
        return pose

    def _init_rgbd(self, bank, timestamp, frame_id, depth_lookup) -> Optional[np.ndarray]:
        K = bank.capacity
        valid = np.asarray(bank.valid)
        if valid.sum() < 250:
            return None
        kpts = np.asarray(bank.kpts)
        d = depth_lookup(kpts)  # (K,) metric depth, <=0 invalid
        good = valid & (d > self.camera.depth_lower_thr) & (d < self.camera.depth_upper_thr)
        if good.sum() < 100:
            return None
        st = self.backend.store
        uvr = np.concatenate([kpts, -np.ones((K, 1), np.float32)], axis=1)
        slot = st.alloc_keyframe(frame_id, timestamp, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), uvr, valid,
                                 desc=np.asarray(bank.desc),
                                 scores=np.asarray(bank.scores))
        rays = np.stack(
            [
                (kpts[:, 0] - self.camera.cx) / self.camera.fx,
                (kpts[:, 1] - self.camera.cy) / self.camera.fy,
                np.ones(K, np.float32),
            ],
            axis=1,
        )
        Xw = rays * d[:, None]
        mp_ids = st.alloc_mappoints(int(good.sum()))
        st.mp_pos[mp_ids] = Xw[good]
        st.mp_good[mp_ids] = True
        st.add_observations(slot, mp_ids, np.nonzero(good)[0])
        st.snapshot_keyframe_geometry(slot)
        # same init-descriptor fix as _try_initialize (zero mp_desc rows
        # poisoned loop/reloc verification for init-only points)
        st.update_descriptors(mp_ids)

        frame_track = np.full(K, -1, np.int32)
        frame_track[np.nonzero(good)[0]] = mp_ids

        pose = np.eye(4, dtype=np.float32)
        self._initialized = True
        self._ref_slot = slot
        self._ref_bank = bank
        self._ref_frame_id = frame_id
        self._last_keyframe_pose = pose
        self._last_keyframe_frame_id = frame_id
        self._last_keyframe_time = timestamp
        self._after_track(bank, pose, timestamp, frame_id, track_well=True, track=frame_track)
        self._num_since_last_keyframe = 0
        return pose

    # ------------------------------------------------------------------
    # Tracking (TrackFrame + FramePoseOptimization)
    # ------------------------------------------------------------------

    def _track_frame(self, bank, uvr, ref_track: np.ndarray, matches: Matches):
        st = self.backend.store
        idx1 = np.asarray(matches.idx1)
        mvalid = np.asarray(matches.valid)
        K = idx1.shape[0]

        # candidate mappoints via the reference keyframe's track table.
        # LIVE ids (untriangulated included) propagate so points can
        # accumulate observers and triangulate at later keyframes
        # (tracking.cc:723-728); only triangulated (Good) ones become 3D
        # constraints for the pose solve.
        cand_mp = np.where(mvalid, ref_track, -1)
        safe = np.maximum(cand_mp, 0)
        cand_live = mvalid & (cand_mp >= 0) & ~st.mp_bad[safe]
        cand_ok = cand_live & st.mp_good[safe]

        # per-current-frame-slot correspondence arrays
        X = np.zeros((K, 3), np.float32)
        uv = np.zeros((K, 3), np.float32)
        uv[:, 2] = -1.0
        valid = np.zeros(K, bool)
        mp_of_slot = np.full(K, -1, np.int32)
        src_live = np.nonzero(cand_live)[0]
        mp_of_slot[idx1[src_live]] = cand_mp[src_live]
        src = np.nonzero(cand_ok)[0]
        dst = idx1[src]
        X[dst] = st.mp_pos[cand_mp[src]]
        uv[dst] = uvr[dst]
        valid[dst] = True

        R_last_cw = self._last_pose[:3, :3].T
        t_last_cw = -R_last_cw @ self._last_pose[:3, 3]
        with self.timer.span("track"):
            res = self._track_kernel(
                self._next_key(), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
                jnp.asarray(R_last_cw), jnp.asarray(t_last_cw),
            )
            n_inl = int(res.n_inliers)
        if n_inl >= self.cfg.keyframe.min_num_match:
            R_cw = np.asarray(res.R_cw)
            t_cw = np.asarray(res.t_cw)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R_cw.T
            pose[:3, 3] = -R_cw.T @ t_cw
            inl = np.asarray(res.inliers)
            # Pose-jump guard: the reference hard-rejects |dt| > 0.5 m
            # between consecutive frames for stereo (tracking.cc:800-818,
            # mono variant commented out). With very permissive inlier
            # gates (aqua ships min_num_match=1) a couple of wrong
            # correspondences can teleport the PnP prior and pose-opt
            # then polishes a garbage basin. Declaring a hard tracking
            # failure here is worse than the disease (the promote-
            # keyframe recovery inserts a keyframe at a weak-geometry
            # moment and corrupts the map); instead re-refine seeded at
            # the last frame's pose — genuine motion survives the
            # re-refinement, a teleport does not — and only fail if the
            # rescue also jumps.
            max_jump = 4.0 * self.cfg.keyframe.max_distance
            jump = float(np.linalg.norm(pose[:3, 3] - self._last_pose[:3, 3]))
            if not np.isfinite(jump) or jump > max_jump:
                res2 = self._track_kernel_nopnp(
                    jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
                    jnp.asarray(R_last_cw), jnp.asarray(t_last_cw),
                )
                n2 = int(res2.n_inliers)
                R2 = np.asarray(res2.R_cw)
                t2 = np.asarray(res2.t_cw)
                pose2 = np.eye(4, dtype=np.float32)
                pose2[:3, :3] = R2.T
                pose2[:3, 3] = -R2.T @ t2
                jump2 = float(np.linalg.norm(pose2[:3, 3] - self._last_pose[:3, 3]))
                if np.isfinite(jump2) and jump2 <= max_jump and n2 >= self.cfg.keyframe.min_num_match:
                    n_inl = n2
                    pose = pose2
                    inl = np.asarray(res2.inliers)
                else:
                    n_inl = 0
                    pose = self._last_pose.copy()
                    inl = np.zeros(K, bool)
        else:
            pose = self._last_pose.copy()
            inl = np.zeros(K, bool)

        # chi2 classification applies only to 3D-constrained slots;
        # matched untriangulated ids survive (tracking.cc:896-911)
        track_ok = np.where(valid, inl, mp_of_slot >= 0)
        if n_inl < self.cfg.keyframe.min_num_match:
            track_ok[:] = False
        frame_track = np.where(track_ok, mp_of_slot, -1).astype(np.int32)
        return n_inl, pose, frame_track

    def fused_snapshot(self) -> np.ndarray:
        """(K, 6) f32 host-side input of the fused frame step: candidate
        mappoint positions/flags/track ids for the reference keyframe +
        the last pose (numpy gathers over the store — microseconds).
        Public so the multi-sequence driver can batch these across
        sequences for its vmapped track program."""
        st = self.backend.store
        ref_track = st.kf_track[self._ref_slot]
        safe = np.maximum(ref_track, 0)
        live = (ref_track >= 0) & ~st.mp_bad[safe]
        ok = live & st.mp_good[safe]
        K = ref_track.shape[0]
        snap = np.zeros((K, 6), np.float32)
        snap[:, 0:3] = st.mp_pos[safe]
        # 2 = triangulated candidate (3D usable), 1 = live id to carry
        # forward (untriangulated), 0 = none — see fused_track_core
        snap[:, 3] = live.astype(np.float32) + ok.astype(np.float32)
        snap[:, 4] = ref_track
        R_last_cw = self._last_pose[:3, :3].T
        snap[0:9, 5] = R_last_cw.reshape(-1)
        snap[9:12, 5] = -R_last_cw @ self._last_pose[:3, 3]
        return snap

    def parse_fused_packed(self, arr: np.ndarray):
        """Decode a fused-step packed vector (host array) into
        (num_match, n_inliers, pose T_wc, frame_track, uvr), applying the
        weak-tracking fallback to the last pose (_track_frame semantics)."""
        K = self.cfg.superpoint.capacity
        num_match = int(arr[0])
        n_inl = int(arr[1])
        # view, not copy: arr is an owned f32 host array (one per frame)
        uvr = arr[14 + K : 14 + 4 * K].reshape(K, 3)
        if n_inl >= self.cfg.keyframe.min_num_match and np.all(np.isfinite(arr[2:14])):
            R_cw = arr[2:11].reshape(3, 3)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R_cw.T
            pose[:3, 3] = -R_cw.T @ arr[11:14]
            frame_track = arr[14 : 14 + K].astype(np.int32)
        else:
            pose = self._last_pose.copy()
            frame_track = np.full(K, -1, np.int32)
        return num_match, n_inl, pose, frame_track, uvr

    def _track_frame_fused(self, bank, bank_right=None):
        """Host half of the fused frame step: ONE kernel dispatch, ONE
        packed readback (see fused_snapshot/parse_fused_packed)."""
        snap = self.fused_snapshot()
        with self.timer.span("track"):
            if bank_right is not None:
                self._rng, packed = self._fused_kernel_stereo(
                    self.extractor.sg_params, self._rng, self._ref_bank, bank,
                    jnp.asarray(snap), bank_right,
                )
            else:
                self._rng, packed = self._fused_kernel(
                    self.extractor.sg_params, self._rng, self._ref_bank, bank, jnp.asarray(snap)
                )
            arr = np.asarray(packed)
        if _DEBUG_TRACK:
            print(f"# frame fid={self._frame_counter} num_match={int(arr[0])} "
                  f"n_inl={int(arr[1])}", flush=True)
        return self.parse_fused_packed(arr)

    def _track_local_map(self, bank, pose, frame_track, num_inliers):
        """Optional: associate covisibility-local map points by projection
        and refine the pose on the expanded correspondence set."""
        st = self.backend.store
        if st.mp_desc is None or self._ref_slot is None:
            return pose, frame_track, num_inliers
        window = st.window_frames(self._ref_slot, self.cfg.backend.window_opt_frames)
        tracks = st.kf_track[window]
        mp_ids = np.unique(tracks[tracks >= 0])
        mp_ids = mp_ids[st.mp_good[mp_ids] & ~st.mp_bad[mp_ids]]
        cap = bank.capacity
        if len(mp_ids) == 0:
            return pose, frame_track, num_inliers
        mp_ids = mp_ids[:cap]
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, st.cfg.descriptor_dim), np.float32)
        valid = np.zeros(cap, bool)
        pos[: len(mp_ids)] = st.mp_pos[mp_ids]
        desc[: len(mp_ids)] = st.mp_desc[mp_ids].astype(np.float32)
        valid[: len(mp_ids)] = True
        R_cw = pose[:3, :3].T
        t_cw = -R_cw @ pose[:3, 3]
        matches, res = self._local_map_kernel(
            jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid), bank
        )
        n_inl = int(res.n_inliers)
        if n_inl <= num_inliers:
            return pose, frame_track, num_inliers
        R_cw2 = np.asarray(res.R_cw)
        new_pose = np.eye(4, dtype=np.float32)
        new_pose[:3, :3] = R_cw2.T
        new_pose[:3, 3] = -R_cw2.T @ np.asarray(res.t_cw)
        # extend the frame's track table with the new associations
        feat_idx = np.asarray(matches.feat_idx)
        ok = np.asarray(matches.valid) & np.asarray(res.inliers)
        new_track = frame_track.copy()
        sel = np.nonzero(ok[: len(mp_ids)])[0]
        slots = feat_idx[sel]
        fresh = new_track[slots] < 0
        new_track[slots[fresh]] = mp_ids[sel[fresh]]
        return new_pose, new_track, n_inl

    def _promote_last_frame(self, timestamp):
        """Tracking-loss fallback: make the last frame a keyframe
        (tracking.cc:254-276)."""
        if self._num_since_last_keyframe < 1 or not self._last_track_well or self._last_bank is None:
            return None
        slot = self._insert_keyframe(
            _resolve_bank(self._last_bank), self._last_uvr, self._last_pose, self._last_track,
            self._last_time, self._last_frame_id, None, set_ref=True,
            u_right=self._last_u_right,
        )
        return slot

    def _add_keyframe_decision(self, pose, num_match, frame_id) -> bool:
        kf = self.cfg.keyframe
        last = self._last_keyframe_pose
        dR = last[:3, :3].T @ pose[:3, :3]
        # host-side 3x3 angle: dispatching a device kernel for this cost
        # a full host->device->host round trip EVERY tracked frame
        # (~24 ms through the dev relay; ~0.1 ms even locally)
        angle = float(np.arccos(np.clip((np.trace(dR) - 1.0) * 0.5, -1.0, 1.0)))
        dist = float(np.linalg.norm(pose[:3, 3] - last[:3, 3]))
        passed = frame_id - self._last_keyframe_frame_id
        return (
            num_match < kf.max_num_match
            or angle > kf.max_angle
            or dist > kf.max_distance
            or passed >= kf.max_num_passed_frame
        )

    def _materialize_bank(self, bank):
        """(kpts, valid, desc, scores) as host arrays — ONE device
        transfer via the packer on the neural path (separate readbacks
        cost one round trip each); plain asarray for host-side banks.
        Scores ride along so keyframes persist them (adopt_map needs
        real detection scores to reconstruct a reference bank the
        SuperGlue keypoint encoder was trained on)."""
        K = bank.capacity
        D = bank.desc.shape[-1]
        if self._bank_pack is not None and not isinstance(bank.kpts, np.ndarray):
            arr = np.asarray(self._bank_pack(bank))
            kpts = arr[: 2 * K].reshape(K, 2).astype(np.float32)
            valid = arr[2 * K : 3 * K] > 0.5
            desc = arr[3 * K : 3 * K + K * D].reshape(K, D).astype(np.float32)
            scores = arr[3 * K + K * D :].astype(np.float32)
            return kpts, valid, desc, scores
        return (np.asarray(bank.kpts), np.asarray(bank.valid), np.asarray(bank.desc),
                np.asarray(bank.scores))

    def _insert_keyframe(self, bank, uvr, pose, frame_track, timestamp, frame_id, depth_lookup, set_ref=True,
                         u_right=None, materialized=None):
        """InsertKeyframe (tracking.cc:962-995 + Mapping::InsertKeyframe).
        ``u_right``: optional (K,) gated right-x column (stereo chunk
        rows carry it instead of a full uvr). ``materialized``: optional
        pre-fetched ``(kpts, valid, desc, scores)`` tuple — callers that
        already paid the packed readback (relocalization's retrieval
        stage) pass it through instead of a second ~24 ms transfer."""
        st = self.backend.store
        if frame_id in st.frame_id_to_slot:
            return None
        K = bank.capacity
        kpts, valid, desc_h, scores_h = (
            materialized if materialized is not None else self._materialize_bank(bank))
        if uvr is None and u_right is not None:
            uvr = np.concatenate([kpts, u_right[:, None]], axis=1)
        if uvr is None:
            uvr = np.concatenate([kpts, -np.ones((K, 1), np.float32)], axis=1)
        depth = depth_lookup(kpts) if depth_lookup is not None else None
        track = frame_track if frame_track is not None else np.full(K, -1, np.int32)
        with self.timer.span("keyframe_ba"):
            slot, (R_opt, t_opt) = self.backend.insert_keyframe(
                frame_id, timestamp, pose[:3, :3], pose[:3, 3], uvr, valid, track, depth,
                desc=desc_h, scores=scores_h,
            )
        if self.cfg.backend.loop_closure:
            with self.timer.span("loop_detect"):
                self.backend.detect_loop(slot, desc_h, kpts, valid)
        opt_pose = np.eye(4, dtype=np.float32)
        opt_pose[:3, :3] = R_opt
        opt_pose[:3, 3] = t_opt
        if set_ref:
            self._ref_slot = slot
            self._ref_bank = bank
            self._ref_frame_id = frame_id
            self._last_keyframe_pose = opt_pose
            self._last_keyframe_frame_id = frame_id
            self._last_keyframe_time = timestamp
            self._num_since_last_keyframe = 0
        return opt_pose

    def _after_track(self, bank, pose, timestamp, frame_id, track_well, track=None, uvr=None,
                     u_right=None):
        if pose is not None:
            self._last_pose = pose
        self._last_bank = bank
        self._last_track = track if track is not None else np.full(bank.capacity, -1, np.int32)
        # uvr stays lazy (None) on the fused path: materializing it here
        # is a per-frame device readback, and only the promote-fallback /
        # keyframe paths consume it (they build it from the bank then).
        # The stereo chunk instead records the gated u_right column from
        # its packed row (host data, no readback) so a later
        # promote-last-frame keyframe keeps its stereo depth seeds.
        self._last_uvr = uvr
        self._last_u_right = u_right if uvr is None else None
        self._last_time = timestamp
        self._last_frame_id = frame_id
        self._last_track_well = track_well
        self._num_since_last_keyframe += 1
        self._lost_count = 0 if track_well else self._lost_count
        if track_well:
            self._reloc_next_attempt = 0

    def adopt_map(self) -> None:
        """Enter LOCALIZATION mode against the backend's current map
        (typically one loaded from a snapshot): the tracker starts
        initialized with the newest stored keyframe as its reference —
        its feature bank reconstructed from the store's per-keyframe
        descriptor banks — and relocalization pre-armed, so the first
        frame either tracks against that keyframe directly (resume) or
        re-anchors anywhere in the map via Backend.relocalize
        (kidnapped-robot start). No reference analog: the reference has
        no map persistence at all (SURVEY §5)."""
        st = self.backend.store
        slots = st.keyframe_slots()
        if len(slots) == 0:
            raise ValueError("adopt_map: the map has no keyframes")
        newest = int(slots[np.argmax(st.kf_frame_id[slots])])
        bank_np = st.kf_desc.get(newest)
        if bank_np is None:
            raise ValueError("adopt_map: map was stored without descriptor banks")
        from ur_mvo_tpu.ops.keypoints import FeatureBank

        desc = bank_np.astype(np.float32)
        valid = np.linalg.norm(desc, axis=1) > 0.5  # unit rows = real features
        # real detection scores when persisted: the SuperGlue keypoint
        # encoder consumes scores and saw small probabilities in
        # training, so all-ones would be out-of-distribution
        sc = st.kf_scores.get(newest)
        scores = (sc.astype(np.float32) * valid) if sc is not None else valid.astype(np.float32)
        self._ref_bank = FeatureBank(
            scores=jnp.asarray(scores),
            kpts=jnp.asarray(st.kf_kpts[newest, :, :2].astype(np.float32)),
            desc=jnp.asarray(desc),
            valid=jnp.asarray(valid),
        )
        self._ref_slot = newest
        self._ref_frame_id = int(st.kf_frame_id[newest])
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = st.kf_R[newest]
        pose[:3, 3] = st.kf_t[newest]
        self._last_keyframe_pose = pose
        self._last_keyframe_frame_id = self._ref_frame_id
        self._last_keyframe_time = float(st.kf_timestamp[newest])
        self._last_pose = pose.copy()
        self._last_track_well = False
        # new frame ids must not collide with the stored sessions'
        self._frame_counter = int(st.kf_frame_id[slots].max()) + 1
        # pre-arm relocalization: a view that cannot be tracked against
        # the newest keyframe re-anchors on the FIRST lost frame
        self._lost_count = max(0, self.cfg.backend.reloc_after_failures - 1)
        self._initialized = True

    def _handle_lost(self, bank, timestamp, frame_id, depth_lookup=None, uvr=None):
        """Shared tail of a frame that could not be tracked: after
        ``reloc_after_failures`` consecutive losses, attempt to re-anchor
        into the existing map (config ``backend.relocalization``). A
        FAILED attempt backs off for another ``reloc_after_failures``
        losses before retrying — in marginal scenes where tracking
        flickers, an every-frame reloc attempt (~26 ms host + device
        round trips each) dominated the frame budget (measured: 27
        attempts over a 40-frame tiny-resolution run)."""
        self._lost_count += 1
        bcfg = self.cfg.backend
        if (bcfg.relocalization and self._initialized
                and self._lost_count >= bcfg.reloc_after_failures
                and self._lost_count >= self._reloc_next_attempt):
            out = self._relocalize(bank, timestamp, frame_id, depth_lookup, uvr=uvr)
            if out is not None:
                self._lost_count = 0
                self._reloc_next_attempt = 0
                return out
            self._reloc_next_attempt = self._lost_count + bcfg.reloc_after_failures
        self._after_track(bank, None, timestamp, frame_id, track_well=False, uvr=uvr)
        return None

    def _relocalize(self, bank, timestamp, frame_id, depth_lookup=None, uvr=None):
        """Recover from tracking loss by re-anchoring into the existing
        map (Backend.relocalize): the current frame enters as a keyframe
        observing the PnP-verified mappoints and becomes the new
        reference — trajectory and map stay in ONE world frame, where
        the reference's only recovery is the promote-keyframe retry
        (``tracking.cc:254-276``)."""
        with self.timer.span("relocalize"):
            mat = self._materialize_bank(bank)
            kpts, valid, desc_h, _scores = mat
            res = self.backend.relocalize(desc_h, kpts, valid)
        if res is None:
            return None
        pose, frame_track, _n_inl = res
        pose_out = self._insert_keyframe(
            bank, uvr, pose, frame_track, timestamp, frame_id, depth_lookup, set_ref=True,
            materialized=mat)
        final = pose_out if pose_out is not None else pose
        self._publish_tracked(final, timestamp, pose_out is not None)
        self._after_track(bank, final, timestamp, frame_id, track_well=True,
                          track=frame_track, uvr=uvr)
        return pose_out

    # ------------------------------------------------------------------

    @property
    def initialized(self) -> bool:
        return self._initialized

    def current_pose(self) -> np.ndarray:
        return self._last_pose.copy()
