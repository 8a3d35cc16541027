"""Mapping backend: keyframe insertion, triangulation, windowed BA.

Orchestration parity with the reference's ``Mapping``
(``/root/reference/src/mapping.cc``): per keyframe — create mappoints for
unmatched features (``:60-111``), multi-view triangulate once a point has
>2 observers (``:151-205``), covisibility-window local BA with <=15
optimizable + <=20 extra fixed frames (``:260-322, 386-403``), outlier
observation removal with covisibility decay (``:474-501, 550-603``).

All numeric work runs in the jitted device kernels
(``ops/triangulation.py``, ``ops/ba.py``); this module does vectorized
numpy gathers between the store and those kernels. BA problems are padded
to the capacities in ``BackendConfig`` so the solver compiles once.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.camera import Camera
from ur_mvo_tpu.config import BackendConfig, OptimizationConfig
from ur_mvo_tpu.ops.ba import BAConfig, BAProblem, bundle_adjust
from ur_mvo_tpu.ops.triangulation import triangulate_bearings
from ur_mvo_tpu.runtime.map_store import MapStore, StoreConfig


class Backend:
    def __init__(
        self,
        camera: Camera,
        backend_cfg: BackendConfig,
        opt_cfg: OptimizationConfig,
        store: Optional[MapStore] = None,
        keypoints_per_frame: int = 1024,
    ):
        self.camera = camera
        self.cfg = backend_cfg
        self.opt_cfg = opt_cfg
        self.store = store or MapStore(
            StoreConfig(
                max_keyframes=backend_cfg.max_keyframes,
                max_mappoints=backend_cfg.max_mappoints,
                keypoints_per_frame=keypoints_per_frame,
            )
        )
        @jax.jit
        def _tri_batch(origins, bearings, valid):
            # packed (N, 4) [xyz | ok] output: ONE device readback per
            # keyframe instead of two (each d2h sync is a ~24 ms round
            # trip through the dev relay)
            pts, ok = jax.vmap(triangulate_bearings)(origins, bearings, valid)
            return jnp.concatenate([pts, ok[:, None].astype(jnp.float32)], axis=1)

        self._tri_batch = _tri_batch
        ba_cfg = BAConfig(
            chi2_mono=opt_cfg.mono_point,
            chi2_stereo=opt_cfg.stereo_point,
            iters_phase1=backend_cfg.ba_iterations_phase1,
            iters_phase2=backend_cfg.ba_iterations_phase2,
            tol=backend_cfg.ba_tol,
            # free frames are bounded by both the window size and the
            # fix-older-than horizon (only keyframes within the last
            # fix_older_than frame ids stay free), +1 for the new frame
            max_free_frames=((min(backend_cfg.window_opt_frames, backend_cfg.fix_older_than) + 1 + 7) // 8) * 8,
        )
        cam = camera

        # same frame padding as local_bundle_adjustment's _round_up(.., 4)
        F_pad = (backend_cfg.window_opt_frames + backend_cfg.window_fixed_frames + 1 + 3) // 4 * 4
        P_pad = backend_cfg.ba_max_points
        O_pad = backend_cfg.ba_max_observations
        self._ba_dims = (F_pad, P_pad, O_pad)

        @jax.jit
        def _ba(flat):
            """Windowed BA with PACKED I/O: ONE flat f32 upload
            [frames (F,14) | points (P,4) | observations (O,6)] and one
            f32 readback [R_wc(9F), t_wc(3F), X(3P), obs_inlier(O)]
            instead of 10 uploads + 4 readbacks — every host<->device
            transfer is a full round trip (~24 ms through the dev
            relay)."""
            fpack = flat[: 14 * F_pad].reshape(F_pad, 14)
            ppack = flat[14 * F_pad : 14 * F_pad + 4 * P_pad].reshape(P_pad, 4)
            opack = flat[14 * F_pad + 4 * P_pad :].reshape(O_pad, 6)
            prob = BAProblem(
                R_wc=fpack[:, 0:9].reshape(-1, 3, 3),
                t_wc=fpack[:, 9:12],
                frame_valid=fpack[:, 12] > 0.5,
                frame_fixed=fpack[:, 13] > 0.5,
                X=ppack[:, 0:3],
                point_valid=ppack[:, 3] > 0.5,
                obs_frame=opack[:, 0].astype(jnp.int32),
                obs_point=opack[:, 1].astype(jnp.int32),
                obs_uv=opack[:, 2:5],
                obs_valid=opack[:, 5] > 0.5,
            )
            res = bundle_adjust(prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, ba_cfg)
            return jnp.concatenate([
                res.R_wc.reshape(-1), res.t_wc.reshape(-1), res.X.reshape(-1),
                res.obs_inlier.astype(jnp.float32),
            ])

        self._ba = _ba
        # Async keyframe BA (cfg.ba_async): the solve is dispatched
        # without blocking and written back one keyframe later. With >1
        # device it is placed on the last device so the frontend chip
        # never serializes behind it.
        self._pending_ba = None
        devs = jax.devices()
        self._ba_device = devs[-1] if (backend_cfg.ba_async and len(devs) > 1) else None
        # loop closure (detect_loop): kernels built lazily on first use
        self._loop_verify = None
        self._loop_match = None
        self._loop_refine_ba = None
        self._loop_cooldown = 0
        self._loop_key = jax.random.PRNGKey(1234)

    def reset_state(self) -> None:
        """Fresh map/bookkeeping, SAME compiled kernels. The reference's
        reset() builds a whole new Tracking instance (main_py.cpp:257-267)
        because its state lives inside the object graph; here the jitted
        programs are pure functions of their inputs, so rebuilding them
        would only force a full retrace (tens of seconds of host time:
        the unrolled Pallas pose schedule alone traces in ~29 s)."""
        self.flush_pending_ba()
        self.store = MapStore(self.store.cfg)
        self._pending_ba = None
        self._loop_cooldown = 0
        self._loop_key = jax.random.PRNGKey(1234)

    # ------------------------------------------------------------------
    # Loop closure (beyond the reference — it has no place recognition;
    # anchor: the previously self-referential pose-graph edges,
    # ops/pose_graph.py:130-151, now get real loop constraints)
    # ------------------------------------------------------------------

    def _build_loop_kernels(self):
        from ur_mvo_tpu.ops.nn_matcher import match_nn
        from ur_mvo_tpu.ops.pnp import ransac_pnp
        from ur_mvo_tpu.ops.pose_opt import PoseObs, optimize_pose

        cam = self.camera
        K_mat = jnp.asarray(cam.intrinsic_matrix())
        opt = self.opt_cfg

        @jax.jit
        def verify(key, X, uv3, valid):
            """PnP-RANSAC + pose-only refinement of the loop hypothesis
            (same flow as the tracker's kernel, without a prior pose to
            fall back on — a failed loop must report few inliers)."""
            pnp = ransac_pnp(key, X, uv3[:, :2], valid, K_mat, iterations=100, threshold_px=8.0)
            obs = PoseObs(X=X, uv=uv3, valid=valid)
            res = optimize_pose(
                pnp.R_cw, pnp.t_cw, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                chi2_mono=opt.mono_point, chi2_stereo=opt.stereo_point,
            )
            ok = jnp.all(jnp.isfinite(pnp.t_cw))
            return res._replace(n_inliers=jnp.where(ok, res.n_inliers, 0))

        @jax.jit
        def matcher(b0, b1):
            # center=True: the retrieval stage centers global descriptors
            # because collapsed descriptor spaces (the shipped v3
            # detector: matched/random cosine 0.99/0.93) have no raw
            # contrast — the VERIFICATION matcher needs the same
            # treatment or its NN assignments are near-random and a
            # spurious loop edge poisons the whole trajectory via PGO.
            # Centering is a no-op for well-spread (zero-mean) spaces.
            return match_nn(b0, b1, 0.2, 0.95, center=True)

        self._loop_verify = verify
        self._loop_match = matcher

        # Dedicated refinement BA at the window padding but with the
        # FULL reference schedule (10+5) and no convergence early exit:
        # the windowed program's budget/tol are tuned for per-keyframe
        # throughput (and tests shrink them further), which measured as
        # a near-no-op when reused for loop/reloc refinement — the
        # cost improvement from moving one pose is relatively tiny next
        # to the summed point residuals, so tol=1e-4 exits immediately.
        F_pad, P_pad, O_pad = self._ba_dims
        opt = self.opt_cfg
        cam = self.camera
        ref_cfg = BAConfig(
            chi2_mono=opt.mono_point, chi2_stereo=opt.stereo_point,
            iters_phase1=10, iters_phase2=5, tol=0.0,
            max_free_frames=8,
        )

        @jax.jit
        def _refine_ba(flat):
            fpack = flat[: 14 * F_pad].reshape(F_pad, 14)
            ppack = flat[14 * F_pad : 14 * F_pad + 4 * P_pad].reshape(P_pad, 4)
            opack = flat[14 * F_pad + 4 * P_pad :].reshape(O_pad, 6)
            prob = BAProblem(
                R_wc=fpack[:, 0:9].reshape(-1, 3, 3),
                t_wc=fpack[:, 9:12],
                frame_valid=fpack[:, 12] > 0.5,
                frame_fixed=fpack[:, 13] > 0.5,
                X=ppack[:, 0:3],
                point_valid=ppack[:, 3] > 0.5,
                obs_frame=opack[:, 0].astype(jnp.int32),
                obs_point=opack[:, 1].astype(jnp.int32),
                obs_uv=opack[:, 2:5],
                obs_valid=opack[:, 5] > 0.5,
            )
            res = bundle_adjust(prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, ref_cfg)
            return jnp.concatenate([
                res.R_wc.reshape(-1), res.t_wc.reshape(-1), res.X.reshape(-1),
                res.obs_inlier.astype(jnp.float32),
            ])

        self._loop_refine_ba = _refine_ba

    def _match_and_verify(self, bank_a, bank_kpts, bank_valid, ids, X_of_ids):
        """Shared geometric verification for place-recognition hits
        (detect_loop and relocalize): descriptor-NN match of the query
        bank against the candidate's mappoint descriptors, then
        PnP-RANSAC + pose refinement against ``X_of_ids`` (insertion-time
        snapshot positions for loop EDGES, live positions for
        relocalization — see the two call sites for why they differ).
        Returns ``(res, idx1, mvalid)`` or None below the inlier gates."""
        st = self.store
        cfg = self.cfg
        from ur_mvo_tpu.ops.keypoints import FeatureBank

        K = st.cfg.keypoints_per_frame
        desc_b = np.zeros((K, st.cfg.descriptor_dim), np.float32)
        valid_b = np.zeros(K, bool)
        desc_b[: len(ids)] = st.mp_desc[ids].astype(np.float32)
        # zero-norm rows are points with no representative descriptor
        # yet — they must not enter the match (they drag the centering
        # mean and can win argmax as a degenerate hub)
        valid_b[: len(ids)] = np.linalg.norm(desc_b[: len(ids)], axis=1) > 0.5
        bank_b = FeatureBank(
            scores=jnp.asarray(valid_b.astype(np.float32)),
            kpts=jnp.zeros((K, 2), jnp.float32),
            desc=jnp.asarray(desc_b),
            valid=jnp.asarray(valid_b),
        )
        m = self._loop_match(bank_a, bank_b)
        idx1 = np.asarray(m.idx1)
        mvalid = np.asarray(m.valid) & bank_valid & (idx1 >= 0) & (idx1 < len(ids))
        if mvalid.sum() < cfg.loop_min_inliers:
            return None
        X = np.zeros((K, 3), np.float32)
        uv3 = np.concatenate([bank_kpts.astype(np.float32), -np.ones((K, 1), np.float32)], 1)
        rows = np.nonzero(mvalid)[0]
        X[rows] = X_of_ids[idx1[rows]]
        self._loop_key, sub = jax.random.split(self._loop_key)
        res = self._loop_verify(sub, jnp.asarray(X), jnp.asarray(uv3), jnp.asarray(mvalid))
        if int(res.n_inliers) < cfg.loop_min_inliers:
            return None
        return res, idx1, mvalid

    def _refine_pose_ba(self, poses_wc, fixed, X0, obs, free_idx=1):
        """Structure-aware refinement of a verified loop / relocalization
        pose (round-4 fix for the single-view-PnP bias: the matched
        points carry correlated triangulation error, and PnP minimizing
        reprojection in ONE view lets it leak into the pose — measured
        0.145 map-unit edge bias on a zero-offset square revisit).

        Joint solve over (the query pose, the matched points) against
        observations from the query PLUS one or more FIXED reference
        views. A single candidate view is NOT enough when the revisit
        has little parallax to it (the exact loop-closure situation):
        depth error is then unobservable from the pair and the solve is
        a no-op — callers add the candidate's covisible snapshot
        keyframes as extra fixed views to restore the parallax baseline
        that triangulated the points in the first place.

        Runs on the DEDICATED full-schedule refinement program built by
        ``_build_loop_kernels`` (``self._loop_refine_ba``: tol=0, exact
        10+5 LM schedule — the window program's early-exit budget made
        refinement a no-op). Distinct program = one extra compile the
        first time a loop/reloc edge is verified (minutes over the dev
        relay, cached after). ``poses_wc``: list of (R_wc, t_wc); ``fixed``: per-frame
        bool (the query at ``free_idx`` is the one free frame); ``obs``:
        parallel arrays ``(obs_frame, obs_point, obs_uvr)`` where row k
        is frame ``obs_frame[k]`` observing point ``obs_point[k]`` at
        pixel row ``obs_uvr[k]`` = (u, v, right-x or -1).
        Returns ``(R_wc, t_wc, n_inl_free)`` or None."""
        F, P, O = self._ba_dims
        obs_frame, obs_point, obs_uvr = obs
        n_f = len(poses_wc)
        n_p = min(len(X0), P)
        keep = (obs_point < n_p)
        obs_frame, obs_point, obs_uvr = obs_frame[keep], obs_point[keep], obs_uvr[keep]
        if len(obs_frame) > O:
            # Round-robin interleave rows by within-view rank before the
            # O-row cap so truncation thins EVERY view evenly instead of
            # dropping whole trailing covis views (which exist to restore
            # the parallax baseline — losing them silently re-creates the
            # single-view-PnP bias this refinement fixes).
            rank = np.empty(len(obs_frame), np.int64)
            for f in np.unique(obs_frame):
                rows = np.nonzero(obs_frame == f)[0]
                rank[rows] = np.arange(len(rows))
            order = np.argsort(rank, kind="stable")
            obs_frame, obs_point, obs_uvr = (
                obs_frame[order], obs_point[order], obs_uvr[order])
        n_o = min(len(obs_frame), O)
        if n_f > F:
            return None
        fpack = np.zeros((F, 14), np.float32)
        fpack[:, 0:9] = np.eye(3, dtype=np.float32).reshape(1, 9)
        for i, (R, t) in enumerate(poses_wc):
            fpack[i, 0:9] = np.asarray(R, np.float32).reshape(-1)
            fpack[i, 9:12] = t
        fpack[:n_f, 12] = 1.0
        fpack[:n_f, 13] = np.asarray(fixed, np.float32)
        ppack = np.zeros((P, 4), np.float32)
        ppack[:n_p, 0:3] = X0[:n_p]
        ppack[:n_p, 3] = 1.0
        opack = np.zeros((O, 6), np.float32)
        opack[:n_o, 0] = obs_frame[:n_o]
        opack[:n_o, 1] = obs_point[:n_o]
        opack[:n_o, 2:5] = obs_uvr[:n_o]
        opack[:n_o, 5] = 1.0
        flat = jnp.asarray(
            np.concatenate([fpack.reshape(-1), ppack.reshape(-1), opack.reshape(-1)])
        )
        if self._loop_verify is None:
            self._build_loop_kernels()
        arr = np.asarray(self._loop_refine_ba(flat))
        R1 = arr[: 9 * F].reshape(F, 3, 3)[free_idx]
        t1 = arr[9 * F : 12 * F].reshape(F, 3)[free_idx]
        inl = arr[12 * F + 3 * P :][: n_o] > 0.5
        n_inl_free = int((inl & (obs_frame[:n_o] == free_idx)).sum())
        if not (np.all(np.isfinite(R1)) and np.all(np.isfinite(t1))):
            return None
        return R1, t1, n_inl_free

    def detect_loop(self, slot: int, bank_desc: np.ndarray, bank_kpts: np.ndarray,
                    bank_valid: np.ndarray):
        """Place recognition for the just-inserted keyframe ``slot``.

        Retrieval: cosine over per-keyframe global descriptors, centered
        by the all-keyframe mean (collapsed descriptor spaces — e.g. the
        shipped v3 detector's — stay discriminative after centering).
        Candidates must be non-covisible and >= loop_min_gap_frames old.
        Verification: descriptor NN match of the current features against
        the candidate's mappoints, PnP-RANSAC + pose refinement; accepted
        edges (T_ij between the candidate and this keyframe) are appended
        to ``store.loop_edges`` for :meth:`global_optimize` to consume.
        Returns the edge tuple or None."""
        cfg = self.cfg
        if not cfg.loop_closure:
            return None
        if self._loop_cooldown > 0:
            self._loop_cooldown -= 1
            return None
        st = self.store
        slots = st.keyframe_slots()
        cur_fid = int(st.kf_frame_id[slot])
        # candidates: old enough and not covisibility-CONNECTED (weight
        # >= 15 is the reference's connection MinWeight, mapping.cc:605-652
        # — a handful of shared far points does not make a place "recent")
        cand_mask = (cur_fid - st.kf_frame_id[slots] > cfg.loop_min_gap_frames) & (
            st.covis[slot][slots] < 15
        ) & (slots != slot)
        cands = slots[cand_mask]
        if len(cands) == 0:
            return None
        mu = st.kf_gdesc[slots].mean(0)

        def centered(x):
            c = x - mu
            return c / np.maximum(np.linalg.norm(c, axis=-1, keepdims=True), 1e-8)

        sims = centered(st.kf_gdesc[cands]) @ centered(st.kf_gdesc[slot][None])[0]
        if self._loop_verify is None:
            self._build_loop_kernels()
        from ur_mvo_tpu.ops.keypoints import FeatureBank

        K = st.cfg.keypoints_per_frame
        bank_a = FeatureBank(
            scores=jnp.asarray(bank_valid.astype(np.float32)),
            kpts=jnp.asarray(bank_kpts.astype(np.float32)),
            desc=jnp.asarray(bank_desc.astype(np.float32)),
            valid=jnp.asarray(bank_valid),
        )
        for idx in np.argsort(-sims)[: cfg.loop_top_k]:
            if sims[idx] < cfg.loop_min_similarity:
                break
            cand = int(cands[idx])
            # Verify against the candidate's INSERTION-TIME geometry
            # snapshot (kf_snap_*): its pose and its tracked-point
            # positions as a self-consistent pair. Using the LIVE map
            # here is subtly wrong: window/full BA drags early points
            # toward later drifted observers while gauge-fixed early
            # poses stay put, so PnP against (live points, stored pose)
            # lands in between — a biased edge (measured 0.26 m offset on
            # a 3 m square whose true closure offset is 0).
            snap_ok = st.kf_snap_ok[cand]
            slots_c = np.nonzero(snap_ok)[0]
            mp = st.kf_track[cand]
            ids = mp[slots_c]
            alive = ids >= 0
            alive[alive] &= ~st.mp_bad[ids[alive]]
            slots_c, ids = slots_c[alive], ids[alive]
            if len(ids) < cfg.loop_min_inliers or st.mp_desc is None:
                continue
            slots_c, ids = slots_c[:K], ids[:K]
            out = self._match_and_verify(
                bank_a, bank_kpts, bank_valid, ids, st.kf_snap_pos[cand, slots_c])
            if out is None:
                continue
            res, idx1, mvalid = out
            R_cw = np.asarray(res.R_cw)
            t_cw = np.asarray(res.t_cw)
            R_wc_cur = R_cw.T
            t_wc_cur = -R_cw.T @ t_cw
            R_i = st.kf_snap_R[cand]
            t_i = st.kf_snap_t[cand]
            # structure-aware refinement of the accepted hypothesis:
            # joint (query pose, matched points) solve observed from the
            # candidate, the query, AND the candidate's covisible
            # snapshot keyframes. The extra views matter: a loop revisit
            # has near-zero parallax to the candidate itself, so the
            # candidate+query pair alone cannot observe the correlated
            # triangulation error in the snapshot points (measured: the
            # 2-view refinement was an exact no-op on the square test) —
            # the covisible neighbors restore the parallax baseline that
            # triangulated those points (see _refine_pose_ba).
            # refinement support: ALL descriptor matches (mvalid), not
            # just the PnP inliers — the full-schedule BA's Huber phase
            # + chi2 re-gate handles the outliers, and a wider support
            # set shrinks the noise-driven component of the edge error
            rows = np.nonzero(mvalid)[0]
            ci = idx1[rows]
            n_m = len(rows)
            X0 = st.kf_snap_pos[cand, slots_c[ci]]
            poses = [(R_i, t_i), (R_wc_cur, t_wc_cur)]
            fixed = [True, False]
            obs_f = [np.zeros(n_m), np.ones(n_m)]
            obs_p = [np.arange(n_m), np.arange(n_m)]
            uv_q = np.concatenate(
                [bank_kpts[rows].astype(np.float32), -np.ones((n_m, 1), np.float32)], 1)
            obs_uv = [st.kf_kpts[cand, slots_c[ci]], uv_q]
            # extra fixed views: same-visit snapshot keyframes (temporal
            # window around the candidate keeps all fixed poses in one
            # consistent gauge — a LATER keyframe's snapshot carries the
            # accumulated drift and would re-introduce the bias)
            fid_c = int(st.kf_frame_id[cand])
            sl_all = st.keyframe_slots()
            ids_m = ids[ci]
            near = sl_all[
                (np.abs(st.kf_frame_id[sl_all] - fid_c) <= 2 * self.cfg.fix_older_than)
                & (sl_all != cand) & (sl_all != slot)
            ]
            if len(near):
                sub = st.obs_slot[ids_m][:, near]  # (n_m, B)
                has = sub >= 0
                counts = has.sum(0)
                for bi in np.argsort(-counts)[:4]:
                    if counts[bi] < 8:
                        break
                    B = int(near[bi])
                    rows_b = np.nonzero(has[:, bi])[0]
                    feat_b = sub[rows_b, bi].astype(np.int64)
                    ok_b = st.kf_snap_ok[B, feat_b]
                    rows_b, feat_b = rows_b[ok_b], feat_b[ok_b]
                    if len(rows_b) < 8:
                        continue
                    obs_f.append(np.full(len(rows_b), len(poses)))
                    obs_p.append(rows_b)
                    obs_uv.append(st.kf_kpts[B, feat_b])
                    poses.append((st.kf_snap_R[B], st.kf_snap_t[B]))
                    fixed.append(True)
            ref = self._refine_pose_ba(
                poses, fixed, X0,
                (np.concatenate(obs_f).astype(np.float32),
                 np.concatenate(obs_p).astype(np.int64),
                 np.concatenate(obs_uv).astype(np.float32)),
            )
            if ref is not None and ref[2] >= cfg.loop_min_inliers:
                R_wc_cur, t_wc_cur = ref[0], ref[1]
            # Sim3: inter-leg SCALE from dual-tracked points. Query
            # features matched to candidate-snapshot points that ALSO
            # carry a live current-leg mappoint give the same physical
            # points expressed in both legs' scales; the median of
            # pairwise-distance ratios is a rotation/translation-
            # invariant, outlier-robust scale estimate. Mono scale drift
            # between legs is the classical Sim3 loop-closure case
            # (round-4 analysis: |dt| 0.285 vs map extent 0.27 on the
            # production stack was scale-drift-bound); the reference has
            # no loop closure at all. global_optimize consumes the scale
            # by progressively rescaling the odometry chain (scale drift
            # accrues along the leg) before the SE(3) pose graph runs.
            s_ij = 1.0
            # Dual-point harvest. The query keyframe's OWN track table is
            # too thin (measured on the production stack: 63 matched
            # rows, only 8 with a triangulated current-leg point, 4
            # surviving the PnP-inlier cut), so pair candidate-snapshot
            # points with the whole RETURN-LEG LOCAL MAP instead:
            # project every good mappoint observed by the query's
            # covisible window into the query view (live pose) and
            # associate to PnP-inlier rows by pixel proximity — the same
            # physical point seen by both legs, identified geometrically.
            inl_rows = np.asarray(res.inliers).astype(bool) & mvalid
            rows_inl = np.nonzero(inl_rows)[0]
            row_of = {int(r): k for k, r in enumerate(rows)}
            sel = np.asarray([row_of[int(r)] for r in rows_inl if int(r) in row_of])
            Xa_c, Xb_c = [], []
            if len(sel) >= 4:
                win = st.window_frames(int(slot), self.cfg.window_opt_frames)
                tr_w = st.kf_track[win]
                ids_w = np.unique(tr_w[tr_w >= 0])
                ids_w = ids_w[st.mp_good[ids_w] & ~st.mp_bad[ids_w]]
                if len(ids_w) >= 8:
                    Rq = st.kf_R[slot].T  # R_cw of the query (live)
                    tq = -Rq @ st.kf_t[slot]
                    Xc = st.mp_pos[ids_w] @ Rq.T + tq
                    z = Xc[:, 2]
                    front = z > 1e-3
                    cam_ = self.camera
                    u = cam_.fx * Xc[:, 0] / np.maximum(z, 1e-3) + cam_.cx
                    v = cam_.fy * Xc[:, 1] / np.maximum(z, 1e-3) + cam_.cy
                    pts_uv = np.stack([u, v], 1)[front]
                    ids_f = ids_w[front]
                    q_uv = bank_kpts[rows[sel]]
                    if len(pts_uv):
                        d2 = ((q_uv[:, None, :] - pts_uv[None, :, :]) ** 2).sum(-1)
                        nn_j = d2.argmin(1)
                        ok_px = d2[np.arange(len(sel)), nn_j] < 3.0 ** 2
                        Xa_c.append(X0[sel[ok_px]])
                        Xb_c.append(st.mp_pos[ids_f[nn_j[ok_px]]])
            # union with the direct track-table pairs
            cur_ids = st.kf_track[slot][rows]
            have = (cur_ids >= 0) & inl_rows[rows]
            have[have] &= st.mp_good[cur_ids[have]] & ~st.mp_bad[cur_ids[have]]
            Xa_c.append(X0[have])
            Xb_c.append(st.mp_pos[cur_ids[have]])
            Xa = np.concatenate(Xa_c)
            Xb = np.concatenate(Xb_c)
            if os.environ.get("URMVO_DEBUG_LOOP"):
                print(f"# loop scale: rows={len(rows)} inl={inl_rows.sum()} "
                      f"track-dual={int(have.sum())} proj-dual={len(Xa) - int(have.sum())}",
                      flush=True)
            if len(Xa) >= 8:
                rng = np.random.default_rng(0)
                n_h = len(Xa)
                p_i = rng.integers(0, n_h, 256)
                q_i = rng.integers(0, n_h, 256)
                dif = p_i != q_i
                da = np.linalg.norm(Xa[p_i[dif]] - Xa[q_i[dif]], axis=1)
                db = np.linalg.norm(Xb[p_i[dif]] - Xb[q_i[dif]], axis=1)
                ok_r = (da > 1e-6) & (db > 1e-6)
                if ok_r.sum() >= 16:
                    s_ij = float(np.median(da[ok_r] / db[ok_r]))
            # edge: T_ij = T_i^-1 T_j in the SNAPSHOT frame (a purely
            # relative measurement; i = candidate, j = this keyframe)
            R_ij = R_i.T @ R_wc_cur
            t_ij = R_i.T @ (t_wc_cur - t_i)
            edge = (cand, int(slot), R_ij.astype(np.float32), t_ij.astype(np.float32),
                    float(cfg.loop_edge_weight), s_ij)
            st.loop_edges.append(edge)
            self._loop_cooldown = cfg.loop_cooldown_keyframes
            return edge
        return None

    def relocalize(self, bank_desc: np.ndarray, bank_kpts: np.ndarray,
                   bank_valid: np.ndarray):
        """Re-anchor a lost camera into the LIVE map.

        Beyond the reference, whose only loss recovery is the
        promote-last-keyframe retry and (pre-init) a fresh-map reseed
        (``tracking.cc:254-276, 500-513``). Retrieval + verification
        reuse the loop-closure machinery with two deliberate
        differences: every keyframe is a candidate (no gap/covisibility
        constraint — the most recently seen place is the most likely),
        and PnP runs against LIVE mappoint positions, because the
        recovered pose must land in the CURRENT world frame for
        tracking and BA to continue (``detect_loop`` instead uses
        insertion-time snapshots because a loop EDGE is a relative
        measurement against the candidate's own frame).

        Returns ``(T_wc (4,4), frame_track (K,), n_inliers)`` mapping
        verified bank slots to existing mappoint ids, or None.
        """
        cfg = self.cfg
        st = self.store
        slots = st.keyframe_slots()
        if len(slots) == 0 or st.mp_desc is None or not bank_valid.any():
            return None
        if self._loop_verify is None:
            self._build_loop_kernels()
        from ur_mvo_tpu.ops.keypoints import FeatureBank

        K = st.cfg.keypoints_per_frame
        q = bank_desc[bank_valid].astype(np.float32).mean(0)
        mu = st.kf_gdesc[slots].mean(0)

        def centered(x):
            c = x - mu
            return c / np.maximum(np.linalg.norm(c, axis=-1, keepdims=True), 1e-8)

        sims = centered(st.kf_gdesc[slots]) @ centered(q[None])[0]
        bank_a = FeatureBank(
            scores=jnp.asarray(bank_valid.astype(np.float32)),
            kpts=jnp.asarray(bank_kpts.astype(np.float32)),
            desc=jnp.asarray(bank_desc.astype(np.float32)),
            valid=jnp.asarray(bank_valid),
        )
        for idx in np.argsort(-sims)[: cfg.loop_top_k]:
            if sims[idx] < cfg.loop_min_similarity:
                break
            cand = int(slots[idx])
            mp = st.kf_track[cand]
            slots_c = np.nonzero(mp >= 0)[0]
            ids = mp[slots_c]
            keep = st.mp_good[ids] & ~st.mp_bad[ids]
            slots_c, ids = slots_c[keep], ids[keep]
            if len(ids) < cfg.loop_min_inliers:
                continue
            slots_c, ids = slots_c[:K], ids[:K]
            out = self._match_and_verify(
                bank_a, bank_kpts, bank_valid, ids, st.mp_pos[ids])
            if out is None:
                continue
            res, idx1, mvalid = out
            n_inl = int(res.n_inliers)
            inl = np.asarray(res.inliers).astype(bool) & mvalid
            frame_track = np.full(K, -1, np.int32)
            rows_in = np.nonzero(inl)[0]
            frame_track[rows_in] = ids[idx1[rows_in]]
            R_cw = np.asarray(res.R_cw)
            t_cw = np.asarray(res.t_cw)
            R_wc = R_cw.T
            t_wc = -R_cw.T @ t_cw
            # structure-aware refinement against the candidate's LIVE
            # pose + its live covisible observers (all one gauge — no
            # temporal window needed, unlike the loop-edge snapshot
            # case). Pose only: the refit points are NOT written back.
            ci = idx1[rows_in]
            ids_m = ids[ci]
            n_m = len(rows_in)
            poses = [(st.kf_R[cand], st.kf_t[cand]), (R_wc, t_wc)]
            fixed = [True, False]
            obs_f = [np.zeros(n_m), np.ones(n_m)]
            obs_p = [np.arange(n_m), np.arange(n_m)]
            uv_q = np.concatenate(
                [bank_kpts[rows_in].astype(np.float32), -np.ones((n_m, 1), np.float32)], 1)
            obs_uv = [st.kf_kpts[cand, slots_c[ci]], uv_q]
            others = slots[slots != cand]
            if len(others):
                sub = st.obs_slot[ids_m][:, others]
                has = sub >= 0
                counts = has.sum(0)
                for bi in np.argsort(-counts)[:4]:
                    if counts[bi] < 8:
                        break
                    B = int(others[bi])
                    rows_b = np.nonzero(has[:, bi])[0]
                    feat_b = sub[rows_b, bi].astype(np.int64)
                    obs_f.append(np.full(len(rows_b), len(poses)))
                    obs_p.append(rows_b)
                    obs_uv.append(st.kf_kpts[B, feat_b])
                    poses.append((st.kf_R[B], st.kf_t[B]))
                    fixed.append(True)
            ref = self._refine_pose_ba(
                poses, fixed, st.mp_pos[ids_m],
                (np.concatenate(obs_f).astype(np.float32),
                 np.concatenate(obs_p).astype(np.int64),
                 np.concatenate(obs_uv).astype(np.float32)),
            )
            if ref is not None and ref[2] >= cfg.loop_min_inliers:
                R_wc, t_wc = ref[0], ref[1]
                # report the inlier count of the pose actually adopted
                n_inl = int(ref[2])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R_wc
            pose[:3, 3] = t_wc
            return pose, frame_track, n_inl
        return None

    # ------------------------------------------------------------------
    # Keyframe insertion (Mapping::InsertKeyframe, mapping.cc:41-130)
    # ------------------------------------------------------------------

    def insert_keyframe(
        self,
        frame_id: int,
        timestamp: float,
        R_wc: np.ndarray,
        t_wc: np.ndarray,
        kpts_uvr: np.ndarray,  # (K, 3) u, v, u_right(-1 for mono)
        valid_slots: np.ndarray,  # (K,) bool
        track_mp: np.ndarray,  # (K,) int32 existing mappoint ids or -1
        depth: Optional[np.ndarray] = None,  # (K,) metric depth or None
        desc: Optional[np.ndarray] = None,  # (K, D) feature descriptors
        scores: Optional[np.ndarray] = None,  # (K,) detection scores
    ) -> tuple:
        """Insert a keyframe, create/triangulate mappoints, run local BA.

        Returns (kf_slot, optimized (R_wc, t_wc)).
        """
        st = self.store
        slot = st.alloc_keyframe(frame_id, timestamp, R_wc, t_wc, kpts_uvr, valid_slots, desc=desc,
                                 scores=scores)
        track = np.asarray(track_mp)

        # New mappoints for features without a track.
        new_mask = valid_slots & (track < 0)
        new_idx = np.nonzero(new_mask)[0]
        if len(new_idx):
            mp_ids = st.alloc_mappoints(len(new_idx))
            track = track.copy()
            track[new_idx] = mp_ids
            if desc is not None and st.mp_desc is not None:
                st.mp_desc[mp_ids] = desc[new_idx].astype(np.float16)
            # Stereo / depth-seeded points are Good immediately
            # (mapping.cc:71-101); mono ones stay untriangulated.
            uvr = kpts_uvr[new_idx]
            if depth is not None:
                d = depth[new_idx]
                seeded = d > 0
            else:
                disparity = uvr[:, 0] - uvr[:, 2]
                seeded = (uvr[:, 2] > 0) & (disparity > 1e-3)
                d = np.where(seeded, self.camera.bf / np.maximum(disparity, 1e-6), 0.0)
            if seeded.any():
                rays = np.stack(
                    [
                        (uvr[:, 0] - self.camera.cx) / self.camera.fx,
                        (uvr[:, 1] - self.camera.cy) / self.camera.fy,
                        np.ones(len(new_idx)),
                    ],
                    axis=1,
                )
                pc = rays * d[:, None]
                pw = pc @ np.asarray(R_wc).T + t_wc
                sel = mp_ids[seeded]
                st.mp_pos[sel] = pw[seeded]
                st.mp_good[sel] = True

        # Register all observations of this keyframe.
        obs_idx = np.nonzero(valid_slots & (track >= 0))[0]
        st.add_observations(slot, track[obs_idx], obs_idx)
        if desc is not None:
            # representative-descriptor refresh (mapping.cc:207-258)
            st.update_descriptors(track[obs_idx], desc[obs_idx])

        # Triangulate untriangulated points with > 2 observers
        # (mapping.cc:107-110 requires ObverserNum() > 2).
        self._triangulate_pending(track[obs_idx])

        # insertion-time geometry snapshot for loop-closure verification
        # (pose + tracked-point positions as a self-consistent pair)
        st.snapshot_keyframe_geometry(slot)

        if st.num_keyframes() >= 2:
            self.local_bundle_adjustment(slot)

        if self.cfg.enable_culling:
            # culling compacts slots: a pending async BA holds slot
            # indices, so it must land first
            self.flush_pending_ba()
            st.cull(self.cfg.cull_max_keyframes, self.cfg.cull_max_mappoints)

        s = st.frame_id_to_slot[frame_id]
        return slot, (st.kf_R[s].copy(), st.kf_t[s].copy())

    def _triangulate_pending(self, candidate_mps: np.ndarray) -> None:
        st = self.store
        cand = np.unique(candidate_mps)
        cand = cand[(~st.mp_good[cand]) & (~st.mp_bad[cand]) & (st.mp_obs_count[cand] > 2)]
        if len(cand) == 0:
            return
        KF = st.cfg.max_keyframes
        # Build padded ray bundles: cap observers per point at 8 (enough
        # for the triangulation LS; reference uses all).
        MAX_OBS = 8
        # PAD the batch to a power-of-two bucket: a data-dependent n
        # would retrace + recompile the vmapped kernel for EVERY distinct
        # candidate count (minutes each through the dev relay); the
        # padded rows have valid=all-False and triangulate to ok=False.
        n = len(cand)
        n_pad = max(8, 1 << (n - 1).bit_length())
        origins = np.zeros((n_pad, MAX_OBS, 3), np.float32)
        bearings = np.zeros((n_pad, MAX_OBS, 3), np.float32)
        valid = np.zeros((n_pad, MAX_OBS), bool)
        for i, mp in enumerate(cand):
            kfs = np.nonzero(st.obs_slot[mp] >= 0)[0][:MAX_OBS]
            slots = st.obs_slot[mp, kfs]
            uv = st.kf_kpts[kfs, slots][:, :2]
            rays = np.stack(
                [
                    (uv[:, 0] - self.camera.cx) / self.camera.fx,
                    (uv[:, 1] - self.camera.cy) / self.camera.fy,
                    np.ones(len(kfs)),
                ],
                axis=1,
            )
            Rk = st.kf_R[kfs]
            bearings[i, : len(kfs)] = np.einsum("kij,kj->ki", Rk, rays)
            origins[i, : len(kfs)] = st.kf_t[kfs]
            valid[i, : len(kfs)] = True
        packed = np.asarray(self._tri_batch(jnp.asarray(origins), jnp.asarray(bearings), jnp.asarray(valid)))
        pts = packed[:n, :3]
        ok = packed[:n, 3] > 0.5
        # Cheirality: the point must be in front of all its observing
        # cameras (the reference catches this later via BA depth gating;
        # doing it here avoids seeding BA with points behind cameras).
        good = cand[ok]
        st.mp_pos[good] = pts[ok]
        st.mp_good[good] = True

    # ------------------------------------------------------------------
    # Local BA (Mapping::LocalMapOptimization, mapping.cc:335-539)
    # ------------------------------------------------------------------

    def flush_pending_ba(self) -> None:
        """Block on and write back an in-flight async BA result (no-op
        when nothing is pending). Called before the next BA dispatch and
        before any trajectory/map read that must see optimized state."""
        if self._pending_ba is None:
            return
        res, meta = self._pending_ba
        self._pending_ba = None
        self._apply_ba_result(res, *meta)

    def local_bundle_adjustment(self, new_slot: int) -> None:
        st = self.store
        cfg = self.cfg
        self.flush_pending_ba()
        window = st.window_frames(new_slot, cfg.window_opt_frames)
        new_frame_id = st.kf_frame_id[new_slot]

        # fix frames: old ones or the first two (mapping.cc:354-359)
        fixed = (st.kf_frame_id[window] <= new_frame_id - cfg.fix_older_than) | (
            st.kf_frame_id[window] <= 2
        )

        # local mappoints: Good points observed by window frames
        tracks = st.kf_track[window]  # (W, K)
        mp_ids = np.unique(tracks[tracks >= 0])
        mp_ids = mp_ids[st.mp_good[mp_ids] & ~st.mp_bad[mp_ids]]
        if len(mp_ids) == 0 or len(window) < 2:
            return

        # extra fixed frames: observers of local points outside the window
        inc = st.obs_slot[mp_ids] >= 0  # (n, KF)
        in_window = np.zeros(st.cfg.max_keyframes, bool)
        in_window[window] = True
        outside_slots = np.nonzero(~in_window & st.kf_valid)[0]
        counts = inc[:, outside_slots].sum(axis=0)
        budget = max(0, cfg.window_fixed_frames - int(fixed.sum()))
        extra = outside_slots[np.argsort(-counts)][:budget]
        extra = extra[counts[np.argsort(-counts)][:budget] > 0]

        frames = np.concatenate([window, extra]).astype(np.int64)
        frame_fixed = np.concatenate([fixed, np.ones(len(extra), bool)])

        # gather observations of local mappoints in selected frames
        sub = st.obs_slot[mp_ids][:, frames]  # (n, W+E)
        pi, fi = np.nonzero(sub >= 0)
        feat = sub[pi, fi]
        uvr = st.kf_kpts[frames[fi], feat]
        # constraint needs >= 2 obs (mono) or a stereo row (mapping.cc:458-466)
        n_obs_per_p = np.bincount(pi, minlength=len(mp_ids))
        has_stereo = np.zeros(len(mp_ids), bool)
        np.logical_or.at(has_stereo, pi, uvr[:, 2] > 0)
        keep_p = (n_obs_per_p >= 2) | has_stereo
        keep_obs = keep_p[pi]
        pi, fi, uvr = pi[keep_obs], fi[keep_obs], uvr[keep_obs]
        mp_used = np.nonzero(keep_p)[0]
        if len(pi) == 0:
            return
        # re-index points compactly
        remap = np.full(len(mp_ids), -1, np.int32)
        remap[mp_used] = np.arange(len(mp_used), dtype=np.int32)
        p_idx = remap[pi]
        mp_sel = mp_ids[mp_used]

        # Constant padded shapes so the BA kernel compiles exactly once.
        F = self._round_up(cfg.window_opt_frames + cfg.window_fixed_frames + 1, 4)
        P = cfg.ba_max_points
        O = cfg.ba_max_observations
        if len(mp_sel) > P or len(pi) > O or len(frames) > F:
            # capacity overflow: keep the newest observations (should not
            # happen at reference operating points)
            keep = slice(max(0, len(pi) - O), len(pi))
            pi, fi, uvr, p_idx = pi[keep], fi[keep], uvr[keep], p_idx[keep]
            frames = frames[:F]
            frame_fixed = frame_fixed[:F]
            mp_sel = mp_sel[:P]
            sel_ok = (p_idx < len(mp_sel)) & (fi < len(frames))
            pi, fi, uvr, p_idx = pi[sel_ok], fi[sel_ok], uvr[sel_ok], p_idx[sel_ok]

        def pad(a, n, tail=(), dtype=np.float32):
            out = np.zeros((n,) + tail, dtype)
            out[: len(a)] = a[:n]
            return out

        fpack = np.zeros((F, 14), np.float32)
        fpack[:, 0:9] = pad(st.kf_R[frames], F, (3, 3)).reshape(F, 9) + np.where(
            (np.arange(F) >= len(frames))[:, None], np.eye(3, dtype=np.float32).reshape(1, 9), 0.0
        )
        fpack[:, 9:12] = pad(st.kf_t[frames], F, (3,))
        fpack[:, 12] = np.arange(F) < len(frames)
        fpack[:, 13] = pad(frame_fixed, F, (), bool)
        ppack = np.zeros((P, 4), np.float32)
        ppack[:, 0:3] = pad(st.mp_pos[mp_sel], P, (3,))
        ppack[:, 3] = np.arange(P) < len(mp_sel)
        opack = np.zeros((O, 6), np.float32)
        opack[:, 0] = pad(fi, O, (), np.int32)
        opack[:, 1] = pad(p_idx, O, (), np.int32)
        opack[:, 2:5] = pad(uvr, O, (3,))
        opack[:, 5] = np.arange(O) < len(pi)
        flat = jnp.asarray(np.concatenate([fpack.reshape(-1), ppack.reshape(-1), opack.reshape(-1)]))
        if self._ba_device is not None:
            flat = jax.device_put(flat, self._ba_device)
        res = self._ba(flat)

        meta = (frames, frame_fixed, mp_sel, pi, fi, p_idx, uvr)
        if self.cfg.ba_async:
            # JAX dispatch is already asynchronous: stash the on-device
            # result and return without materializing it on the host.
            self._pending_ba = (res, meta)
        else:
            self._apply_ba_result(res, *meta)

    def _apply_ba_result(self, res, frames, frame_fixed, mp_sel, pi, fi, p_idx, uvr) -> None:
        st = self.store
        # ONE packed readback (see the _ba wrapper), then host slicing
        arr = np.asarray(res)
        # layout: [R_wc(9F), t_wc(3F), X(3P), obs_inlier(O)]
        P = self.cfg.ba_max_points
        O = self.cfg.ba_max_observations
        F = (arr.shape[0] - 3 * P - O) // 12
        R_all = arr[: 9 * F].reshape(F, 3, 3)
        t_all = arr[9 * F : 12 * F].reshape(F, 3)
        X_all = arr[12 * F : 12 * F + 3 * P].reshape(P, 3)
        inl_all = arr[12 * F + 3 * P :] > 0.5
        # write back (mapping.cc:506-538)
        free = ~frame_fixed
        st.kf_R[frames[free]] = R_all[: len(frames)][free]
        st.kf_t[frames[free]] = t_all[: len(frames)][free]
        st.mp_pos[mp_sel] = X_all[: len(mp_sel)]

        # outlier removal (mapping.cc:474-501), batched: one vectorized
        # store update instead of a per-outlier Python loop (hundreds of
        # outliers per keyframe were a measurable host-time share)
        inlier = inl_all[: len(pi)]
        bad = np.nonzero(~inlier)[0]
        if len(bad):
            kf_slots = frames[fi[bad]]
            mps = mp_sel[p_idx[bad]]
            st.remove_observations(kf_slots, mps)
            # stereo mappoint kill: evaluated after the whole batch (the
            # reference checks per removal; post-batch counts can only be
            # lower, so this kills a superset of near-dead points)
            stereo_mps = np.unique(mps[uvr[bad, 2] > 0])
            kill = stereo_mps[st.mp_obs_count[stereo_mps] < 2]
            st.mp_bad[kill] = True
            st.mp_good[kill] = False

    @staticmethod
    def _round_up(x: int, m: int) -> int:
        return ((x + m - 1) // m) * m

    @staticmethod
    def _bucket_pow2(x: int, mult: int) -> int:
        """Smallest mult * 2^k >= x (shape-bucketed padding)."""
        m = mult
        while m < x:
            m *= 2
        return m

    # ------------------------------------------------------------------
    # Global optimization (beyond the reference: pose graph + full BA)
    # ------------------------------------------------------------------

    def global_optimize(self, pose_graph_iterations: int = 15, full_ba: bool = True, mesh=None) -> None:
        """Whole-trajectory refinement: SE(3) pose graph over the odometry
        chain, then full BA over all keyframes/points (first two frames
        fixed as gauge). The reference has no global back end at all;
        this is the 'global pose-graph + full BA' capability of
        BASELINE.json config #3. With ``mesh`` given, the full BA runs
        sharded over the devices (``parallel/dist_ba``)."""
        import jax.numpy as jnp

        from ur_mvo_tpu.ops.pose_graph import (
            PoseGraph,
            optimize_pose_graph,
            sequential_edges_from_trajectory,
        )

        self.flush_pending_ba()
        st = self.store
        slots = st.keyframe_slots()
        order = slots[np.argsort(st.kf_frame_id[slots])]
        n = len(order)
        if n < 3:
            return
        # Sim3 scale correction BEFORE the SE(3) pose graph: loop edges
        # carry the measured inter-leg scale (detect_loop); apply it to
        # the odometry chain + map so the remaining error is rigid.
        self._apply_loop_scale(order)
        Fp = self._round_up(n, 8)
        R = np.tile(np.eye(3, dtype=np.float32), (Fp, 1, 1))
        t = np.zeros((Fp, 3), np.float32)
        R[:n] = st.kf_R[order]
        t[:n] = st.kf_t[order]
        ei, ej, Rm, tm, w = sequential_edges_from_trajectory(R, t, n, Fp)
        # loop-closure constraints (detect_loop): remap store slots to
        # graph node indices and append after the odometry chain. With
        # loop edges present the (residual-zero) sequential edges become
        # the spring chain PGO distributes the loop error along.
        slot_to_node = {int(s): k for k, s in enumerate(order)}
        loops = [e for e in st.loop_edges if e[0] in slot_to_node and e[1] in slot_to_node]
        if loops:
            E = self._round_up(Fp + len(loops), 8)
            ei = np.concatenate([ei, np.zeros(E - Fp, np.int32)])
            ej = np.concatenate([ej, np.zeros(E - Fp, np.int32)])
            Rm = np.concatenate([Rm, np.tile(np.eye(3, dtype=np.float32), (E - Fp, 1, 1))])
            tm = np.concatenate([tm, np.zeros((E - Fp, 3), np.float32)])
            w = np.concatenate([w, np.zeros(E - Fp, np.float32)])
            for k, e in enumerate(loops):
                si, sj, R_ij, t_ij, wt = e[:5]
                ei[Fp + k] = slot_to_node[si]
                ej[Fp + k] = slot_to_node[sj]
                Rm[Fp + k] = R_ij
                tm[Fp + k] = t_ij
                w[Fp + k] = wt
        g = PoseGraph(
            R_wc=jnp.asarray(R), t_wc=jnp.asarray(t),
            node_valid=jnp.arange(Fp) < n,
            node_fixed=jnp.arange(Fp) < 1,
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            R_ij=jnp.asarray(Rm), t_ij=jnp.asarray(tm),
            edge_weight=jnp.asarray(w),
        )
        res = optimize_pose_graph(g, iterations=pose_graph_iterations)
        R_old = st.kf_R[order].copy()
        t_old = st.kf_t[order].copy()
        st.kf_R[order] = np.asarray(res.R_wc)[:n]
        st.kf_t[order] = np.asarray(res.t_wc)[:n]
        # rigidly carry each map point with its first observing keyframe's
        # pose correction (ORB-style loop correction) so the map is
        # consistent with the corrected trajectory even when full BA is
        # skipped — and a better init when it runs.
        self._correct_points_after_pgo(order, R_old, t_old)

        if full_ba:
            self._full_bundle_adjustment(order, mesh=mesh)

    def _apply_loop_scale(self, order: np.ndarray) -> None:
        """Distribute each loop edge's measured inter-leg scale along the
        odometry chain (mono scale drift accrues gradually, so the
        per-step correction interpolates geometrically from 1 at the
        loop's old end to ``s`` at its new end; nodes past the new end
        stay in the drifted scale and get the full factor). Map points
        follow their first observing keyframe: depth about that camera
        rescales by its node factor, rotation unchanged. Consumed edges
        are rewritten with scale 1 so a second global_optimize does not
        re-apply. The SE(3) pose graph then distributes the remaining
        RIGID error — together this is the 7-dof (Sim3) loop closure the
        round-4 production-stack analysis called for; the reference has
        no loop closure (``SURVEY.md`` aux table)."""
        st = self.store
        slot_to_node = {int(s): k for k, s in enumerate(order)}
        n = len(order)
        new_edges = []
        for e in st.loop_edges:
            # 5% deadband: scale-consistent maps measure s within a few
            # percent of 1 from triangulation noise alone (the oracle
            # square: correcting that noise WORSENED PGO closure 0.08 ->
            # 0.19); real inter-leg mono scale drift — the case this
            # exists for — measures tens of percent.
            s_ij = float(e[5]) if len(e) > 5 else 1.0
            if (e[0] in slot_to_node and e[1] in slot_to_node
                    and abs(np.log(max(s_ij, 1e-6))) > 0.05):
                a, b = slot_to_node[e[0]], slot_to_node[e[1]]
                if a > b:
                    a, b = b, a
                    s_ij = 1.0 / s_ij
                if b > a:
                    # per-node step factor: 1 up to a, geometric ramp to
                    # s over (a, b], constant s past b
                    c = np.ones(n, np.float64)
                    ramp = np.arange(1, b - a + 1) / (b - a)
                    c[a + 1 : b + 1] = s_ij ** ramp
                    c[b + 1 :] = s_ij
                    t_old = st.kf_t[order].astype(np.float64)
                    steps = np.diff(t_old, axis=0) * c[1:, None]
                    t_new = np.concatenate(
                        [t_old[:1], t_old[0] + np.cumsum(steps, axis=0)])
                    st.kf_t[order] = t_new.astype(np.float32)
                    self._carry_points_scaled(order, t_old.astype(np.float32), c)
                e = e[:5] + (1.0,)
            new_edges.append(e)
        st.loop_edges = new_edges

    def _carry_points_scaled(self, order: np.ndarray, t_old: np.ndarray,
                             c: np.ndarray) -> None:
        """X' = t'_ref + c_ref * (X - t_ref) per map point, ref = first
        observing keyframe (rotations unchanged by scale correction)."""
        st = self.store
        mp_ids = np.nonzero(st.mp_alloc & st.mp_good & ~st.mp_bad)[0]
        if len(mp_ids) == 0:
            return
        obs = st.obs_slot[mp_ids][:, order] >= 0
        has = obs.any(1)
        mp_ids, obs = mp_ids[has], obs[has]
        if len(mp_ids) == 0:
            return
        ref = obs.argmax(1)
        X = st.mp_pos[mp_ids]
        st.mp_pos[mp_ids] = (
            st.kf_t[order][ref]
            + c[ref, None].astype(np.float32) * (X - t_old[ref])
        ).astype(np.float32)

    def _correct_points_after_pgo(self, order: np.ndarray, R_old: np.ndarray, t_old: np.ndarray) -> None:
        """X' = T_new_ref * T_old_ref^-1 * X per map point, with ref = its
        first observing keyframe (insertion order)."""
        st = self.store
        mp_ids = np.nonzero(st.mp_alloc & st.mp_good & ~st.mp_bad)[0]
        if len(mp_ids) == 0:
            return
        obs = st.obs_slot[mp_ids][:, order] >= 0  # (N, n)
        has = obs.any(1)
        mp_ids, obs = mp_ids[has], obs[has]
        if len(mp_ids) == 0:
            return
        ref = obs.argmax(1)
        Ro, to_ = R_old[ref], t_old[ref]
        Rn, tn = st.kf_R[order][ref], st.kf_t[order][ref]
        X = st.mp_pos[mp_ids]
        Xc = np.einsum("nji,nj->ni", Ro, X - to_)  # old cam frame (R^T @ .)
        st.mp_pos[mp_ids] = (np.einsum("nij,nj->ni", Rn, Xc) + tn).astype(np.float32)

    def _full_bundle_adjustment(self, order: np.ndarray, mesh=None) -> None:
        """BA over every keyframe and every good map point."""
        import jax.numpy as jnp

        st = self.store
        n = len(order)
        mp_ids = np.unique(st.kf_track[order][st.kf_track[order] >= 0])
        mp_ids = mp_ids[st.mp_good[mp_ids] & ~st.mp_bad[mp_ids]]
        sub = st.obs_slot[mp_ids][:, order]
        pi, fi = np.nonzero(sub >= 0)
        feat = sub[pi, fi]
        uvr = st.kf_kpts[order[fi], feat]
        n_per = np.bincount(pi, minlength=len(mp_ids))
        has_st = np.zeros(len(mp_ids), bool)
        np.logical_or.at(has_st, pi, uvr[:, 2] > 0)
        keep_p = (n_per >= 2) | has_st
        keep_o = keep_p[pi]
        pi, fi, uvr = pi[keep_o], fi[keep_o], uvr[keep_o]
        mp_used = np.nonzero(keep_p)[0]
        if len(pi) < 16:
            return
        remap = np.full(len(mp_ids), -1, np.int32)
        remap[mp_used] = np.arange(len(mp_used), dtype=np.int32)
        p_idx = remap[pi]
        mp_sel = mp_ids[mp_used]

        mult = 8 if mesh is None else 8 * mesh.devices.size
        F = self._round_up(n, 8)
        # power-of-two shape buckets: one compile per OCTAVE instead of
        # one per exact problem size — full-BA point/obs counts differ
        # run to run, and each distinct padded shape is a fresh XLA
        # program (minutes over the dev relay)
        P = self._bucket_pow2(len(mp_sel), mult)
        O = self._bucket_pow2(len(pi), mult)

        def pad(a, m, tail=(), dtype=np.float32):
            out = np.zeros((m,) + tail, dtype)
            out[: len(a)] = a[:m]
            return jnp.asarray(out)

        prob = BAProblem(
            R_wc=jnp.asarray(
                np.concatenate([st.kf_R[order], np.tile(np.eye(3, dtype=np.float32), (F - n, 1, 1))])
            ),
            t_wc=pad(st.kf_t[order], F, (3,)),
            frame_valid=jnp.arange(F) < n,
            frame_fixed=jnp.asarray(
                np.concatenate([st.kf_frame_id[order] <= 2, np.ones(F - n, bool)])
            ),
            X=pad(st.mp_pos[mp_sel], P, (3,)),
            point_valid=jnp.arange(P) < len(mp_sel),
            obs_frame=pad(fi, O, (), np.int32),
            obs_point=pad(p_idx, O, (), np.int32),
            obs_uv=pad(uvr, O, (3,)),
            obs_valid=jnp.arange(O) < len(pi),
        )
        cam = self.camera
        ba_cfg = BAConfig(
            chi2_mono=self.opt_cfg.mono_point,
            chi2_stereo=self.opt_cfg.stereo_point,
            iters_phase1=self.cfg.ba_iterations_phase1,
            iters_phase2=self.cfg.ba_iterations_phase2,
            tol=self.cfg.ba_tol,
            # full BA optimizes (almost) every keyframe: the free-frame
            # bound must cover them all
            max_free_frames=F,
        )
        if mesh is not None:
            from ur_mvo_tpu.parallel.dist_ba import dist_bundle_adjust, shard_problem

            prob_s = shard_problem(prob, mesh.devices.size)
            res = dist_bundle_adjust(prob_s, mesh, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, ba_cfg)
            # points come back in the sharded permutation; invert it
            P_ = prob.X.shape[0]
            nsh = mesh.devices.size
            Pl = P_ // nsh
            old_p = np.arange(P_)
            new_p = (old_p % nsh) * Pl + old_p // nsh
            X_out = np.asarray(res.X)[new_p]
        else:
            res = bundle_adjust(prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, ba_cfg)
            X_out = np.asarray(res.X)
        free = ~np.asarray(prob.frame_fixed)[:n]
        st.kf_R[order[free]] = np.asarray(res.R_wc)[:n][free]
        st.kf_t[order[free]] = np.asarray(res.t_wc)[:n][free]
        st.mp_pos[mp_sel] = X_out[: len(mp_sel)]
