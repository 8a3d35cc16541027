"""Multi-sequence concurrent VO: one device, many trajectories.

The reference runs exactly one sequence per process with GPU work
serialized behind a mutex (``tracking.h:134-135``). A single TPU chip is
heavily underutilized by one 640x512 VO stream, so this driver runs S
independent sequences lock-step and **batches the dominant device work**
across them: SuperPoint extraction and SuperGlue matching execute as
(S, ...)-batched programs (optionally sharded over a mesh via the batch
axis), while each sequence keeps its own host state machine and map.
Rare control paths (initialization retries, tracking-loss fallback)
drop to per-sequence device calls.

This implements BASELINE.json configs #3/#5 ("all Harbor seqs batched",
"multi-sequence concurrent VO").
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.camera import Camera
from ur_mvo_tpu.config import Configs
from ur_mvo_tpu.models import superglue, superpoint
from ur_mvo_tpu.ops.keypoints import FeatureBank, select_keypoints
from ur_mvo_tpu.ops.matching import Matches, decode_assignment, filter_matches, gather_match_points
from ur_mvo_tpu.ops.ransac import ransac_fundamental
from ur_mvo_tpu.runtime.frontend import Tracker


class _SeqExtractorView:
    """Per-sequence extractor facade over the shared batched programs.

    ``extract``/``match`` fall back to single-item batched calls for the
    uncommon control paths; the hot path goes through the driver's
    batched begin-frame instead.
    """

    def __init__(self, owner: "MultiSequenceVO", idx: int):
        self._owner = owner
        self._idx = idx

    def extract(self, image, mask=None) -> FeatureBank:
        bank_b = self._owner._extract_batched(jnp.asarray(image)[None])
        return jax.tree.map(lambda x: x[0], bank_b)

    def match(self, bank0: FeatureBank, bank1: FeatureBank, outlier_rejection: bool = True) -> Matches:
        b0 = jax.tree.map(lambda x: x[None], bank0)
        b1 = jax.tree.map(lambda x: x[None], bank1)
        key = self._owner._next_key()
        m = self._owner._match_batched(key[None], b0, b1)
        return jax.tree.map(lambda x: x[0], m)


class MultiSequenceVO:
    def __init__(self, cfg: Configs, camera: Camera, num_sequences: int, extractors: Optional[Sequence] = None,
                 mesh=None):
        """``mesh``: optional 1-D ``jax.sharding.Mesh`` — the batched
        extract/match programs then run sharded over its first axis
        (params replicated, sequences split across devices);
        ``num_sequences`` must be a multiple of the mesh size."""
        self.cfg = cfg
        self.camera = camera
        self.S = num_sequences
        sp_cfg = cfg.superpoint
        sg_cfg = cfg.superglue
        key = jax.random.PRNGKey(cfg.runtime.seed)
        k1, k2, self._key = jax.random.split(key, 3)
        self.sp_params = (
            superpoint.load_torch_weights(sp_cfg.weights_path)
            if sp_cfg.weights_path
            else superpoint.init_params(k1)
        )
        sg_num_heads = sg_cfg.num_heads
        if sg_cfg.weights_path:
            # load_weights handles BOTH torch layouts and native .npz
            # checkpoints (whose embedded num_layers/num_heads win over
            # the config) — same resolution as NeuralExtractor
            self.sg_params = superglue.load_weights(sg_cfg.weights_path, sg_cfg.num_layers, sg_cfg.num_heads)
            meta = superglue.checkpoint_meta(sg_cfg.weights_path)
            if meta is not None:
                sg_num_heads = meta[1]
        else:
            self.sg_params = superglue.init_params(k2, sg_cfg.num_layers, sg_cfg.num_heads)

        cap = sp_cfg.capacity

        def _extract_one(sp_params, image):
            img = image.astype(jnp.float32)
            img = jnp.where(jnp.max(img) > 1.5, img / 255.0, img)
            out = superpoint.forward(sp_params, img[None, :, :, None], nms_radius=sp_cfg.nms_radius,
                                     return_raw_scores=sp_cfg.subpixel)
            return select_keypoints(
                out[0][0], out[1][0], capacity=cap,
                threshold=sp_cfg.keypoint_threshold, border=sp_cfg.remove_borders,
                max_keypoints=sp_cfg.max_keypoints,
                raw_scores=out[2][0] if sp_cfg.subpixel else None,
            )

        # same "auto" matcher resolution as NeuralExtractor: a random-init
        # SuperGlue produces meaningless assignments, so without trained
        # matcher weights fall back to mutual-NN
        matcher = sg_cfg.matcher
        if matcher == "auto":
            matcher = "superglue" if sg_cfg.weights_path else "nn"
        self.matcher = matcher
        # explicit config value > checkpoint-embedded calibration > 0.5
        self.match_threshold = match_threshold = superglue.resolve_matching_threshold(sg_cfg)

        def _match_one(sg_params, key, b0, b1):
            if matcher == "nn":
                from ur_mvo_tpu.ops.nn_matcher import match_nn

                m = match_nn(b0, b1, sg_cfg.nn_min_similarity, sg_cfg.nn_ratio,
                             center=sg_cfg.nn_center)
            else:
                from ur_mvo_tpu.ops.pallas_kernels import attention_pallas_wanted

                Z = superglue.match_scores(
                    sg_params, b0, b1, sg_cfg.image_width, sg_cfg.image_height,
                    sinkhorn_iterations=sg_cfg.sinkhorn_iterations,
                    num_heads=sg_num_heads,
                    use_pallas_attention=attention_pallas_wanted(batched=True),
                )
                m = decode_assignment(Z, b0.valid, b1.valid, match_threshold)
            p0, p1, valid = gather_match_points(m, b0.kpts, b1.kpts)
            res = ransac_fundamental(key, p0, p1, valid, iterations=200)
            keep = jnp.where(m.num_valid() >= 8, res.inliers, valid)
            return filter_matches(m, keep)

        _ext_v = jax.vmap(_extract_one, in_axes=(None, 0))
        _match_v = jax.vmap(_match_one, in_axes=(None, 0, 0, 0))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert num_sequences % mesh.devices.size == 0, (
                "num_sequences must be a multiple of the mesh size")
            bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
            repl = NamedSharding(mesh, P())
            ext_jit = jax.jit(_ext_v, in_shardings=(repl, bsh), out_shardings=bsh)
            match_jit = jax.jit(_match_v, in_shardings=(repl, bsh, bsh, bsh), out_shardings=bsh)
            # host-assembled inputs (stacked partner banks, keys, raw
            # images) arrive replicated/uncommitted — place them on the
            # batch sharding so they match the jit contract without an
            # implicit cross-device copy per call
            _to_b = lambda tree: jax.device_put(tree, bsh)
        else:
            ext_jit = jax.jit(_ext_v)
            match_jit = jax.jit(_match_v)
            _to_b = lambda tree: tree
        self._extract_batched = lambda imgs: ext_jit(self.sp_params, _to_b(imgs))
        self._match_batched = lambda keys, b0, b1: match_jit(self.sg_params, _to_b(keys), _to_b(b0), _to_b(b1))

        # Batched TRACK: the fused post-match core (candidate scatter +
        # PnP + pose GN + jump rescue, runtime/frontend.fused_track_core)
        # vmapped over sequences — one program + one packed readback per
        # lock-step frame instead of S per-sequence track dispatches.
        from ur_mvo_tpu.runtime.frontend import fused_track_core

        K_mat = jnp.asarray(camera.intrinsic_matrix())
        kfc = cfg.keyframe
        topt = cfg.tracking_optimization
        rtc = cfg.runtime
        camc = camera

        def _track_one(key, m, bank, snap):
            Kc = bank.kpts.shape[0]
            uvr = jnp.concatenate([bank.kpts, -jnp.ones((Kc, 1), jnp.float32)], axis=1)
            return fused_track_core(
                key, m, uvr, snap, K_mat,
                camc.fx, camc.fy, camc.cx, camc.cy, camc.bf,
                topt.mono_point, topt.stereo_point,
                rtc.pnp_ransac_iterations, rtc.pnp_reprojection_threshold,
                kfc.min_num_match, 4.0 * kfc.max_distance,
            )

        _track_v = jax.vmap(_track_one, in_axes=(0, 0, 0, 0))
        if mesh is not None:
            track_jit = jax.jit(_track_v, in_shardings=(bsh, bsh, bsh, bsh), out_shardings=bsh)
        else:
            track_jit = jax.jit(_track_v)
        self._track_batched = lambda keys, m, banks, snaps: track_jit(
            _to_b(keys), _to_b(m), _to_b(banks), _to_b(snaps))

        self.trackers: List[Tracker] = []
        for i in range(self.S):
            ext = extractors[i] if extractors is not None else _SeqExtractorView(self, i)
            self.trackers.append(Tracker(cfg, camera, ext))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------

    def process_batch(self, images: np.ndarray, timestamps: Sequence[float]) -> List[Optional[np.ndarray]]:
        """One lock-step frame for all sequences. ``images``: (S, H, W).
        Returns per-sequence keyframe poses (or None)."""
        assert images.shape[0] == self.S
        banks_b = self._extract_batched(jnp.asarray(images))
        banks = [jax.tree.map(lambda x: x[i], banks_b) for i in range(self.S)]

        # primary match partners: the ref keyframe bank (tracking) or the
        # init bank (initialization); identity placeholder otherwise.
        partners = []
        have_partner = []
        for i, t in enumerate(self.trackers):
            if t.initialized and t._ref_bank is not None:
                partners.append(t._ref_bank)
                have_partner.append(True)
            elif not t.initialized and t._init_bank is not None:
                partners.append(t._init_bank)
                have_partner.append(True)
            else:
                partners.append(banks[i])
                have_partner.append(False)
        partners_b = jax.tree.map(lambda *xs: jnp.stack(xs), *partners)
        keys = jax.random.split(self._next_key(), self.S)
        matches_b = self._match_batched(keys, partners_b, banks_b)

        # batched track for the sequences that are in tracking state
        track_lane = [t.initialized and t._ref_bank is not None for t in self.trackers]
        packed_b = None
        if any(track_lane):
            K = self.cfg.superpoint.capacity
            snaps = np.zeros((self.S, K, 6), np.float32)
            for i, t in enumerate(self.trackers):
                if track_lane[i]:
                    snaps[i] = t.fused_snapshot()
            keys2 = jax.random.split(self._next_key(), self.S)
            packed_b = np.asarray(
                self._track_batched(keys2, matches_b, banks_b, jnp.asarray(snaps)))

        out = []
        for i, t in enumerate(self.trackers):
            m = jax.tree.map(lambda x: x[i], matches_b) if have_partner[i] else None
            pt = t.parse_fused_packed(packed_b[i]) if (packed_b is not None and track_lane[i]) else None
            out.append(t.process(banks[i], timestamps[i], precomputed_match=m, precomputed_track=pt))
        return out

    def process_batch_with_oracle(self, T_wcs: Sequence[np.ndarray], timestamps: Sequence[float]) -> List[Optional[np.ndarray]]:
        """Oracle-extractor variant for tests: per-sequence extract via
        ground-truth pose; match runs per sequence (oracle matching is a
        host-side identity join)."""
        out = []
        for i, t in enumerate(self.trackers):
            bank = t.extractor.extract_with_pose(T_wcs[i])
            out.append(t.process(bank, timestamps[i]))
        return out

    # ------------------------------------------------------------------

    def trajectories(self):
        return [t.backend.store.trajectory() for t in self.trackers]
