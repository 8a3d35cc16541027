"""Feature extraction + matching front ends.

``NeuralExtractor`` is the production path: SuperPoint + keypoint
selection compiled as ONE device program, and SuperGlue + decode +
fundamental-RANSAC outlier rejection as ANOTHER single program — the
fused equivalents of the reference's ``ExtractFeatrue``/
``ExtractFeatureAndMatch`` chains (``/root/reference/src/tracking.cc:
325-377``), which bounce TRT -> CPU -> TRT -> CPU -> OpenCV per frame.
Undistortion rides inside the extract program (``camera.cc:116-125`` does
it on the host with cv::remap).

``OracleExtractor`` is the test double: given a synthetic scene (world
points + ground-truth camera poses) it produces exact projections with
configurable noise and identity descriptors, so the whole VO runtime can
be integration-tested without trained weights (the reference has no such
capability — SURVEY §4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.camera import Camera, remap_bilinear
from ur_mvo_tpu.config import Configs
from ur_mvo_tpu.models import superglue, superpoint
from ur_mvo_tpu.ops.keypoints import FeatureBank, select_keypoints
from ur_mvo_tpu.ops.matching import Matches, decode_assignment, filter_matches, gather_match_points
from ur_mvo_tpu.ops.ransac import ransac_fundamental


class NeuralExtractor:
    """SuperPoint + SuperGlue as two jitted device programs."""

    def __init__(self, cfg: Configs, camera: Camera):
        self.cfg = cfg
        self.camera = camera
        sp_cfg = cfg.superpoint
        sg_cfg = cfg.superglue
        key = jax.random.PRNGKey(cfg.runtime.seed)
        k1, k2 = jax.random.split(key)
        if sp_cfg.weights_path:
            self.sp_params = superpoint.load_torch_weights(sp_cfg.weights_path)
        else:
            self.sp_params = superpoint.init_params(k1)
        sg_num_heads = sg_cfg.num_heads
        if sg_cfg.weights_path:
            self.sg_params = superglue.load_weights(sg_cfg.weights_path, sg_cfg.num_layers, sg_cfg.num_heads)
            # a native checkpoint's embedded architecture wins over the
            # config (avoids silent layer/head drift)
            meta = superglue.checkpoint_meta(sg_cfg.weights_path)
            if meta is not None:
                sg_num_heads = meta[1]
        else:
            self.sg_params = superglue.init_params(k2, sg_cfg.num_layers, sg_cfg.num_heads)
        # Resolve the "auto" matcher: a randomly-initialized SuperGlue
        # produces meaningless assignments, so without trained matcher
        # weights fall back to mutual-NN with ratio test (the pairing
        # the shipped detector-only checkpoint is validated with).
        self._matcher = sg_cfg.matcher
        if self._matcher == "auto":
            self._matcher = "superglue" if sg_cfg.weights_path else "nn"
        if self._matcher == "hybrid" and not sg_cfg.weights_path:
            # hybrid's SG rescue needs trained weights; without them the
            # primary NN path is all there is
            self._matcher = "nn"

        undistort_map = (
            jnp.asarray(camera.undistort_map) if camera.undistort_map is not None else None
        )
        # Distinct right-camera rectify map (camera.cc:61-75 builds
        # _mapr1/_mapr2 from RIGHT_K/D/R/P; :117-127 remaps the right
        # image with THEM, not the left map).
        undistort_map_right = (
            jnp.asarray(camera.undistort_map_right)
            if camera.undistort_map_right is not None
            else undistort_map
        )
        capacity = sp_cfg.capacity
        compute_dtype = jnp.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jnp.float32
        from ur_mvo_tpu.ops.pallas_kernels import attention_pallas_enabled, sinkhorn_pallas_enabled

        use_pallas_sink = sinkhorn_pallas_enabled()
        use_pallas_attn = attention_pallas_enabled()

        # NOTE: params are traced arguments, not closure constants —
        # embedding multi-MB weights as XLA constants slows compilation
        # and keys the persistent cache on the weight values.
        use_patch_desc = sp_cfg.descriptor_source == "patch"

        def _extract_impl(sp_params, image_u8, mask=None, rect_map=undistort_map):
            img = image_u8.astype(jnp.float32) / 255.0
            if rect_map is not None:
                img = remap_bilinear(img, rect_map)
            out = superpoint.forward(
                sp_params, img[None, :, :, None], nms_radius=sp_cfg.nms_radius,
                compute_dtype=compute_dtype, return_raw_scores=sp_cfg.subpixel,
            )
            scores, desc = out[0], out[1]
            raw = out[2][0] if sp_cfg.subpixel else None
            bank = select_keypoints(
                scores[0],
                desc[0],
                capacity=capacity,
                threshold=sp_cfg.keypoint_threshold,
                border=sp_cfg.remove_borders,
                max_keypoints=sp_cfg.max_keypoints,
                mask=mask,
                raw_scores=raw,
            )
            if use_patch_desc:
                from ur_mvo_tpu.ops.gridsample import patch_descriptors

                bank = bank._replace(desc=patch_descriptors(img, bank.kpts))
            return bank

        @jax.jit
        def _extract(sp_params, image_u8: jax.Array, mask: jax.Array) -> FeatureBank:
            return _extract_impl(sp_params, image_u8, mask)

        @jax.jit
        def _extract_nomask(sp_params, image_u8: jax.Array) -> FeatureBank:
            return _extract_impl(sp_params, image_u8)

        if undistort_map_right is undistort_map:
            # No distinct right calibration: reuse the left programs (no
            # extra compilations).
            _extract_right, _extract_right_nomask = _extract, _extract_nomask
        else:
            @jax.jit
            def _extract_right(sp_params, image_u8: jax.Array, mask: jax.Array) -> FeatureBank:
                return _extract_impl(sp_params, image_u8, mask, rect_map=undistort_map_right)

            @jax.jit
            def _extract_right_nomask(sp_params, image_u8: jax.Array) -> FeatureBank:
                return _extract_impl(sp_params, image_u8, rect_map=undistort_map_right)

        matcher = self._matcher
        # explicit config value > checkpoint-embedded calibration > 0.5
        self.match_threshold = match_threshold = superglue.resolve_matching_threshold(sg_cfg)

        def _match_impl(sg_params, key, bank0: FeatureBank, bank1: FeatureBank, outlier_rejection: bool = True,
                        floor: "int | None" = None) -> Matches:
            from ur_mvo_tpu.ops.nn_matcher import match_nn

            if floor is None:
                floor = sg_cfg.nn_fallback_min_matches

            def _nn():
                return match_nn(bank0, bank1, sg_cfg.nn_min_similarity,
                                sg_cfg.nn_ratio, center=sg_cfg.nn_center)

            def _sg():
                Z = superglue.match_scores(
                    sg_params,
                    bank0,
                    bank1,
                    sg_cfg.image_width,
                    sg_cfg.image_height,
                    sinkhorn_iterations=sg_cfg.sinkhorn_iterations,
                    compute_dtype=compute_dtype,
                    num_heads=sg_num_heads,
                    use_pallas_sinkhorn=use_pallas_sink,
                    use_pallas_attention=use_pallas_attn,
                )
                return decode_assignment(Z, bank0.valid, bank1.valid, match_threshold,
                                         margin=sg_cfg.match_margin)

            def _select(cond, a: Matches, b: Matches) -> Matches:
                return Matches(
                    idx1=jnp.where(cond, a.idx1, b.idx1),
                    score=jnp.where(cond, a.score, b.score),
                    valid=jnp.where(cond, a.valid, b.valid),
                )

            if matcher == "nn":
                m = _nn()
            elif matcher == "hybrid":
                # Metric-setup production policy (round-4 verdict item 2,
                # measured): mutual-NN PRIMARY — its ratio test rejects
                # the texture-aliased pairs Sinkhorn confidently accepts
                # on clean repetitive scenes (rgbd/3d metric: nn 0.056 vs
                # sg 0.33) — with SuperGlue substituted in the SAME
                # program when NN starves (photometric decay collapses
                # raw descriptors: mono/decay nn 0.44 vs sg 0.01).
                m_nn = _nn()
                m_sg = _sg()
                m = _select(m_nn.num_valid() < (floor or 40), m_sg, m_nn)
            else:
                m = _sg()
                if floor > 0:
                    # min-match floor: too few confident SG matches ->
                    # substitute mutual-NN in the SAME program (rescues
                    # init retries and mid-sequence dropout frames; the
                    # reference's recovery ladder never hard-fails a
                    # sequence, tracking.cc:254-276, 500-513)
                    m_nn = _nn()
                    m = _select(m.num_valid() < floor, m_nn, m)
            if outlier_rejection:
                p0, p1, valid = gather_match_points(m, bank0.kpts, bank1.kpts)
                res = ransac_fundamental(key, p0, p1, valid, iterations=200, sigma=1.0)
                # Only filter when RANSAC had enough support (cv path
                # skips rejection for tiny match sets).
                enough = m.num_valid() >= 8
                keep = jnp.where(enough, res.inliers, valid)
                m = filter_matches(m, keep)
            return m

        self._extract_fn = _extract
        self._extract_nomask_fn = _extract_nomask
        self._extract_right_fn = _extract_right
        self._extract_right_nomask_fn = _extract_right_nomask
        # Resolution buckets (super_point.cpp:55-61 parity — the TRT
        # engine takes any 100^2-1500^2 H x W in one engine; XLA compiles
        # per shape, so inputs are edge-padded to a small ladder of
        # bucket shapes and each bucket compiles ONCE). Bucket programs
        # are built lazily per (bucket, side) with the rectify map
        # extended by identity coordinates over the pad region.
        self._buckets = None
        if sp_cfg.resolution_buckets:
            self._buckets = sorted((int(h), int(w)) for h, w in sp_cfg.resolution_buckets)
        self._bucket_progs = {}
        self._extract_impl = _extract_impl
        self._undistort_maps = {False: undistort_map, True: undistort_map_right}
        self._match_fn = partial(jax.jit, static_argnames=("outlier_rejection",))(_match_impl)
        # Traceable (un-jitted) matcher for callers that fuse matching
        # into a larger device program (the tracker's fused frame step):
        # composing at trace level keeps match+track ONE dispatch and
        # ONE readback per frame instead of two programs with host
        # gathers in between.
        self.match_traceable = _match_impl
        # Traceable extractor (left camera, no mask) for the multi-frame
        # chunk scan, which fuses extract+match+track for C frames into
        # one program: (sp_params, image_u8) -> FeatureBank. The right
        # variant rectifies with the right-camera map (camera.cc:117-127)
        # for the stereo chunk kernel.
        self.extract_traceable = _extract_impl
        if undistort_map_right is undistort_map:
            self.extract_right_traceable = _extract_impl
        else:
            self.extract_right_traceable = (
                lambda sp_params, image_u8: _extract_impl(
                    sp_params, image_u8, rect_map=undistort_map_right))
        self._key = jax.random.PRNGKey(cfg.runtime.seed + 1)

    def _bucket_program(self, bh: int, bw: int, right: bool):
        key = (bh, bw, right)
        prog = self._bucket_progs.get(key)
        if prog is None:
            base = self._undistort_maps[right]
            if base is not None:
                m = np.asarray(base)
                H0, W0 = m.shape[:2]
                # identity (x, y) source coords over the pad region; the
                # calibrated map covers its top-left crop (bucketed
                # inputs are top-left crops of the calibrated sensor, so
                # absolute source coordinates stay valid)
                mp = np.stack(
                    np.meshgrid(np.arange(bw, dtype=np.float32),
                                np.arange(bh, dtype=np.float32)), -1)
                mp[: min(H0, bh), : min(W0, bw)] = m[:bh, :bw]
                rect = jnp.asarray(mp)
            else:
                rect = None
            impl = self._extract_impl
            prog = jax.jit(lambda sp, img, msk: impl(sp, img, msk, rect_map=rect))
            self._bucket_progs[key] = prog
        return prog

    def _extract_bucketed(self, image: np.ndarray, mask, right: bool) -> FeatureBank:
        """Pad-to-bucket path: edge-pad bottom/right to the smallest
        bucket that fits, mask the pad region (plus the true bottom/right
        border margin, reproducing remove_borders at the TRUE edges) out
        of keypoint selection, and run that bucket's one compiled
        program. Keypoint coordinates are unchanged by the padding."""
        image = np.asarray(image)
        h, w = image.shape[:2]
        # smallest-AREA fitting bucket, not first in (h, w) sort order —
        # with a mixed-aspect ladder the lexicographic first fit can be a
        # far larger bucket than necessary
        fits = [(bh * bw, bh, bw) for bh, bw in self._buckets if bh >= h and bw >= w]
        if not fits:
            raise ValueError(
                f"input {h}x{w} exceeds every resolution bucket {self._buckets}")
        _, bh, bw = min(fits)
        img = np.pad(image, ((0, bh - h), (0, bw - w)), mode="edge") if (h, w) != (bh, bw) else image
        b = self.cfg.superpoint.remove_borders
        m = np.ones((bh, bw), np.uint8)
        if mask is not None:
            m[:h, :w] = (np.asarray(mask) != 0)[:h, :w]
        if h < bh:
            m[max(h - b, 0):, :] = 0
        if w < bw:
            m[:, max(w - b, 0):] = 0
        prog = self._bucket_program(bh, bw, right)
        return prog(self.sp_params, jnp.asarray(img), jnp.asarray(m))

    def extract(self, image: np.ndarray, mask: Optional[np.ndarray] = None, right: bool = False) -> FeatureBank:
        """``right=True`` rectifies with the right-camera map when the
        calibration ships one (parity with ``camera.cc:117-127``)."""
        if self._buckets is not None:
            return self._extract_bucketed(image, mask, right)
        if right:
            if mask is not None:
                return self._extract_right_fn(self.sp_params, jnp.asarray(image), jnp.asarray(mask))
            return self._extract_right_nomask_fn(self.sp_params, jnp.asarray(image))
        if mask is not None:
            return self._extract_fn(self.sp_params, jnp.asarray(image), jnp.asarray(mask))
        return self._extract_nomask_fn(self.sp_params, jnp.asarray(image))

    def match(self, bank0: FeatureBank, bank1: FeatureBank, outlier_rejection: bool = True) -> Matches:
        self._key, sub = jax.random.split(self._key)
        return self._match_fn(self.sg_params, sub, bank0, bank1, outlier_rejection)

    def reset_state(self) -> None:
        """Re-seed the match-RANSAC key stream so an engine reset
        reproduces a fresh engine run (Tracker.reset_state)."""
        self._key = jax.random.PRNGKey(self.cfg.runtime.seed + 1)


class OracleExtractor:
    """Ground-truth feature oracle over a synthetic scene.

    ``points``: (N, 3) world points with N <= capacity. Each point owns a
    fixed slot identity; ``extract`` projects the visible ones through the
    frame's ground-truth camera pose (passed via ``Frame.meta['T_wc']``)
    and ``match`` associates by slot identity — perfect data association,
    configurable pixel noise and dropout.
    """

    def __init__(
        self,
        points: np.ndarray,
        camera: Camera,
        capacity: int = 1024,
        noise_px: float = 0.0,
        dropout: float = 0.0,
        seed: int = 0,
    ):
        self.points = np.asarray(points, dtype=np.float32)
        self.camera = camera
        self.capacity = int(capacity)
        assert self.points.shape[0] <= self.capacity
        self.noise_px = noise_px
        self.dropout = dropout
        self.rng = np.random.default_rng(seed)
        # Distinct descriptors per landmark (unit norm).
        D = 256
        desc = self.rng.normal(size=(self.points.shape[0], D)).astype(np.float32)
        self.desc = desc / np.linalg.norm(desc, axis=1, keepdims=True)
        # post-descriptor-draw generator state, restored by reset_state
        # so reset runs reproduce a fresh oracle's noise/dropout stream
        self._rng_state0 = self.rng.bit_generator.state

    def extract_with_pose(self, T_wc: np.ndarray, right: bool = False) -> FeatureBank:
        n = self.points.shape[0]
        R_wc = np.asarray(T_wc[:3, :3])
        t_wc = np.asarray(T_wc[:3, 3])
        if right:
            # right camera: shifted along the left camera's x-axis by the
            # baseline b = bf / fx
            baseline = self.camera.bf / self.camera.fx
            t_wc = t_wc + R_wc @ np.array([baseline, 0.0, 0.0])
        pc = (self.points - t_wc) @ R_wc  # R_cw = R_wc^T
        z = pc[:, 2]
        cam = self.camera
        u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
        v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
        if self.noise_px > 0:
            u = u + self.rng.normal(scale=self.noise_px, size=n)
            v = v + self.rng.normal(scale=self.noise_px, size=n)
        visible = (z > 0.05) & (u >= 0) & (u <= cam.width - 1) & (v >= 0) & (v <= cam.height - 1)
        if self.dropout > 0:
            visible &= self.rng.random(n) > self.dropout

        K = self.capacity
        kpts = np.zeros((K, 2), np.float32)
        desc = np.zeros((K, self.desc.shape[1]), np.float32)
        scores = np.zeros((K,), np.float32)
        valid = np.zeros((K,), bool)
        kpts[:n] = np.stack([u, v], axis=1)
        desc[:n] = self.desc
        scores[:n] = 1.0
        valid[:n] = visible
        kpts[~valid] = 0
        return FeatureBank(
            scores=jnp.asarray(scores * valid),
            kpts=jnp.asarray(kpts * valid[:, None]),
            desc=jnp.asarray(desc * valid[:, None]),
            valid=jnp.asarray(valid),
        )

    def reset_state(self) -> None:
        """Restore the noise/dropout stream to its fresh-oracle state
        (Tracker.reset_state reproducibility)."""
        self.rng.bit_generator.state = self._rng_state0

    def extract(self, image, mask=None, frame=None) -> FeatureBank:
        raise NotImplementedError("OracleExtractor requires extract_with_pose(T_wc)")

    def match(self, bank0: FeatureBank, bank1: FeatureBank, outlier_rejection: bool = True) -> Matches:
        # Slot-identity association: slot i matches slot i when both valid.
        both = np.asarray(bank0.valid) & np.asarray(bank1.valid)
        K = both.shape[0]
        idx1 = np.where(both, np.arange(K, dtype=np.int32), -1)
        return Matches(
            idx1=jnp.asarray(idx1),
            score=jnp.asarray(both.astype(np.float32)),
            valid=jnp.asarray(both),
        )
