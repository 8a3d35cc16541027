"""Public engine API.

Parity with the reference's Python surface
(``/root/reference/ur_mvo/engine.py`` + pybind ``main_py.cpp``):
``UR_MVO(config, setup)`` with ``process(Frame) -> List[Pose] | None``,
SLERP interpolation of frames the backend dropped (``engine.py:22-40``),
``process_directory``, ``reset``, ``shutdown`` — minus the reference's
quirks that are bugs, not features (no 30 ms sleep + poll, no YAML
rewriting on disk; poses come back synchronously from the tracker).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from ur_mvo_tpu.camera import Camera, make_pinhole
from ur_mvo_tpu.components import Frame, Image, Pose, Setup, interpolate
from ur_mvo_tpu.config import Configs
from ur_mvo_tpu.runtime.extractor import NeuralExtractor
from ur_mvo_tpu.runtime.frontend import Tracker
from ur_mvo_tpu.utils.tum_io import write_tum


def _load_image(path: str) -> np.ndarray:
    """Grayscale image load without OpenCV (PGM/PNG via PIL if present,
    else raw npy)."""
    if path.endswith(".npy"):
        return np.load(path)
    try:
        from PIL import Image as PILImage

        return np.asarray(PILImage.open(path).convert("L"))
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(f"cannot load {path}: PIL unavailable") from e


class UR_MVO:
    """Drop-in equivalent of the reference's ``UR_MVO`` engine class."""

    def __init__(
        self,
        config: Union[dict, Configs, str, None] = None,
        setup: Setup = Setup.MONO,
        camera: Optional[Camera] = None,
        extractor=None,
    ):
        self._build(config, setup, camera, extractor)

    _compile_cache_set = False

    def _build(self, config, setup, camera=None, extractor=None):
        # Persistent XLA compilation cache: the analog of the reference's
        # serialized TensorRT engine caches (super_point.cpp:402-438) —
        # first build is slow, subsequent process startups reuse it.
        if not UR_MVO._compile_cache_set:
            import jax

            cache_dir = os.environ.get("URMVO_COMPILE_CACHE", os.path.expanduser("~/.cache/ur_mvo_tpu/xla"))
            try:
                # TPU only: XLA:CPU AOT (de)serialization is unreliable
                # across machine-feature mismatches (observed: loader
                # warnings, and a segfault in put_executable_and_time
                # writing a large CPU executable), and CPU recompiles are
                # cheap anyway. On TPU the cache is the analog of the
                # reference's serialized engines and saves minutes.
                if jax.default_backend() == "tpu":
                    os.makedirs(cache_dir, exist_ok=True)
                    jax.config.update("jax_compilation_cache_dir", cache_dir)
                    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                pass
            UR_MVO._compile_cache_set = True
        if isinstance(config, Configs):
            cfg = config
        elif isinstance(config, str):
            cfg = Configs.from_yaml(config, setup)
        elif isinstance(config, dict):
            cfg = Configs.from_dict(config, setup)
        else:
            cfg = Configs(sensor_setup=setup)
        cfg.sensor_setup = setup
        self.config = cfg
        self.setup = setup

        if camera is not None:
            self.camera = camera
        elif cfg.camera_config_path:
            self.camera = Camera.from_yaml(cfg.camera_config_path)
        else:
            self.camera = make_pinhole(
                cfg.superglue.image_width, cfg.superglue.image_height,
                400.0, 400.0, cfg.superglue.image_width / 2, cfg.superglue.image_height / 2,
            )
        # keep the matcher's keypoint-normalization dimensions in sync
        # with the actual camera (the reference reads them from separate
        # config keys and they can silently disagree)
        cfg.superglue.image_width = self.camera.width
        cfg.superglue.image_height = self.camera.height
        self._injected_camera = camera
        self._injected_extractor = extractor
        self.extractor = extractor or NeuralExtractor(cfg, self.camera)
        self.tracker = Tracker(cfg, self.camera, self.extractor)

        self.last_pose: Optional[Pose] = None
        self.accumulated_samples = 0
        self._trajectory: List[tuple] = []  # (timestamp, Pose)
        # (timestamp, bank, bank_right) of a frame whose extraction was
        # dispatched ahead of time — see process(next_data=...)
        self._prefetched: Optional[tuple] = None

    # ------------------------------------------------------------------

    def _extract_banks(self, data: Frame):
        """Dispatch the extraction device program(s) for one frame.

        Returns (bank, bank_right) of device arrays WITHOUT synchronizing
        — JAX async dispatch means the host returns immediately while the
        device crunches, which is what makes frame-ahead prefetching
        (process(next_data=...)) overlap device inference with host
        bookkeeping (the reference gets the same overlap from its
        dedicated extraction thread, tracking.cc:57-59)."""
        image = data.image.get_image()
        mask = data.mask.get_mask() if data.mask is not None else None
        bank_right = None
        if hasattr(self.extractor, "extract_with_pose") and "T_wc" in data.meta:
            bank = self.extractor.extract_with_pose(data.meta["T_wc"])
            if self.setup == Setup.STEREO:
                bank_right = self.extractor.extract_with_pose(data.meta["T_wc"], right=True)
        else:
            bank = self.extractor.extract(image, mask)
            if self.setup == Setup.STEREO and data.right_image is not None:
                # right=True selects the RIGHT_K/D/R/P rectify map when
                # the calibration provides one (camera.cc:117-127)
                bank_right = self.extractor.extract(data.right_image.get_image(), mask, right=True)
        return bank, bank_right

    def process(self, data: Frame, next_data: Optional[Frame] = None) -> Optional[List[Pose]]:
        """Feed one frame; returns interpolated poses when the backend
        produced a keyframe pose, else None (reference semantics).

        ``next_data``: optional lookahead frame — its extraction is
        dispatched to the device *before* this frame's tracking/host
        bookkeeping runs, so frame i+1's inference overlaps frame i's
        host work (2-stage pipeline parity with ``tracking.cc:57-59``).
        The next ``process`` call picks the prefetched banks up by
        timestamp."""
        ts = data.image.get_timestamp()
        depth_lookup = self._make_depth_lookup(data)

        # Prefetch adoption is keyed on the Frame object's IDENTITY, not
        # its timestamp: frames whose filenames don't parse carry
        # ts=None, and None == None would adopt a stale bank for ANY
        # frame if the caller skips or reorders frames.
        if self._prefetched is not None and self._prefetched[0] is data:
            bank, bank_right = self._prefetched[1], self._prefetched[2]
        else:
            bank, bank_right = self._extract_banks(data)
        self._prefetched = None
        if next_data is not None:
            nb, nbr = self._extract_banks(next_data)
            self._prefetched = (next_data, nb, nbr)

        pose_mat = self.tracker.process(bank, ts, depth_lookup, bank_right=bank_right)
        return self._emit(ts, pose_mat)

    def _make_depth_lookup(self, data: Frame):
        if self.setup != Setup.RGBD or data.depth_map is None:
            return None
        depth_img = data.depth_map.get_depth_map()

        def depth_lookup(kpts, _d=depth_img):
            c = np.clip(kpts[:, 0].astype(int), 0, _d.shape[1] - 1)
            r = np.clip(kpts[:, 1].astype(int), 0, _d.shape[0] - 1)
            raw = _d[r, c].astype(np.float32)
            # reference RGB-D scaling: d = 100 / pixel for pixel in
            # [50, 200] (tracking.cc:440-447); pass metric depth
            # images through unchanged.
            if _d.dtype == np.uint8:
                ok = (raw >= 50) & (raw <= 200)
                return np.where(ok, 100.0 / (raw + 1e-5), 0.0)
            return raw

        return depth_lookup

    def _emit(self, ts, pose_mat) -> Optional[List[Pose]]:
        """Keyframe-pose emission + SLERP fill of dropped frames
        (reference engine.py:22-40 semantics)."""
        if pose_mat is None:
            self.accumulated_samples += 1
            return None
        current = Pose(pose_mat[:3, :3], pose_mat[:3, 3], np.eye(6))
        self._trajectory.append((ts, current))
        if self.last_pose is None:
            self.last_pose = current
            self.accumulated_samples = 0
            return [current]
        res = interpolate(self.last_pose, current, self.accumulated_samples)
        self.accumulated_samples = 0
        self.last_pose = current
        return res

    def process_sequence(self, frames: List[Frame]) -> List[Optional[List[Pose]]]:
        """Chunked sequence driver: with ``runtime.chunk_frames = C > 1``
        and an initialized mono/stereo/RGB-D neural tracker, frames go
        through the multi-frame chunk program (ONE dispatch + ONE packed
        readback per C frames — Tracker.process_chunk; the stereo
        variant folds right extraction + disparity gating in too);
        initialization, masks, and weak-tracking recoveries fall back to
        the per-frame path. Per-frame return values match process()."""
        C = int(self.config.runtime.chunk_frames or 0)
        outs: List[Optional[List[Pose]]] = [None] * len(frames)
        stereo = self.setup == Setup.STEREO
        chunk_setup = self.setup in (Setup.MONO, Setup.RGBD, Setup.STEREO)
        i = 0
        pending_bank = None  # weak-event bank handed back by the chunk
        pf_count = 0  # forced per-frame frames (weak-event hysteresis)
        while i < len(frames):
            f = frames[i]
            n = min(C, len(frames) - i) if C > 1 else 0
            batch = frames[i : i + n]
            chunkable = (
                n > 1
                and chunk_setup
                and pending_bank is None
                and pf_count == 0
                and self.tracker.chunk_available()
                and all(fr.mask is None for fr in batch)
                and (not stereo or all(fr.right_image is not None for fr in batch))
            )
            if pf_count > 0:
                pf_count -= 1
            if not chunkable:
                ts = f.image.get_timestamp()
                if pending_bank is not None:
                    # the chunk already extracted this frame's features
                    pose_mat = self.tracker.process(
                        pending_bank.resolve(), ts, self._make_depth_lookup(f))
                    pending_bank = None
                    outs[i] = self._emit(ts, pose_mat)
                else:
                    # Prefetch the next frame whenever IT will also take
                    # the per-frame path (stereo/masked/uninitialized
                    # stretches) — chunk mode used to disable the
                    # lookahead wholesale, serializing extract after
                    # track exactly where per-frame processing persists.
                    # A prefetch wasted on a frame that ends up chunked
                    # costs one extract dispatch; losing one costs a
                    # serialized frame period.
                    nxt = None
                    if i + 1 < len(frames):
                        nf = frames[i + 1]
                        if (C <= 1 or not chunk_setup or nf.mask is not None
                                or not self.tracker.chunk_available()):
                            nxt = nf
                    outs[i] = self.process(f, next_data=nxt)
                i += 1
                continue
            imgs = np.stack([fr.image.get_image() for fr in batch])
            imgs_r = (
                np.stack([fr.right_image.get_image() for fr in batch]) if stereo else None
            )
            if n < C:  # pad so every chunk compiles the same program
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], C - n, axis=0)])
                if imgs_r is not None:
                    imgs_r = np.concatenate([imgs_r, np.repeat(imgs_r[-1:], C - n, axis=0)])
            ts_list = [fr.image.get_timestamp() for fr in batch]
            dls = [self._make_depth_lookup(fr) for fr in batch] if self.setup == Setup.RGBD else None
            results, consumed, weak_bank = self.tracker.process_chunk(
                imgs, ts_list, depth_lookups=dls, n_valid=n, images_right=imgs_r)
            for j, pose_mat in enumerate(results):
                outs[i + j] = self._emit(ts_list[j], pose_mat)
            i += consumed
            if weak_bank is not None:
                # weak-event hysteresis: the frame after a weak retry is
                # statistically likely to be weak again (measured: the
                # bench scene shows back-to-back weak cuts, and a chunk
                # dispatch that consumes 0-1 frames costs full relay
                # round trips to discover what the per-frame path finds
                # in one) — force the next frame per-frame as well
                # (2 = the pending weak frame itself + one more)
                pf_count = 2
            if stereo and weak_bank is not None:
                # the per-frame retry needs the RIGHT bank too (promote
                # path may insert a keyframe and must keep its stereo
                # seeds) — drop the handed-back left bank and let the
                # per-frame path re-extract both
                weak_bank = None
                pf_count = 2
            pending_bank = weak_bank
        return outs

    def process_directory(self, directory: str) -> List[Pose]:
        """EuRoC-style layout: ``cam0/data/*.png`` (+``cam1`` for stereo),
        19-digit ns timestamps in filenames (parity with ``dataset.cc``)."""
        directory = Path(directory)
        data_dir = directory / "cam0" / "data"
        assert data_dir.is_dir(), f"{data_dir} missing"
        poses: List[Pose] = []

        def load(name):
            stem = name.split(".")[0]
            try:
                ts = int(stem) * 1e-9 if len(stem) >= 16 else float(stem)
            except ValueError:
                ts = None
            img = _load_image(str(data_dir / name))
            return Frame(image=Image(img, ts))

        names = sorted(os.listdir(data_dir))
        nxt = load(names[0]) if names else None
        for i in range(len(names)):
            cur, nxt = nxt, (load(names[i + 1]) if i + 1 < len(names) else None)
            out = self.process(cur, next_data=nxt)
            if out is not None:
                poses.extend(out)
        return poses

    # ------------------------------------------------------------------

    def keyframe_trajectory(self):
        """(timestamps, positions (N,3), quaternions (N,4) wxyz) of all
        keyframes after optimization (Mapping::SaveKeyframeTrajectory)."""
        import jax.numpy as jnp

        from ur_mvo_tpu.ops.lie import rotmat_to_quat

        self.tracker.backend.flush_pending_ba()
        ts, R, t = self.tracker.backend.store.trajectory()
        quats = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        return ts, t.astype(np.float64), quats

    def save_trajectory(self, path: str) -> None:
        ts, t, q = self.keyframe_trajectory()
        write_tum(path, list(ts), t, q)

    def save_map_snapshot(self, path: str) -> None:
        """Persist the full map state (keyframes, mappoints, observer
        matrix, covisibility, descriptor banks, loop edges) as npz for
        resume or localization-mode reuse. The reference has no map
        persistence at all (SURVEY §5: TRT engine caches + trajectory
        text only)."""
        self.tracker.backend.flush_pending_ba()
        self.tracker.backend.store.save_snapshot(path)

    def load_map_snapshot(self, path: str) -> None:
        """Load a saved map and enter LOCALIZATION mode: the tracker
        starts initialized against the stored map (newest keyframe as
        reference, relocalization pre-armed and force-enabled), so the
        next frames either resume tracking or re-anchor anywhere in the
        map (Tracker.adopt_map)."""
        from ur_mvo_tpu.runtime.map_store import MapStore

        backend = self.tracker.backend
        backend.flush_pending_ba()
        backend.store = MapStore.load_snapshot(path, backend.store.cfg)
        self.config.backend.relocalization = True
        self.tracker.adopt_map()
        self.last_pose = None
        self.accumulated_samples = 0
        self._trajectory = []

    def save_map_ply(self, path: str) -> None:
        """Dump the triangulated map cloud as PLY (the reference streams
        it to rviz, ``ros2_publisher.cc:132-164``; here it is a file)."""
        from ur_mvo_tpu.utils.viz import save_map_ply

        self.tracker.backend.flush_pending_ba()
        st = self.tracker.backend.store
        good = st.mp_good & ~st.mp_bad
        save_map_ply(path, st.mp_pos[good])

    def reset(self, config=None, setup: Optional[Setup] = None) -> None:
        """Fresh map/trajectory (parity with ``main_py.cpp:257-267``,
        which builds a whole new Tracking instance). Injected
        camera/extractor survive the reset.

        With unchanged config/setup this is a STATE reset: the compiled
        device programs are kept — rebuilding the jit closures forces a
        full retrace (tens of seconds of host CPU; the reference pays an
        analogous TensorRT-engine rebuild only because its state and
        engines live in one object graph)."""
        if config is None and (setup is None or setup == self.setup):
            self.tracker.reset_state()
            self.last_pose = None
            self.accumulated_samples = 0
            self._trajectory = []
            self._prefetched = None
            return
        self._build(
            config if config is not None else self.config,
            setup if setup is not None else self.setup,
            camera=self._injected_camera,
            extractor=self._injected_extractor,
        )

    def shutdown(self) -> None:
        pass
