#!/usr/bin/env python
"""VO CLI: run a sequence directory, write a TUM trajectory, evaluate ATE.

Parity with the reference driver (``/root/reference/scripts/vo.py``):
reads a sorted image directory, feeds ``UR_MVO.process``, writes every
Nth pose to ``poses.txt`` (the Aqualoc GT rate is every 5 frames,
``vo.py:66-72``), and evaluates ATE with built-in Umeyama alignment +
scale correction instead of shelling out to ``evo_ape``.

Usage:
  python scripts/run_vo.py --images <seq_dir> [--config cfg.yaml]
      [--setup mono|stereo|rgbd] [--gt gt.txt|images.txt]
      [--results out_dir] [--stride 5] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="sequence root (EuRoC layout: cam0/data)")
    ap.add_argument("--config", default=None, help="YAML config (reference format)")
    ap.add_argument("--setup", default="mono", choices=["mono", "stereo", "rgbd"])
    ap.add_argument("--gt", default=None, help="ground truth (TUM txt or colmap images.txt)")
    ap.add_argument("--results", default="results")
    ap.add_argument("--stride", type=int, default=5, help="pose subsampling for poses.txt")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the run into DIR (view with TensorBoard/XProf)")
    ap.add_argument("--timing-csv", default=None, help="write per-stage host timing CSV")
    ap.add_argument("--plot", default=None, metavar="PNG",
                    help="save a top-down trajectory + map plot (matplotlib)")
    ap.add_argument("--save-map", default=None, metavar="PLY",
                    help="dump the triangulated map cloud as ASCII PLY")
    ap.add_argument("--save-snapshot", default=None, metavar="NPZ",
                    help="persist the full map state after the run (resume/localization)")
    ap.add_argument("--load-snapshot", default=None, metavar="NPZ",
                    help="load a saved map and start in localization mode "
                         "(relocalize into it instead of initializing a fresh map)")
    ap.add_argument("--weights", default=None,
                    help="SuperPoint checkpoint (.npz/.pth); overrides the config's superpoint.weights_path")
    ap.add_argument("--matcher", default=None, choices=["auto", "superglue", "nn"],
                    help="matcher override (nn = mutual nearest-neighbor, no learned weights needed)")
    ap.add_argument("--kpt-threshold", type=float, default=None,
                    help="detector score threshold override (the shipped from-scratch "
                         "checkpoints peak lower than the public SuperPoint: use 1e-4)")
    ap.add_argument("--sg-weights", default=None,
                    help="SuperGlue checkpoint (.npz/.pth); overrides superglue.weights_path")
    ap.add_argument("--masks", action="store_true",
                    help="feed semantic masks from <seq>/mask0/data (nonzero keeps a "
                         "pixel; the reference's processMonoWithMask path)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="process N frames per device program (chunked scan with "
                         "on-device keyframe rollover; mono/rgbd neural path). "
                         "0/1 = per-frame")
    ap.add_argument("--loop-closure", action="store_true",
                    help="enable online loop detection (Backend.detect_loop); verified "
                         "edges are consumed by the final --global-ba pose graph")
    ap.add_argument("--global-ba", action="store_true",
                    help="run global pose-graph optimization + full BA over all "
                         "keyframes after the sequence (Backend.global_optimize)")
    ap.add_argument("--reloc", action="store_true",
                    help="relocalize after tracking loss: re-anchor into the "
                         "existing map via retrieval + PnP (Backend.relocalize)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ur_mvo_tpu.components import Frame, Image, Setup
    from ur_mvo_tpu.dataset import Dataset, load_colmap_images_txt
    from ur_mvo_tpu.engine import UR_MVO
    from ur_mvo_tpu.utils.metrics import ate_rmse
    from ur_mvo_tpu.utils.tum_io import associate, read_tum, write_tum

    setup = {"mono": Setup.MONO, "stereo": Setup.STEREO, "rgbd": Setup.RGBD}[args.setup]
    from ur_mvo_tpu.config import Configs

    cfg = Configs.from_yaml(args.config, setup) if args.config else Configs()
    if args.weights:
        cfg.superpoint.weights_path = args.weights
    if args.matcher:
        cfg.superglue.matcher = args.matcher
    if args.kpt_threshold is not None:
        cfg.superpoint.keypoint_threshold = args.kpt_threshold
    if args.sg_weights:
        cfg.superglue.weights_path = args.sg_weights
    # shipped-matcher discovery: the in-repo SuperGlue checkpoint is
    # trained against the v3 detector's descriptor space, so it is the
    # default matcher exactly when that detector is in use (matcher
    # "auto" then resolves to superglue; see NeuralExtractor). It fires
    # on the pure-default path for EVERY sensor setup (no --config: a
    # config file states its own matcher choice) and ADOPTS the
    # checkpoint's embedded validated operating point — running the
    # matcher inside an untested detector configuration measurably
    # degrades VO. Per-setup matcher policy (round-4 verdict item 2,
    # pinned by ACCURACY.json means): MONO runs SuperGlue primary (beats
    # NN on every mono cell); STEREO/RGB-D run "hybrid" — mutual-NN
    # primary (its ratio test rejects the texture-aliased confident
    # Sinkhorn assignments that broke metric scale: rgbd/3d nn 0.056 vs
    # sg 0.33) with SuperGlue substituted in-program when NN starves
    # (photometric decay). Matches the reference running SuperGlue on
    # every setup (super_glue.cpp:166-241 via tracking.cc:338-377) while
    # beating its matcher where NN is measurably better.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shipped_sg = os.path.join(repo, "weights", "superglue_v3scene.npz")
    if (
        args.config is None
        and cfg.superglue.matcher != "nn"
        and cfg.superglue.weights_path is None
        and cfg.superpoint.weights_path
        and "superpoint_scratch_v3" in os.path.basename(cfg.superpoint.weights_path)
        and os.path.exists(shipped_sg)
    ):
        from ur_mvo_tpu.models.superglue import checkpoint_operating_point, resolve_matching_threshold

        cfg.superglue.weights_path = shipped_sg
        if args.setup != "mono" and cfg.superglue.matcher == "auto":
            # explicit --matcher superglue/hybrid wins over the policy
            cfg.superglue.matcher = "hybrid"
        op = checkpoint_operating_point(shipped_sg) or {}
        for k in ("capacity", "max_keypoints"):
            if k in op:
                setattr(cfg.superpoint, k, op[k])
        if "keypoint_threshold" in op and args.kpt_threshold is None:
            cfg.superpoint.keypoint_threshold = op["keypoint_threshold"]
        for k in ("min_matches", "min_features_first"):
            if k in op:
                setattr(cfg.initializer, k, op[k])
        # production robustness defaults (round-4 verdict item 1: the
        # reference's recovery ladder never hard-fails a sequence,
        # tracking.cc:254-276): relocalization re-anchors after loss,
        # and the INIT-ONLY NN min-match floor rescues two-view-init
        # attempts where the learned matcher leaves too little above
        # its confidence threshold (measured: rescues the mono/3d
        # 2-of-3-seed init failures; a floor on TRACKING frames instead
        # taxes the cells SG wins — plane 0.028->0.065).
        cfg.backend.relocalization = True
        if cfg.superglue.nn_fallback_min_matches_init == 0:
            cfg.superglue.nn_fallback_min_matches_init = 40
        print(f"using shipped SuperGlue matcher: {shipped_sg} "
              f"(threshold {resolve_matching_threshold(cfg.superglue)}, "
              f"operating point {op}, reloc+nn-floor on; "
              f"pass --matcher nn or --sg-weights to override)",
              file=sys.stderr)
    # dataset-local calibration (written by make_synthetic_dataset.py)
    seq_cam = os.path.join(args.images, "camera.yaml")
    if cfg.camera_config_path is None and os.path.exists(seq_cam):
        cfg.camera_config_path = seq_cam
    # Resolution-conditioned robustness (round-5 health audit): INSIDE
    # the validated envelope (~240x320, where ACCURACY.json gates the
    # checkpoints) pure SuperGlue tracks best and the floors stay
    # init-only; BEYOND it (>2x those pixels) the v3 descriptors'
    # patch-scale shift makes SG matching collapse mid-sequence on
    # repetitive texture (measured at 480p+: num_match -> 0 by frame
    # ~10, silent loss for the rest of the run) — engage the
    # TRACKING-time NN floor there too, which keeps the recovery ladder
    # alive (measured: the same 480p run stays anchored end-to-end).
    if (cfg.superglue.weights_path and cfg.superglue.matcher != "nn"
            and cfg.superglue.nn_fallback_min_matches == 0
            and cfg.camera_config_path and os.path.exists(cfg.camera_config_path)):
        try:
            from ur_mvo_tpu.camera import Camera

            c = Camera.from_yaml(cfg.camera_config_path)
            if c.width * c.height > 2 * 320 * 240:
                cfg.superglue.nn_fallback_min_matches = 40
                print(f"high-resolution input ({c.width}x{c.height}): tracking-time "
                      "NN min-match floor engaged (matcher envelope guard)",
                      file=sys.stderr)
        except Exception:
            pass
    if args.loop_closure:
        cfg.backend.loop_closure = True
    if args.reloc:
        cfg.backend.relocalization = True
    if args.chunk and args.chunk > 1:
        cfg.runtime.chunk_frames = args.chunk
    vo = UR_MVO(cfg, setup)
    if args.load_snapshot:
        vo.load_map_snapshot(args.load_snapshot)
        print(f"localization mode: loaded map snapshot {args.load_snapshot} "
              f"({vo.tracker.backend.store.num_keyframes()} keyframes)", file=sys.stderr)
    ds = Dataset(args.images, use_right=(setup == Setup.STEREO), use_depth=(setup == Setup.RGBD),
                 use_mask=args.masks)
    os.makedirs(args.results, exist_ok=True)

    all_ts, all_pos, all_quat = [], [], []
    profile_ctx = jax.profiler.trace(args.profile) if args.profile else None
    if profile_ctx:
        profile_ctx.__enter__()
    def to_frame(data):
        frame = Frame(image=Image(data.image, data.time))
        if data.image_right is not None:
            frame.right_image = Image(data.image_right, data.time)
        if data.depth is not None:
            from ur_mvo_tpu.components import DepthMap

            frame.depth_map = DepthMap(data.depth)
        if data.mask is not None:
            from ur_mvo_tpu.components import Mask

            frame.mask = Mask(data.mask)
        return frame

    def emit(poses, pending_ts):
        """Pair returned poses with the frames they belong to: process()
        emits one pose per frame since the last emission (SLERP-filled
        accumulated frames + the keyframe), so the LAST len(poses)
        pending timestamps are theirs — writing them all at the keyframe
        time floors the ATE at the intra-keyframe motion (~0.2 m on the
        synthetic sets) regardless of estimate quality."""
        # one pose per pending frame at most — a pose/timestamp
        # misalignment must fail loudly, not be hidden by zip truncation
        assert len(poses) <= len(pending_ts), (len(poses), len(pending_ts))
        for ts_k, p in zip(pending_ts[-len(poses):], poses):
            all_ts.append(ts_k)
            all_pos.append(p.translation)
            all_quat.append(p.quaternion)
        pending_ts.clear()

    t0 = time.perf_counter()
    pending_ts = []
    if args.chunk and args.chunk > 1:
        # chunked scan: blocks of frames through ONE device program each
        # (engine.process_sequence; falls back per-frame around init,
        # masks, and weak-tracking recoveries)
        block = []

        def flush_block():
            outs = vo.process_sequence([f for f, _ in block])
            for (f, ts_i), out in zip(block, outs):
                pending_ts.append(ts_i)
                if out:
                    emit(out, pending_ts)
            block.clear()

        for data in ds:
            block.append((to_frame(data), data.time))
            if len(block) >= args.chunk * 8:
                flush_block()
        if block:
            flush_block()
    else:
        # one-frame lookahead: the engine dispatches frame i+1's
        # extraction before frame i's tracking/host work, overlapping
        # device inference with host bookkeeping (the reference's
        # 2-thread pipeline, tracking.cc:57-59)
        prev = None  # (frame, time)
        for data in ds:
            frame = to_frame(data)
            if prev is not None:
                pending_ts.append(prev[1])
                poses = vo.process(prev[0], next_data=frame)
                if poses:
                    emit(poses, pending_ts)
            prev = (frame, data.time)
        if prev is not None:
            pending_ts.append(prev[1])
            poses = vo.process(prev[0])
            if poses:
                emit(poses, pending_ts)
    elapsed = time.perf_counter() - t0
    if profile_ctx:
        profile_ctx.__exit__(None, None, None)
    if args.timing_csv:
        vo.tracker.timer.write_csv(args.timing_csv)
    fps = len(ds) / max(elapsed, 1e-9)

    # every-Nth subsampling like the reference eval
    pose_path = os.path.join(args.results, "poses.txt")
    idx = np.arange(0, len(all_ts), args.stride)
    write_tum(pose_path, [all_ts[i] for i in idx], np.asarray(all_pos)[idx], np.asarray(all_quat)[idx])
    if args.global_ba:
        n_loops = len(vo.tracker.backend.store.loop_edges)
        vo.tracker.backend.global_optimize()
        print(f"global BA over {vo.tracker.backend.store.num_keyframes()} keyframes "
              f"({n_loops} loop edges)", file=sys.stderr)
    vo.save_trajectory(os.path.join(args.results, "keyframes.txt"))
    if args.save_map:
        vo.save_map_ply(args.save_map)
        print(f"map cloud -> {args.save_map}", file=sys.stderr)
    if args.save_snapshot:
        vo.save_map_snapshot(args.save_snapshot)
        print(f"map snapshot -> {args.save_snapshot}", file=sys.stderr)
    print(f"processed {len(ds)} frames in {elapsed:.1f}s ({fps:.1f} fps); "
          f"{len(all_ts)} poses -> {pose_path}", file=sys.stderr)

    if args.plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            st = vo.tracker.backend.store
            _, _, kt = vo.keyframe_trajectory()
            good = st.mp_good & ~st.mp_bad
            mp = st.mp_pos[good]
            fig, axp = plt.subplots(figsize=(7, 7))
            if len(mp):
                axp.scatter(mp[:, 0], mp[:, 2], s=1, c="#999999", label=f"map ({len(mp)} pts)")
            if len(kt):
                axp.plot(kt[:, 0], kt[:, 2], "b.-", lw=1.5, label=f"keyframes ({len(kt)})")
            axp.set_xlabel("x [m]")
            axp.set_ylabel("z [m]")
            axp.set_aspect("equal", adjustable="datalim")
            axp.legend()
            fig.savefig(args.plot, dpi=120, bbox_inches="tight")
            print(f"plot -> {args.plot}", file=sys.stderr)
        except Exception as e:  # plotting must never fail the run
            print(f"plot failed: {e}", file=sys.stderr)

    if args.gt:
        if args.gt.endswith("images.txt"):
            gt_ts, gt_pos, _ = load_colmap_images_txt(args.gt)
        else:
            gt_ts, gt_pos, _ = read_tum(args.gt)
        est_ts = np.asarray([all_ts[i] for i in idx])
        est_pos = np.asarray(all_pos)[idx]
        ia, ib = associate(est_ts, gt_ts, max_diff=0.1)
        if len(ia) < 3:
            print("WARNING: too few GT associations", file=sys.stderr)
        else:
            ate = ate_rmse(est_pos[ia], gt_pos[ib], align=True, correct_scale=True)
            print(json.dumps({"ate_rmse_m": round(float(ate), 5), "fps": round(fps, 2),
                              "n_poses": len(all_ts), "n_gt_matched": len(ia)}))


if __name__ == "__main__":
    main()
