#!/usr/bin/env python
"""Multi-sequence concurrent VO from the command line.

Runs S independent sequences lock-step on one device with the dominant
device work (SuperPoint extraction + SuperGlue matching) batched across
sequences (``parallel/multi_seq.MultiSequenceVO`` — the workload class
the reference serializes behind a GPU mutex, ``tracking.h:134-135``).
Each sequence keeps its own map/trajectory; per-sequence TUM keyframe
files and (with ``--gt``) ATE JSON lines are written.

  python scripts/run_vo_multi.py --images seqA seqB [seqC ...] \
      --results out/ [--gt gtA gtB ...] [--weights w.npz] [--platform cpu]

All sequences must share image size and calibration (the first
sequence's ``camera.yaml`` is used). Processing runs to the SHORTEST
sequence length (lock-step batching).
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
    ap.add_argument("--images", nargs="+", required=True, help="sequence dirs (EuRoC layout)")
    ap.add_argument("--gt", nargs="*", default=None, help="per-sequence TUM ground truth")
    ap.add_argument("--results", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--matcher", default=None, choices=["auto", "superglue", "nn"])
    ap.add_argument("--sg-weights", default=None)
    ap.add_argument("--kpt-threshold", type=float, default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--stride", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ur_mvo_tpu.camera import Camera
    from ur_mvo_tpu.components import Setup
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.dataset import Dataset
    from ur_mvo_tpu.parallel.multi_seq import MultiSequenceVO
    from ur_mvo_tpu.utils.metrics import ate_rmse
    from ur_mvo_tpu.utils.tum_io import associate, read_tum, write_tum

    cfg = Configs.from_yaml(args.config, Setup.MONO) if args.config else Configs()
    if args.weights:
        cfg.superpoint.weights_path = args.weights
    if args.matcher:
        cfg.superglue.matcher = args.matcher
    if args.sg_weights:
        cfg.superglue.weights_path = args.sg_weights
    if args.kpt_threshold is not None:
        cfg.superpoint.keypoint_threshold = args.kpt_threshold
    # NOTE: no shipped-matcher auto-discovery here (unlike run_vo.py) —
    # the batched multi-sequence SuperGlue path is not yet
    # gate-validated with the shipped checkpoint (measured: 12-frame
    # plane sequences fail to initialize under its operating point).
    # Pass --sg-weights weights/superglue_v3scene.npz to opt in.
    seq_cam = os.path.join(args.images[0], "camera.yaml")
    if cfg.camera_config_path is None and os.path.exists(seq_cam):
        cfg.camera_config_path = seq_cam
    if cfg.camera_config_path is None:
        raise SystemExit("no calibration: pass --config or put camera.yaml in the first sequence dir")
    camera = Camera.from_yaml(cfg.camera_config_path)

    datasets = [Dataset(d) for d in args.images]
    S = len(datasets)
    n = min(len(d) for d in datasets)
    msvo = MultiSequenceVO(cfg, camera, num_sequences=S)
    os.makedirs(args.results, exist_ok=True)

    t0 = time.perf_counter()
    for f in range(n):
        frames = [d.get(f) for d in datasets]
        images = np.stack([fr.image for fr in frames])
        msvo.process_batch(images, [fr.time for fr in frames])
    elapsed = time.perf_counter() - t0
    print(
        f"processed {S} sequences x {n} frames in {elapsed:.1f}s "
        f"({S * n / max(elapsed, 1e-9):.1f} frames/s aggregate)",
        file=sys.stderr,
    )

    import jax.numpy as jnp

    from ur_mvo_tpu.ops.lie import rotmat_to_quat

    for i, (ts, R, t) in enumerate(msvo.trajectories()):
        name = os.path.basename(os.path.normpath(args.images[i])) or f"seq{i}"
        path = os.path.join(args.results, f"keyframes_{i}_{name}.txt")
        q = np.asarray(rotmat_to_quat(jnp.asarray(R))) if len(ts) else np.zeros((0, 4))
        write_tum(path, list(ts), np.asarray(t, np.float64), q)
        rec = {"seq": name, "n_keyframes": len(ts)}
        if args.gt and i < len(args.gt):
            gt_ts, gt_pos, _ = read_tum(args.gt[i])
            ia, ib = associate(np.asarray(ts), gt_ts)
            if len(ia) >= 3:
                rec["ate_rmse_m"] = round(
                    float(ate_rmse(np.asarray(t)[ia], gt_pos[ib], align=True, correct_scale=True)), 5
                )
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
