#!/usr/bin/env python
"""Standing multi-seed accuracy benchmark over the scene matrix.

The reference's accuracy evidence is a per-sequence ATE table
(``/root/reference/README.md:78-92``, Aqualoc Harbor #1-#7). No Aqualoc
data or weights exist in this environment (BASELINE.md), so the standing
proxy is the synthetic scene matrix {plane, 3d, decay} x {mono, stereo,
rgbd} x N seeds with the production configuration — single 24-frame runs
swing 0.15-0.40 on PnP RNG alone (measured, CLAUDE.md), so every number
here is a seed MEAN with spread, and regression gates derive from these
means rather than catch-all constants.

ATE protocol: mono is Umeyama-aligned WITH scale correction (the
reference's ``evo_ape --align --correct_scale``, ``scripts/vo.py:73-75``);
stereo and RGB-D are aligned WITHOUT scale correction — they observe
metric scale, and a scale-corrected gate would hide seeding bugs (the
round-2 tautological-scale-test lesson).

Writes ``ACCURACY.json``; ``bench.py`` merges it into the bench JSON so
the driver's BENCH_r{N}.json carries the ate table (running 40+ VO
sequences inside the TPU bench run itself would multiply its runtime and
measure nothing device-side — accuracy is platform-independent, compute
it where CPU time is cheap).

Usage:
  python scripts/bench_accuracy.py --platform cpu            # full matrix
  python scripts/bench_accuracy.py --cells mono/plane,rgbd/3d --seeds 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

H, W, FX = 240, 320, 260.0
BASELINE_M = 0.12
FPS = 30.0

# scene family per cell: (n_planes, z_background, brightness_decay).
# plane cells exist only for mono: a constant-depth plane is
# yaw/x-translation DEGENERATE for metric VO (make_synthetic_dataset.py
# --scene notes) so stereo/rgbd run the 3d families only.
SCENES = {
    "plane": dict(n_planes=0, z_background=4.0, brightness_decay=0.0),
    "3d": dict(n_planes=3, z_background=6.0, brightness_decay=0.0),
    "decay": dict(n_planes=3, z_background=6.0, brightness_decay=0.04),
}
SETUP_SCENES = {
    "mono": ("plane", "3d", "decay"),
    "stereo": ("3d", "decay"),
    "rgbd": ("3d", "decay"),
}


def _production_cfg(matcher: str, sg_path: str = None, margin: float = None,
                    nn_floor: int = None, W: int = W, H: int = H,
                    long_run: bool = False):
    """The pure-default CLI configuration: v3 detector at the shipped
    SuperGlue checkpoint's embedded operating point (run_vo.py
    discovery), with either that matcher or the mutual-NN fallback.
    ``sg_path`` overrides the shipped checkpoint (candidate evaluation);
    ``margin``/``nn_floor`` override the decode ambiguity gate and
    NN-fallback floor (None = production defaults)."""
    from ur_mvo_tpu.config import Configs
    from ur_mvo_tpu.models.superglue import checkpoint_operating_point

    cfg = Configs()
    cfg.superpoint.weights_path = os.path.join(REPO, "weights", "superpoint_scratch_v3.npz")
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    sg_path = sg_path or os.path.join(REPO, "weights", "superglue_v3scene.npz")
    op = checkpoint_operating_point(sg_path) or {}
    cfg.superpoint.capacity = op.get("capacity", 1024)
    cfg.superpoint.max_keypoints = op.get("max_keypoints", 1000)
    cfg.superpoint.keypoint_threshold = op.get("keypoint_threshold", 1e-4)
    cfg.initializer.min_matches = op.get("min_matches", 60)
    cfg.initializer.min_features_first = op.get("min_features_first", 100)
    if matcher in ("sg", "hybrid"):
        cfg.superglue.weights_path = sg_path
        if matcher == "hybrid":
            cfg.superglue.matcher = "hybrid"
        if margin is not None:
            cfg.superglue.match_margin = margin
        # production default (run_vo.py discovery): INIT-ONLY NN
        # min-match floor + relocalization on — the recovery ladder that
        # keeps a weak stretch from hard-failing a sequence. --nn-floor
        # overrides the TRACKING floor for experiments.
        cfg.superglue.nn_fallback_min_matches_init = 40
        if nn_floor is not None:
            cfg.superglue.nn_fallback_min_matches = nn_floor
        cfg.backend.relocalization = True
    else:
        cfg.superglue.matcher = "nn"
    if long_run:
        # long-sequence production config: map maintenance + recovery ON
        # (culling keeps the store bounded over 100+ frames; loop closure
        # and relocalization are the capabilities the long out-and-back
        # protocol exists to exercise)
        cfg.backend.enable_culling = True
        cfg.backend.loop_closure = True
        cfg.backend.relocalization = True
        if matcher in ("sg", "hybrid"):
            # 480x640 is beyond the validated 240x320 envelope: the
            # run_vo resolution guard engages the tracking-time NN floor
            cfg.superglue.nn_fallback_min_matches = 40
    return cfg


def _run_sequence(vo, images, images_r, depths, setup):
    """Feed a rendered sequence through the engine with the run_vo pose/
    timestamp pairing (poses returned at keyframes cover the SLERP-filled
    frames since the last emission; the LAST len(poses) pending
    timestamps are theirs — run_vo.py::emit)."""
    import numpy as np

    from ur_mvo_tpu.components import DepthMap, Frame, Image

    n = len(images)
    frames = []
    for i in range(n):
        f = Frame(image=Image(images[i], i / FPS))
        if setup == "stereo":
            f.right_image = Image(images_r[i], i / FPS)
        if setup == "rgbd":
            f.depth_map = DepthMap(depths[i])
        frames.append(f)
    ts_out, pos_out = [], []
    pending = []
    for i in range(n):
        pending.append(i / FPS)
        poses = vo.process(frames[i], next_data=frames[i + 1] if i + 1 < n else None)
        if poses:
            assert len(poses) <= len(pending)
            for t, p in zip(pending[-len(poses):], poses):
                ts_out.append(t)
                pos_out.append(p.translation)
            pending.clear()
    return np.asarray(ts_out), np.asarray(pos_out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--out", default=os.path.join(REPO, "ACCURACY.json"))
    ap.add_argument("--matchers", default="nn,sg")
    ap.add_argument("--sg-path", default=None,
                    help="evaluate a candidate SuperGlue checkpoint instead of the shipped one")
    ap.add_argument("--cells", default=None,
                    help="comma list like mono/plane,stereo/3d (default: all)")
    ap.add_argument("--margin", type=float, default=None,
                    help="override superglue.match_margin (decode ambiguity gate)")
    ap.add_argument("--nn-floor", type=int, default=None,
                    help="override superglue.nn_fallback_min_matches")
    ap.add_argument("--long", action="store_true",
                    help="long-sequence protocol: 120-frame out-and-back "
                         "(loop-bearing) mono+rgbd cells at 480x640 with "
                         "culling/loop-closure/relocalization on; merges "
                         "into an existing ACCURACY.json")
    args = ap.parse_args()
    global H, W, FX
    if args.long:
        H, W, FX = 480, 640, 520.0
        if args.frames == 24:
            args.frames = 120

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.config import SensorSetup
    from ur_mvo_tpu.engine import UR_MVO
    from ur_mvo_tpu.utils.metrics import ate_rmse
    from ur_mvo_tpu.utils.synthscene import render_sequence

    matchers = args.matchers.split(",")
    wanted = set(args.cells.split(",")) if args.cells else None
    setups = {"mono": SensorSetup.MONO, "stereo": SensorSetup.STEREO, "rgbd": SensorSetup.RGBD}

    setup_scenes = SETUP_SCENES
    poses_long = None
    if args.long:
        from ur_mvo_tpu.utils.synthscene import out_and_back_trajectory

        setup_scenes = {"mono": ("long",), "rgbd": ("long",)}
        SCENES["long"] = dict(n_planes=3, z_background=6.0, brightness_decay=0.0)
        poses_long = out_and_back_trajectory(args.frames)

    results = {}
    engines = {}
    t_start = time.time()
    for setup in setup_scenes:
        cam = make_pinhole(W, H, FX, FX, W / 2, H / 2,
                           bf=FX * BASELINE_M if setup == "stereo" else 0.0)
        for scene in setup_scenes[setup]:
            cell = f"{setup}/{scene}"
            if wanted and cell not in wanted:
                continue
            for m in matchers:
                key = (setup, m)
                if key not in engines:
                    engines[key] = UR_MVO(
                        _production_cfg(m, args.sg_path, args.margin, args.nn_floor,
                                        W=W, H=H, long_run=args.long),
                        setups[setup], camera=cam)
                vo = engines[key]
                ates, penalties, ates_pgo = [], [], []
                for s in range(args.seeds):
                    seed = 11 + s
                    out = render_sequence(
                        args.frames, H, W, FX, seed=seed,
                        baseline=BASELINE_M if setup == "stereo" else 0.0,
                        poses=poses_long,
                        **SCENES[scene],
                    )
                    images, T_wc, depths = out[0], out[1], out[2]
                    images_r = out[3] if setup == "stereo" else None
                    # a failed run scores as the GT trajectory extent —
                    # the worst-case aligned error scale. A matcher that
                    # fails 1/3 runs must not look better than one that
                    # finishes 3/3 (round-4 verdict weak #2: means over
                    # surviving runs silently forgave lost tracking).
                    penalties.append(float(np.linalg.norm(
                        T_wc[:, :3, 3].max(0) - T_wc[:, :3, 3].min(0))))
                    vo.reset()
                    ts, pos = _run_sequence(vo, images, images_r, depths, setup)
                    if len(ts) < 5:
                        ates.append(float("nan"))
                        continue
                    idx = np.clip((ts * FPS).round().astype(int), 0, args.frames - 1)
                    gt = T_wc[idx][:, :3, 3]
                    # metric gate for depth-observing setups
                    scale_ok = setup == "mono"
                    ates.append(float(ate_rmse(pos, gt, align=True, correct_scale=scale_ok)))
                    if args.long:
                        # loop-bearing protocol: consume the detected
                        # loop edges (Sim3 scale + SE(3) pose graph +
                        # full BA) and score the FINAL keyframe
                        # trajectory too — the online number above never
                        # benefits from closure
                        vo.tracker.backend.global_optimize()
                        kts, kpos, _ = vo.keyframe_trajectory()
                        kidx = np.clip((np.asarray(kts) * FPS).round().astype(int),
                                       0, args.frames - 1)
                        ates_pgo.append(float(ate_rmse(
                            np.asarray(kpos), T_wc[kidx][:, :3, 3],
                            align=True, correct_scale=scale_ok)))
                arr = np.asarray(ates)
                ok = np.isfinite(arr)
                scored = np.where(ok, arr, np.asarray(penalties))
                row = {
                    "runs": [round(a, 4) if np.isfinite(a) else None for a in ates],
                    # headline mean: failures scored at penalty ATE
                    "mean": round(float(scored.mean()), 4),
                    "mean_finite": round(float(arr[ok].mean()), 4) if ok.any() else None,
                    "spread": round(float(scored.max() - scored.min()), 4),
                    "failed": int((~ok).sum()),
                }
                if ates_pgo:
                    row["pgo_runs"] = [round(a, 4) for a in ates_pgo]
                    row["pgo_mean"] = round(float(np.mean(ates_pgo)), 4)
                results.setdefault(cell, {})[m] = row
                print(f"{cell} [{m}]: mean {row['mean']} spread {row['spread']} "
                      f"failed {row['failed']} runs {row['runs']} ({time.time() - t_start:.0f}s)", flush=True)

    protocol = {
        "frames": args.frames, "seeds": args.seeds, "H": H, "W": W, "fx": FX,
        "baseline_m": BASELINE_M,
        "ate": "umeyama-aligned; scale-corrected for mono only; "
               "failed runs scored at GT-extent penalty in mean",
        "config": "production (v3 detector at the shipped SG operating point)",
    }
    if args.long:
        protocol["trajectory"] = "out-and-back (loop-bearing)"
        protocol["config"] += " + culling/loop-closure/relocalization"
    doc = {}
    if os.path.exists(args.out):
        # merge: partial runs (--cells, --long) update only their cells
        try:
            with open(args.out) as f:
                doc = json.load(f)
        except Exception:
            doc = {}
    doc.setdefault("cells", {})
    for cell, row in results.items():
        doc["cells"].setdefault(cell, {}).update(row)
    doc["protocol_long" if args.long else "protocol"] = protocol
    doc["generated_unix"] = int(time.time())
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
