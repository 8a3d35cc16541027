"""Where does the end-to-end frame period go?

Runs the exact bench.py e2e configuration with instrumentation:
- per-stage wall spans (tracker.timer + an extract span),
- a count + total wall of every device->host transfer
  (``jax.Array.__array__`` / scalar reads), i.e. the sync points whose
  per-call cost is floored at ~24 ms by the dev relay,
- main-thread CPU time (``time.thread_time``) vs process CPU time
  (``time.process_time``): the relay client busy-polls on background
  threads, so process_time wildly overstates host work.

Usage: python scripts/profile_e2e.py [--platform cpu] [--frames 20] [--tiny]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--sites", action="store_true",
                    help="tally the in-repo call site of every d2h transfer")
    ap.add_argument("--chunk", type=int, default=0,
                    help="profile the chunked path (process_sequence with "
                         "runtime.chunk_frames=N) instead of per-frame")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import bench

    bench._enable_compile_cache()

    H, W = (128, 160) if args.tiny else (512, 640)

    import numpy as np

    from ur_mvo_tpu.camera import make_pinhole
    from ur_mvo_tpu.components import Frame, Image
    from ur_mvo_tpu.config import Configs, SensorSetup
    from ur_mvo_tpu.engine import UR_MVO
    from ur_mvo_tpu.utils.synthscene import render_sequence

    sp_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "weights", "superpoint_scratch_v3.npz")
    sg_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "weights", "superglue_v3scene.npz")
    fx = 260.0 * (W / 320.0)
    n = args.frames
    images, T_wc, _ = render_sequence(n, H, W, fx, seed=3, n_planes=0, z_background=4.0)
    cam = make_pinhole(W, H, fx, fx, W / 2, H / 2)
    cfg = Configs()
    cfg.superpoint.capacity = 1024
    cfg.superpoint.max_keypoints = 1000
    cfg.superpoint.keypoint_threshold = 1e-4
    cfg.superpoint.weights_path = sp_path
    if os.path.exists(sg_path):
        from ur_mvo_tpu.models.superglue import checkpoint_operating_point

        cfg.superglue.weights_path = sg_path
        op = checkpoint_operating_point(sg_path) or {}
        for k in ("capacity", "max_keypoints", "keypoint_threshold"):
            if k in op:
                setattr(cfg.superpoint, k, op[k])
    cfg.superglue.image_width = W
    cfg.superglue.image_height = H
    cfg.initializer.min_matches = 40
    cfg.initializer.min_features_first = 80
    # production robustness defaults (bench.py / run_vo.py parity)
    cfg.superglue.nn_fallback_min_matches_init = 40
    cfg.backend.relocalization = True

    # --- instrument device->host transfers -----------------------------
    from ur_mvo_tpu.utils.timing import count_d2h

    stats = {"n": 0, "t": 0.0}
    sites = {} if args.sites else None
    ctx = count_d2h(stats, sites=sites)
    ctx.__enter__()  # restored below after the timed pass

    if args.chunk > 1:
        cfg.runtime.chunk_frames = args.chunk
    vo = UR_MVO(cfg, SensorSetup.MONO, camera=cam)
    frames = [Frame(image=Image(images[i], i / 30.0)) for i in range(n)]

    def run():
        if args.chunk > 1:
            outs = vo.process_sequence(frames)
            return sum(1 for o in outs if o is not None)
        kf = 0
        for i in range(n):
            nxt = frames[i + 1] if i + 1 < n else None
            if vo.process(frames[i], next_data=nxt) is not None:
                kf += 1
        return kf

    print("# warm pass (compiles)...", file=sys.stderr)
    t0 = time.perf_counter()
    run()
    print(f"# warm pass {time.perf_counter()-t0:.1f}s; timed pass...", file=sys.stderr)
    vo.reset()
    vo.tracker.timer.reset()
    stats["n"] = 0
    stats["t"] = 0.0
    if sites is not None:
        sites.clear()  # drop warm/compile-pass attributions

    # per-frame extract span
    extract_t = [0.0]
    orig_extract = vo._extract_banks

    def timed_extract(data):
        t0 = time.perf_counter()
        r = orig_extract(data)
        extract_t[0] += time.perf_counter() - t0
        return r

    vo._extract_banks = timed_extract

    w0 = time.perf_counter()
    c0 = time.process_time()
    th0 = time.thread_time()
    kf = run()
    wall = time.perf_counter() - w0
    cpu = time.process_time() - c0
    th = time.thread_time() - th0
    ctx.__exit__(None, None, None)

    print(f"frames={n} keyframes={kf} init={vo.tracker.initialized}")
    print(f"wall/frame          : {wall/n*1e3:8.2f} ms  ({n/wall:.2f} fps)")
    print(f"process_time/frame  : {cpu/n*1e3:8.2f} ms   <- includes relay busy-poll threads")
    print(f"thread_time/frame   : {th/n*1e3:8.2f} ms   <- main-thread host work (excl. blocked waits)")
    print(f"extract-span/frame  : {extract_t[0]/n*1e3:8.2f} ms  (dispatch only; lookahead overlaps)")
    print(f"device->host xfers  : {stats['n']/n:8.2f} /frame, {stats['t']/n*1e3:8.2f} ms/frame wall inside __array__")
    print("tracker spans:")
    for name, d in vo.tracker.timer.summary().items():
        print(f"  {name:14s} count={d['count']:4d} mean={d['mean_ms']:8.2f} ms total={d['total_s']*1e3:9.1f} ms")
    if sites:
        print("d2h call sites (timed pass):")
        for key, c in sorted(sites.items(), key=lambda kv: -kv[1]):
            print(f"  {c:5d}  {key}")


if __name__ == "__main__":
    main()
