#!/usr/bin/env python
"""Distributed-BA scaling benchmark.

Measures BA iterations/s of the sharded Schur-complement solver
(``parallel/dist_ba.py``) at 1..N devices on a fixed problem
(strong scaling) and reports parallel efficiency — the BASELINE.json
"frames/s + BA iterations/s at 1 chip / 1 host / N hosts" measurement.
On real hardware run once per slice size; on the dev box
``--platform cpu`` with ``XLA_FLAGS=--xla_force_host_platform_device_count=N``
exercises the same code over virtual devices (communication-free upper
bound for the collective structure, not a hardware number).

Prints one JSON line per device count.
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
    ap.add_argument("--platform", default=None)
    ap.add_argument("--devices", type=int, nargs="*", default=None, help="device counts to test")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--obs", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="assumed ICI all-reduce bandwidth (GB/s) for the prediction")
    ap.add_argument("--ici-latency-us", type=float, default=1.0,
                    help="assumed per-collective launch latency (us)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ur_mvo_tpu.ops.ba import BAConfig, BAProblem
    from ur_mvo_tpu.parallel.dist_ba import dist_bundle_adjust, shard_problem
    from ur_mvo_tpu.parallel.mesh import make_mesh

    F, P, O = args.frames, args.points, args.obs
    rng = np.random.default_rng(0)
    n_frames = F - 2
    n_pts = P - P // 8
    # leave ~10% padding slack so the balanced sharder can equalize
    # per-shard observation counts (real problems always have headroom)
    O_fill = O - O // 10
    fx = fy = 413.3
    cx, cy = 320.0, 256.0
    Xw = rng.uniform([-4, -4, 4], [4, 4, 10], (n_pts, 3)).astype(np.float32)
    t_wc = np.stack([np.linspace(0, 2, n_frames), np.zeros(n_frames), np.zeros(n_frames)], 1).astype(np.float32)
    per = O_fill // n_frames
    obs_f = np.repeat(np.arange(n_frames), per)
    obs_p = np.tile(rng.integers(0, n_pts, per), n_frames)
    order = np.lexsort((obs_f, obs_p))
    obs_f, obs_p = obs_f[order], obs_p[order]
    u = fx * (Xw[obs_p][:, 0] - t_wc[obs_f][:, 0]) / Xw[obs_p][:, 2] + cx
    v = fy * Xw[obs_p][:, 1] / Xw[obs_p][:, 2] + cy
    obs_uv = np.stack([u, v, -np.ones_like(u)], 1).astype(np.float32)

    def pad(a, n, tail=(), dtype=np.float32):
        out = np.zeros((n,) + tail, dtype)
        out[: len(a)] = np.asarray(a, dtype).reshape((-1,) + tail)[:n]
        return jnp.asarray(out)

    prob = BAProblem(
        R_wc=jnp.tile(jnp.eye(3)[None], (F, 1, 1)),
        t_wc=pad(t_wc, F, (3,)),
        frame_valid=jnp.arange(F) < n_frames,
        frame_fixed=jnp.arange(F) < 2,
        X=pad(Xw, P, (3,)),
        point_valid=jnp.arange(P) < n_pts,
        obs_frame=pad(obs_f, O, (), np.int32),
        obs_point=pad(obs_p, O, (), np.int32),
        obs_uv=pad(obs_uv, O, (3,)),
        obs_valid=jnp.arange(O) < len(obs_f),
    )
    # tol=0 disables the LM convergence early exit: per-iteration rates
    # must count iterations that actually ran
    cfg = BAConfig(iters_phase1=args.iters, iters_phase2=0, tol=0.0)

    # --- per-LM-iteration collective payload (exact, from the kernel) ---
    # dist_ba.lm_phase psums, per iteration (parallel/dist_ba.py:232-255):
    #   H_cc (FF,6,6) + b_c (FF,6) + S_part (6FF,6FF) + b_red (6FF,) +
    #   cost (scalar), all f32.
    FF = cfg.max_free_frames
    psum_elems = FF * 36 + FF * 6 + (6 * FF) ** 2 + 6 * FF + 1
    psum_bytes = 4 * psum_elems
    psum_calls = 5

    def predicted_efficiency(n, t1_iter_s):
        """ICI cost model for a 1-D ring all-reduce on real hardware:
        t(n) = t_comp/n + calls*latency + 2*(n-1)/n * bytes/bw.
        eff = t(1) / (n * t(n)). Defaults: v5e ICI ~45 GB/s per link,
        ~1 us collective launch latency (scaling-book numbers)."""
        if n == 1:
            return 1.0
        t_comm = psum_calls * args.ici_latency_us * 1e-6 + 2 * (n - 1) / n * psum_bytes / (args.ici_gbps * 1e9)
        t_n = t1_iter_s / n + t_comm
        return t1_iter_s / (n * t_n)

    counts = args.devices or sorted({1, 2, len(jax.devices())})
    t1 = None
    for n in counts:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        prob_s = shard_problem(prob, n)
        run = lambda: dist_bundle_adjust(prob_s, mesh, fx, fy, cx, cy, 0.0, cfg)
        jax.block_until_ready(run())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        ips = args.iters / best
        if t1 is None:
            t1 = best
        eff = t1 / (best * n)
        print(json.dumps({
            "metric": "ba_iterations_per_sec",
            "devices": n,
            "value": round(ips, 2),
            "unit": "iters/s",
            "efficiency_vs_1dev": round(eff, 3),
            "compute_ms_per_iter_per_shard": round(best / args.iters * 1e3, 4),
            "psum_bytes_per_iter": psum_bytes,
            "psum_calls_per_iter": psum_calls,
            "predicted_efficiency_ici": round(predicted_efficiency(n, t1 / args.iters), 3),
            "problem": {"frames": F, "points": P, "obs": O, "max_free_frames": FF},
        }))


if __name__ == "__main__":
    main()
