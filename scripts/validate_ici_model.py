#!/usr/bin/env python
"""Empirical validation of the ICI scaling model's inputs.

DESIGN.md's distributed-BA efficiency prediction (~0.99 on real ICI)
rests on two numbers read off the kernel source: **5 psum calls per LM
iteration totalling 39,940 bytes** at FF=16 free frames (H_cc (FF,6,6)
+ b_c (FF,6) + S_red (6FF,6FF) + b_red (6FF) + the cost scalar). This
script measures those inputs from the COMPILED program instead of the
source: it compiles ``dist_bundle_adjust`` over an N-device mesh,
parses the optimized HLO, and reports every ``all-reduce`` instruction
— which computation it lives in (while-loop body = per-LM-iteration vs
one-shot), its operand shapes, and payload bytes. XLA's all-reduce
combiner may MERGE adjacent psums into fewer launches; the report shows
the post-combiner structure, so the launch-count term of the model is
validated conservatively (combined launches can only beat the model).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/validate_ici_model.py [--devices 8]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_all_reduces(hlo: str):
    """Yield (computation, result_shapes, bytes) per all-reduce instr."""
    comp = "?"
    bodies = set(re.findall(r"body=%?([\w.\-]+)", hlo))
    out = []
    for line in hlo.splitlines():
        m = re.match(r"^%?([\w.\-]+) (?:\([^)]*\) -> .*)?\{?\s*$", line)
        if line and not line[0].isspace():
            m2 = re.match(r"^(?:ENTRY )?%?([\w.\-]+)", line)
            if m2 and "{" in line:
                comp = m2.group(1)
        if "all-reduce(" in line and "=" in line:
            shapes = re.findall(r"(?:f32|f16|bf16|s32|pred)\[([\d,]*)\]", line.split("=")[1].split("all-reduce(")[0])
            nbytes = 0
            dts = re.findall(r"(f32|f16|bf16|s32|pred)\[([\d,]*)\]", line.split("=")[1].split("all-reduce(")[0])
            for dt, dims in dts:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                w = {"f32": 4, "s32": 4, "f16": 2, "bf16": 2, "pred": 1}[dt]
                nbytes += n * w
            out.append((comp, comp in bodies, dts, nbytes))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--obs", type=int, default=8192)
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={args.devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ur_mvo_tpu.ops.ba import BAConfig, BAProblem
    from ur_mvo_tpu.parallel import dist_ba
    from ur_mvo_tpu.parallel.mesh import make_mesh

    F, P, O = args.frames, args.points, args.obs
    rng = np.random.default_rng(0)
    n_frames = F - 2
    n_pts = P - P // 8
    fx = fy = 413.3
    cx, cy = 320.0, 256.0
    Xw = rng.uniform([-4, -4, 4], [4, 4, 10], (n_pts, 3)).astype(np.float32)
    t_wc = np.stack([np.linspace(0, 2, n_frames), np.zeros(n_frames), np.zeros(n_frames)], 1).astype(np.float32)
    per = (O - O // 10) // n_frames
    obs_f = np.repeat(np.arange(n_frames), per)
    obs_p = np.tile(rng.integers(0, n_pts, per), n_frames)
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
        frame_fixed=jnp.arange(F) < max(2, n_frames - 14),
        X=pad(Xw, P, (3,)),
        point_valid=jnp.arange(P) < n_pts,
        obs_frame=pad(obs_f, O, (), np.int32),
        obs_point=pad(obs_p, O, (), np.int32),
        obs_uv=pad(obs_uv, O, (3,)),
        obs_valid=jnp.arange(O) < len(obs_f),
    )
    mesh = make_mesh(args.devices)
    cfg = BAConfig()
    prob_s = dist_ba.shard_problem(prob, args.devices)
    dist_ba.dist_bundle_adjust(prob_s, mesh, fx, fy, cx, cy, 0.0, cfg)
    fn = next(reversed(dist_ba._DIST_BA_CACHE.values()))
    hlo = fn.lower(prob_s).compile().as_text()

    rows = parse_all_reduces(hlo)
    per_iter = [r for r in rows if r[1]]
    one_shot = [r for r in rows if not r[1]]
    FF = cfg.max_free_frames
    model_bytes = (FF * 36 + FF * 6 + (6 * FF) ** 2 + 6 * FF + 1) * 4
    print(f"devices={args.devices} FF={FF}")
    print(f"model: 5 psum calls x LM iter, {model_bytes} B/iter")
    print("\ncompiled HLO all-reduce instructions:")
    for comp, in_loop, dts, nb in rows:
        where = "per-LM-iter (while body)" if in_loop else "one-shot"
        print(f"  [{where}] {comp}: {['x'.join([dt]+ [d]) for dt, d in dts]} = {nb} B")
    n_loops = len(set(r[0] for r in per_iter))
    b_iter = sum(nb for *_x, nb in per_iter) // max(n_loops, 1)
    n_iter = len(per_iter) // max(n_loops, 1)
    print(f"\nmeasured: {n_iter} all-reduce launches x LM iter (over {n_loops} LM phase bodies), "
          f"{b_iter} B/iter; one-shot: {len(one_shot)} launches "
          f"{sum(nb for *_x, nb in one_shot)} B total")
    ok = abs(b_iter - model_bytes) <= 0.05 * model_bytes
    print(f"payload model {'CONFIRMED' if ok else 'DIVERGES'} "
          f"({b_iter} vs {model_bytes} B, {n_iter} vs 5 launches pre-combiner)")


if __name__ == "__main__":
    main()
