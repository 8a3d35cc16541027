"""One-shot sub-profile of the track stage on TPU (long-slope n2=52).

Pieces of bench.py's track program: PnP DLT-RANSAC (100 hypotheses),
pose-only 4x10 GN (Pallas single-program vs XLA schedule), and the fused
track program. Batch everything into one script: remote compiles are
minutes each (CLAUDE.md).

Usage: python scripts/profile_track.py [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import _enable_compile_cache, sustained_ms

    _enable_compile_cache()
    import jax.numpy as jnp

    from ur_mvo_tpu.ops.pnp import ransac_pnp
    from ur_mvo_tpu.ops.pose_opt import PoseObs, optimize_pose

    tiny = "--cpu" in sys.argv
    CAP = 256 if tiny else 1024
    W, H = (160, 128) if tiny else (640, 512)
    N2 = 22 if tiny else 52
    dev = jax.devices()[0]
    print(f"# profile_track on {dev.platform}:{dev.device_kind} CAP={CAP} n2={N2}", file=sys.stderr)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    fx = fy = 413.3
    cx, cy = W / 2.0, H / 2.0
    K_mat = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], jnp.float32)
    X = jax.random.uniform(ks[0], (CAP, 3), minval=jnp.array([-2, -2, 4.0]), maxval=jnp.array([2, 2, 9.0]))
    uv = jax.random.uniform(ks[1], (CAP, 2)) * jnp.array([W - 1.0, H - 1.0])
    valid = jnp.ones((CAP,), bool)

    pnp = jax.jit(lambda k, X, uv, v: ransac_pnp(k, X, uv, v, K_mat, iterations=100, threshold_px=20.0))
    res = pnp(ks[2], X, uv, valid)

    obs = PoseObs(X=X, uv=jnp.concatenate([uv, -jnp.ones_like(uv[:, :1])], 1), valid=valid)
    po_auto = jax.jit(lambda R, t, obs: optimize_pose(R, t, obs, fx, fy, cx, cy))

    po_xla = lambda R, t, obs: optimize_pose(R, t, obs, fx, fy, cx, cy)  # noqa: E731

    full = jax.jit(
        lambda k, X, uv, v: optimize_pose(
            *(lambda r: (r.R_cw, r.t_cw))(ransac_pnp(k, X, uv, v, K_mat, iterations=100, threshold_px=20.0)),
            PoseObs(X=X, uv=jnp.concatenate([uv, -jnp.ones_like(uv[:, :1])], 1), valid=v),
            fx, fy, cx, cy,
        )
    )

    meas = {}

    def run(name, fn, args, n2=N2):
        meas[name] = sustained_ms(fn, args, n2=n2)
        print(f"{name:24s} {meas[name]:8.3f} ms", flush=True)

    run("pnp_ransac_100", pnp, (ks[2], X, uv, valid))
    run("pose_opt_auto", po_auto, (res.R_cw, res.t_cw, obs))
    # force the XLA schedule: the Pallas dispatch reads pose_pallas_enabled
    # at trace time (inside sustained_ms's jit), so patch it off around the
    # measurement
    from ur_mvo_tpu.ops import pallas_pose as _pp

    orig = _pp.pose_pallas_enabled
    _pp.pose_pallas_enabled = lambda: False
    try:
        run("pose_opt_xla", po_xla, (res.R_cw, res.t_cw, obs))
    finally:
        _pp.pose_pallas_enabled = orig
    run("track_full", full, (ks[2], X, uv, valid))


if __name__ == "__main__":
    main()
