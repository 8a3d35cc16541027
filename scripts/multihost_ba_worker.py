#!/usr/bin/env python
"""Multi-host distributed-BA worker (one process per simulated host).

Launched N times by ``tests/test_multihost.py`` (or manually across real
hosts): initializes ``jax.distributed``, forms the global mesh over all
hosts' devices, runs the sharded Schur-complement BA on a deterministic
problem, and checks the replicated pose solution against the locally
computed single-chip solver — the 1-host vs N-host agreement gate of
BASELINE.json.

Usage: multihost_ba_worker.py <process_id> <num_processes> [coordinator]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3] if len(sys.argv) > 3 else "127.0.0.1:12431"
    jax.distributed.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from ur_mvo_tpu.ops.ba import BAConfig, BAProblem, bundle_adjust
    from ur_mvo_tpu.parallel.dist_ba import AXIS, dist_bundle_adjust, shard_problem

    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), (AXIS,))

    # deterministic problem, built identically on every host
    rng = np.random.default_rng(0)
    F, Pn, O = 8, 16 * ndev, 64 * ndev
    n_frames, n_pts = 6, Pn - Pn // 4
    fx = fy = 200.0
    cx = cy = 128.0
    X = rng.uniform([-2, -2, 4], [2, 2, 8], (n_pts, 3)).astype(np.float32)
    t_wc = np.stack([np.linspace(0, 1, n_frames), np.zeros(n_frames), np.zeros(n_frames)], 1).astype(np.float32)
    obs_f, obs_p, obs_uv = [], [], []
    for f in range(n_frames):
        pc = X - t_wc[f]
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        for p in range(n_pts):
            if len(obs_f) >= O - O // 10:
                break
            obs_f.append(f)
            obs_p.append(p)
            obs_uv.append([u[p] + 0.2 * rng.standard_normal(), v[p] + 0.2 * rng.standard_normal(), -1.0])
    n_obs = len(obs_f)

    def pad(a, n, tail=(), dtype=np.float32):
        out = np.zeros((n,) + tail, dtype)
        out[: len(a)] = np.asarray(a, dtype).reshape((-1,) + tail)[:n]
        return out

    prob_np = BAProblem(
        R_wc=np.tile(np.eye(3, dtype=np.float32), (F, 1, 1)),
        t_wc=pad(t_wc, F, (3,)) + 0.01,
        frame_valid=np.arange(F) < n_frames,
        frame_fixed=np.arange(F) < 2,
        X=pad(X, Pn, (3,)),
        point_valid=np.arange(Pn) < n_pts,
        obs_frame=pad(obs_f, O, (), np.int32),
        obs_point=pad(obs_p, O, (), np.int32),
        obs_uv=pad(obs_uv, O, (3,)),
        obs_valid=np.arange(O) < n_obs,
    )
    cfg = BAConfig(iters_phase1=8, iters_phase2=3)

    # single-process reference (local devices only)
    ref = bundle_adjust(BAProblem(*[jnp.asarray(np.asarray(x)) for x in prob_np]), fx, fy, cx, cy, 0.0, cfg)
    ref_t = np.asarray(ref.t_wc)

    # global sharded run over all hosts
    prob_s = shard_problem(BAProblem(*[jnp.asarray(np.asarray(x)) for x in prob_np]), ndev)
    point_specs = BAProblem(
        R_wc=P(), t_wc=P(), frame_valid=P(), frame_fixed=P(),
        X=P(AXIS), point_valid=P(AXIS),
        obs_frame=P(AXIS), obs_point=P(AXIS), obs_uv=P(AXIS), obs_valid=P(AXIS),
    )
    # every host holds the identical full problem; device_put with the
    # global NamedSharding places each host's local shards
    global_prob = BAProblem(*[
        jax.device_put(np.asarray(x), NamedSharding(mesh, spec))
        for x, spec in zip(prob_s, point_specs)
    ])
    res = dist_bundle_adjust(global_prob, mesh, fx, fy, cx, cy, 0.0, cfg)
    # poses are replicated -> addressable everywhere
    t_local = np.asarray(res.t_wc.addressable_shards[0].data)
    err = np.abs(t_local[:n_frames] - ref_t[:n_frames]).max()
    assert err < 5e-3, f"multihost BA diverged from single-host: {err}"
    print(f"proc {pid}/{nproc}: {ndev} global devices, pose err vs single-host {err:.2e} MULTIHOST-OK", flush=True)


if __name__ == "__main__":
    main()
