"""True multi-process (simulated multi-host) distributed BA:
``jax.distributed`` over 2 processes x 2 virtual devices, global mesh,
psum'd reduced camera system — the solution must match the single-host
solver (BASELINE's N-host agreement gate)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_ba_worker.py")


@pytest.mark.slow
def test_two_process_distributed_ba():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    coord = "127.0.0.1:12439"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert "MULTIHOST-OK" in out, out[-2000:]
