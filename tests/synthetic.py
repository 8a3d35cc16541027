"""Synthetic scene + trajectory generator for end-to-end VO tests.

Fills the role the Aqualoc dataset plays for the reference (which has no
test assets in-repo): a random landmark cloud observed from a smooth
camera trajectory, served through the OracleExtractor so the full runtime
(init, tracking, keyframing, BA) runs without trained network weights.
"""

from __future__ import annotations

import numpy as np

import ur_mvo_tpu.ops.lie as lie
from ur_mvo_tpu.camera import make_pinhole


def make_camera(width=640, height=512):
    return make_pinhole(width, height, 400.0, 400.0, width / 2, height / 2)


def make_trajectory(n_frames: int, advance: float = 0.04, seed: int = 0):
    """Smooth forward+lateral trajectory with gentle yaw. Returns
    (T_wc (N, 4, 4), timestamps (N,))."""
    import jax.numpy as jnp

    ts = np.arange(n_frames) * (1.0 / 30.0)
    poses = np.zeros((n_frames, 4, 4), np.float64)
    for i in range(n_frames):
        s = i * advance
        yaw = 0.15 * np.sin(0.05 * i)
        pitch = 0.05 * np.sin(0.03 * i + 1.0)
        R = np.asarray(lie.so3_exp(jnp.array([pitch, yaw, 0.0])))
        t = np.array([s, 0.3 * np.sin(0.08 * i), 0.1 * np.sin(0.05 * i)])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = t
        poses[i, 3, 3] = 1.0
    return poses, ts


def make_landmarks(n_points: int, along: float, seed: int = 1):
    """Landmark cloud spread along the trajectory corridor, 4-9 m ahead."""
    rng = np.random.default_rng(seed)
    X = np.stack(
        [
            rng.uniform(-4.0, along + 4.0, n_points),
            rng.uniform(-3.0, 3.0, n_points),
            rng.uniform(4.0, 9.0, n_points),
        ],
        axis=1,
    )
    return X.astype(np.float32)
