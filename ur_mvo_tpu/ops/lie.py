"""SO(3)/SE(3) Lie-group utilities in pure JAX.

Replaces the reference's reliance on Eigen quaternions and g2o's
``SE3Quat``/``VertexSE3Expmap`` (``/root/reference/src/g2o_optimization.cc:44-47``,
``include/types.h:18-33``) with batched, differentiable, jit-safe maps.

Conventions
-----------
* Rotations are 3x3 matrices ``R`` (world-from-camera for ``T_wc``).
* Quaternions are ``(w, x, y, z)`` (Hamilton, unit norm).
* ``se3`` tangent vectors are ``(omega, upsilon)`` = (rotation, translation),
  shape ``(..., 6)``; ``exp``/``log`` follow the standard closed forms with
  Taylor fallbacks near zero so gradients stay finite.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Geometry matmuls are tiny (3x3) but accuracy-critical: on TPU the MXU's
# default f32 matmul uses bf16 passes (~1e-2 relative error), which is
# fatal for rotation chains. Force full f32 here; the FLOP cost is noise.
HIGHEST = jax.lax.Precision.HIGHEST
einsum = partial(jnp.einsum, precision=HIGHEST)
matmul = partial(jnp.matmul, precision=HIGHEST)


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of ``w`` with shape (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula, (..., 3) -> (..., 3, 3), Taylor-safe at 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * matmul(W, W)


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map, (..., 3, 3) -> (..., 3).

    Implemented via quaternion extraction (branch-free pivot; see
    :func:`rotmat_to_quat`), which is accurate uniformly in angle —
    including near 0 and near pi where the classic trace formula loses
    precision in f32.
    """
    q = rotmat_to_quat(R)
    w, v = q[..., 0], q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    # theta / sin(theta/2) with series fallback: vnorm = sin(theta/2).
    scale = jnp.where(vnorm < 1e-6, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vnorm, _EPS))
    return v * scale[..., None]


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J of SO(3): exp(w) translation coupling term."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (matmul(W, W))


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Exponential map: (..., 6) tangent (omega, upsilon) -> (R, t)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = einsum("...ij,...j->...i", _so3_left_jacobian(w), v)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """Logarithm map: (R, t) -> (..., 6) tangent (omega, upsilon)."""
    w = so3_log(R)
    Jinv = jnp.linalg.inv(_so3_left_jacobian(w))
    v = einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb)."""
    return matmul(Ra, Rb), einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, p):
    """Apply transform to points p (..., 3)."""
    return einsum("...ij,...j->...i", R, p) + t


def se3_matrix(R, t):
    """Pack (R, t) into a 4x4 homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.sqrt(jnp.maximum(1.0 + m00 + m11 + m22, 0.0)) * 0.5
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    cand = jnp.stack(
        [
            jnp.stack([qw, (m21 - m12) / (4 * qw + _EPS), (m02 - m20) / (4 * qw + _EPS), (m10 - m01) / (4 * qw + _EPS)], -1),
            jnp.stack([(m21 - m12) / (4 * qx + _EPS), qx, (m01 + m10) / (4 * qx + _EPS), (m02 + m20) / (4 * qx + _EPS)], -1),
            jnp.stack([(m02 - m20) / (4 * qy + _EPS), (m01 + m10) / (4 * qy + _EPS), qy, (m12 + m21) / (4 * qy + _EPS)], -1),
            jnp.stack([(m10 - m01) / (4 * qz + _EPS), (m02 + m20) / (4 * qz + _EPS), (m12 + m21) / (4 * qz + _EPS), qz], -1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    pivot = jnp.argmax(jnp.stack([qw, qx, qy, qz], axis=-1), axis=-1)
    q = jnp.take_along_axis(cand, pivot[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # Canonical sign: w >= 0.
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sign


def rotation_angle(R: jax.Array) -> jax.Array:
    """Geodesic angle of a rotation matrix (used by the keyframe policy,
    parity with ``tracking.cc:925-929``)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
