"""Projection-guided local-map association.

The reference carries a 48x64 per-frame feature grid for O(1) radius
lookup (``/root/reference/src/frame.cc:128-155, 283-353``) feeding
``Mapping::SearchByProjection`` (``mapping.cc:667-735``: project map
points, collect grid candidates in a radius, best-descriptor match with
a 0.9 ratio test) and the ``TrackLocalMap`` flow
(``tracking.cc:1031-1109``, disabled on the reference's main path).

On TPU the grid is unnecessary: with <=1024 padded map points and
feature slots, the (M, K) candidate relation is a dense masked
similarity problem that one fused kernel solves outright — projection,
radius mask, descriptor scores, row-argmax with ratio test, and a
mutual-best check, all batched on the MXU/VPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.keypoints import FeatureBank
from ur_mvo_tpu.ops.lie import HIGHEST

einsum = partial(jnp.einsum, precision=HIGHEST)


class LocalMapMatches(NamedTuple):
    """Per-map-point association to a feature slot of the current frame."""

    feat_idx: jax.Array  # (M,) int32 slot in the bank, -1 when none
    similarity: jax.Array  # (M,) descriptor dot product
    valid: jax.Array  # (M,)


def project_points(R_cw, t_cw, X, fx, fy, cx, cy):
    pc = einsum("ij,mj->mi", R_cw, X) + t_cw
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    return jnp.stack([u, v], -1), pc[:, 2]


def search_by_projection(
    R_cw: jax.Array,
    t_cw: jax.Array,
    mp_pos: jax.Array,  # (M, 3) world positions
    mp_desc: jax.Array,  # (M, D) unit descriptors
    mp_valid: jax.Array,  # (M,)
    bank: FeatureBank,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    radius_px: float = 15.0,
    min_similarity: float = 0.5,
    ratio: float = 0.9,
) -> LocalMapMatches:
    """Associate map points with current-frame features by projection.

    Matches the reference's acceptance: best descriptor candidate within
    the pixel radius, required to beat the second best by the ratio test
    (``mapping.cc:707-730``; reference thresholds use distance
    ``2(1-cos)``, ours the equivalent cosine similarity).
    """
    uv, depth = project_points(R_cw, t_cw, mp_pos, fx, fy, cx, cy)
    in_img = (
        (depth > 0)
        & (uv[:, 0] >= 0)
        & (uv[:, 0] <= width - 1)
        & (uv[:, 1] >= 0)
        & (uv[:, 1] <= height - 1)
    )
    mp_ok = mp_valid & in_img

    # (M, K) pixel distances + radius mask
    d2 = jnp.sum((uv[:, None, :] - bank.kpts[None, :, :]) ** 2, axis=-1)
    cand = mp_ok[:, None] & bank.valid[None, :] & (d2 <= radius_px * radius_px)

    # (M, K) descriptor similarity on the MXU
    sim = einsum("md,kd->mk", mp_desc.astype(jnp.float32), bank.desc)
    sim = jnp.where(cand, sim, -jnp.inf)

    best = jnp.argmax(sim, axis=1)
    best_sim = jnp.max(sim, axis=1)
    # second best for the ratio test
    sim_wo_best = sim.at[jnp.arange(sim.shape[0]), best].set(-jnp.inf)
    second_sim = jnp.max(sim_wo_best, axis=1)
    # distance ratio test on d = 2(1 - sim): d_best < ratio * d_second
    d_best = 2.0 * (1.0 - best_sim)
    d_second = 2.0 * (1.0 - second_sim)
    ratio_ok = jnp.where(jnp.isfinite(d_second), d_best < ratio * d_second, True)

    valid = mp_ok & jnp.isfinite(best_sim) & (best_sim >= min_similarity) & ratio_ok

    # mutual-best: each feature slot keeps only its highest-similarity point
    M = sim.shape[0]
    slot_best_sim = jnp.full((bank.valid.shape[0],), -jnp.inf).at[best].max(jnp.where(valid, best_sim, -jnp.inf))
    mutual = valid & (best_sim >= slot_best_sim[best])

    return LocalMapMatches(
        feat_idx=jnp.where(mutual, best, -1).astype(jnp.int32),
        similarity=jnp.where(mutual, best_sim, 0.0),
        valid=mutual,
    )
