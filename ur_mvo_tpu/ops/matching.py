"""Match decoding + mutual-consistency filtering on device.

Fixed-shape equivalent of the reference's CPU decode
(``/root/reference/src/super_glue.cpp:401-430``: row/col argmax, mutual
check, ``exp(score) > threshold``) and of the mutual filter + score
averaging in ``point_matching.cc:33-45``. The epipolar outlier-rejection
stage (``cv::findFundamentalMat`` RANSAC in ``point_matching.cc:48-58``)
lives in ``ops/ransac.py`` and is fused into the same device program by
the frontend.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    """Padded match table between two feature banks.

    ``idx1``: (K0,) int32 — for each slot of bank0 the matched slot in
    bank1, or -1. ``score``: (K0,) f32 — assignment confidence
    ``exp(Z[i,j])``. ``valid``: (K0,) bool.
    """

    idx1: jax.Array
    score: jax.Array
    valid: jax.Array

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


def decode_assignment(
    Z: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    threshold: float = 0.5,
    margin: float = 0.0,
) -> Matches:
    """(K0+1, K1+1) log-assignment matrix -> mutual-max matches.

    Mirrors the reference decode: argmax over the non-dustbin block both
    ways, mutual check, probability threshold.

    ``margin`` > 0 adds an AMBIGUITY gate — the Sinkhorn analog of the
    NN matcher's Lowe ratio test (which is what saves mutual-NN from
    texture aliasing on repetitive scenes, the round-4 metric-ATE
    diagnosis): a match is kept only when the best log-score beats the
    runner-up in BOTH its row and its column by ``margin`` nats. On
    repeated texture the assignment spreads mass over the repeats (or
    confidently picks one while the runner-up sits close); a non-peaked
    row/column is exactly the "two plausible partners" signature that
    the probability threshold alone cannot see.
    """
    K0 = valid0.shape[0]
    K1 = valid1.shape[0]
    S = Z[:K0, :K1]
    S = jnp.where(valid0[:, None] & valid1[None, :], S, -jnp.inf)

    best1 = jnp.argmax(S, axis=1)  # (K0,)
    best0 = jnp.argmax(S, axis=0)  # (K1,)
    row_max = jnp.max(S, axis=1)

    slot_ids = jnp.arange(K0, dtype=best0.dtype)
    mutual = best0[best1] == slot_ids
    score = jnp.where(mutual, jnp.exp(row_max), 0.0)
    valid = mutual & (score > threshold) & valid0 & (row_max > -jnp.inf)
    if margin > 0.0:
        # second-best along each axis with the argmax knocked out
        S_r = S.at[jnp.arange(K0), best1].set(-jnp.inf)
        second_row = jnp.max(S_r, axis=1)
        S_c = S.at[best0, jnp.arange(K1)].set(-jnp.inf)
        second_col = jnp.max(S_c, axis=0)
        col_max = jnp.max(S, axis=0)
        row_ok = jnp.where(jnp.isfinite(second_row), row_max - second_row >= margin, True)
        col_peaked = jnp.where(jnp.isfinite(second_col), col_max - second_col >= margin, True)
        col_ok = col_peaked[best1]
        valid = valid & row_ok & col_ok
        score = jnp.where(valid, score, 0.0)
    return Matches(
        idx1=jnp.where(valid, best1, -1).astype(jnp.int32),
        score=score.astype(jnp.float32),
        valid=valid,
    )


def gather_match_points(matches: Matches, kpts0: jax.Array, kpts1: jax.Array):
    """Matched coordinate pairs as padded arrays: (K0, 2), (K0, 2), mask."""
    idx = jnp.maximum(matches.idx1, 0)
    p0 = kpts0
    p1 = kpts1[idx]
    return p0, p1, matches.valid


def filter_matches(matches: Matches, keep: jax.Array) -> Matches:
    """Apply an additional per-slot inlier mask (e.g. RANSAC verdicts)."""
    valid = matches.valid & keep
    return Matches(
        idx1=jnp.where(valid, matches.idx1, -1),
        score=jnp.where(valid, matches.score, 0.0),
        valid=valid,
    )
