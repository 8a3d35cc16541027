"""Mutual nearest-neighbor descriptor matching (SuperGlue-free fallback).

One dense (K0, K1) similarity einsum on the MXU + mutual-argmax with
Lowe ratio test. Useful when no trained SuperGlue checkpoint is
available (none ships with the reference), as a cheap matcher for
high-rate streams, and to A/B the learned matcher. Interface-compatible
with ``decode_assignment``'s output so the whole runtime can swap
matchers via config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.keypoints import FeatureBank
from ur_mvo_tpu.ops.matching import Matches

einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def match_nn(
    bank0: FeatureBank,
    bank1: FeatureBank,
    min_similarity: float = 0.2,
    ratio: float = 0.95,
    center: bool = False,
) -> Matches:
    """Mutual-NN matches with a ratio test on distance d = 2(1 - cos).

    ``center``: re-center both banks' descriptors by their joint mean and
    re-normalize before matching. Descriptor spaces collapsed onto a
    common component (the shipped from-scratch detector: matched cosine
    0.99 vs random-pair 0.93) regain contrast (0.75 vs 0.07) — measured
    +0.10 recall at equal precision on the 3D-scene benchmark. Off by
    default: trained SuperPoint descriptors are already well-spread and
    the thresholds are calibrated for raw cosines."""
    d0, d1 = bank0.desc, bank1.desc
    if center:
        n0 = jnp.sum(bank0.valid)
        n1 = jnp.sum(bank1.valid)
        mu = (jnp.sum(d0 * bank0.valid[:, None], 0) + jnp.sum(d1 * bank1.valid[:, None], 0)) / jnp.maximum(n0 + n1, 1)

        def cz(d, valid):
            c = d - mu
            c = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-6)
            return c * valid[:, None]

        d0, d1 = cz(d0, bank0.valid), cz(d1, bank1.valid)
    sim = einsum("md,nd->mn", d0, d1)
    sim = jnp.where(bank0.valid[:, None] & bank1.valid[None, :], sim, -jnp.inf)

    best1 = jnp.argmax(sim, axis=1)
    best1_sim = jnp.max(sim, axis=1)
    K0 = sim.shape[0]
    second = jnp.max(sim.at[jnp.arange(K0), best1].set(-jnp.inf), axis=1)
    best0 = jnp.argmax(sim, axis=0)

    mutual = best0[best1] == jnp.arange(K0)
    d_best = 2.0 * (1.0 - best1_sim)
    d_second = 2.0 * (1.0 - second)
    ratio_ok = jnp.where(jnp.isfinite(d_second), d_best < ratio * d_second, True)
    valid = (
        bank0.valid
        & mutual
        & jnp.isfinite(best1_sim)
        & (best1_sim >= min_similarity)
        & ratio_ok
    )
    score = jnp.where(valid, jnp.clip((best1_sim + 1.0) * 0.5, 0.0, 1.0), 0.0)
    return Matches(
        idx1=jnp.where(valid, best1, -1).astype(jnp.int32),
        score=score.astype(jnp.float32),
        valid=valid,
    )
