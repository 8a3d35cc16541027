"""Non-maximum suppression via the max-pool trick, in JAX.

Same algorithm as SuperPoint's ``simple_nms`` (the reference trains and
exports it inside the network, ``/root/reference/superpoint/SP/model.py:15-26``):
iterative suppression with a (2r+1)-square max filter, two refinement
rounds. Runs as reduce-window ops that XLA maps onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _maxpool_same(x: jax.Array, radius: int) -> jax.Array:
    """Square max filter with 'same' padding over the last two dims (H, W).

    Separable: two 1-D reduce_windows (k ops/pixel each) instead of one
    k x k window (k^2 ops/pixel) — identical result for max."""
    k = 2 * radius + 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(k, 1), window_strides=(1, 1), padding="SAME"
    )
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, k), window_strides=(1, 1), padding="SAME"
    )


def simple_nms(scores: jax.Array, radius: int = 4, iterations: int = 2) -> jax.Array:
    """Suppress non-maxima of ``scores`` (H, W); keeps local maxima only."""
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _maxpool_same(scores, radius)
    for _ in range(iterations):
        supp_mask = _maxpool_same(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _maxpool_same(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)
