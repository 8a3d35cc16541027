"""Masked log-domain Sinkhorn optimal transport on device.

The reference ships this math twice: inside the exported SuperGlue ONNX
graph, and as dead CPU code (``/root/reference/src/super_glue.cpp:432-498``
``log_sinkhorn_iterations``/``log_optimal_transport``, call commented out
at :514). Here it is a live, batched, fully-masked device kernel: the
score matrix is padded to static shape and invalid rows/columns carry no
mass, so one compiled program serves every keypoint count. Iterations run
as a ``lax.scan`` of row/column log-sum-exp sweeps (VPU reductions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def _masked_logsumexp(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    x = jnp.where(mask, x, _NEG)
    m = jnp.max(x, axis=axis, keepdims=True)
    m = jnp.maximum(m, _NEG)  # avoid -inf propagation on empty rows
    s = jnp.sum(jnp.where(mask, jnp.exp(x - m), 0.0), axis=axis, keepdims=True)
    return (m + jnp.log(jnp.maximum(s, 1e-30))).squeeze(axis)


def log_optimal_transport(
    scores: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    alpha: jax.Array,
    iterations: int = 20,
) -> jax.Array:
    """Differentiable partial-assignment transport with dustbins.

    ``scores``: (M, N) similarity matrix over padded keypoint slots.
    ``valid0``/``valid1``: (M,)/(N,) slot validity masks.
    ``alpha``: scalar dustbin score (the reference's trained value is
    2.3457, ``super_glue.cpp:463``).

    Returns the (M+1, N+1) log-assignment matrix normalized exactly as the
    reference (+``log(m+n)`` restored at the end), with invalid slots at
    ``-inf``-like values.

    Marginals follow the SuperGlue construction: each valid keypoint has
    mass ``1/(m+n)``; dustbin row/col get ``n/(m+n)`` and ``m/(m+n)``.
    """
    M, N = scores.shape
    m = jnp.sum(valid0.astype(scores.dtype))
    n = jnp.sum(valid1.astype(scores.dtype))
    norm = -jnp.log(jnp.maximum(m + n, 1.0))

    # Padded couplings with dustbin row/col.
    couplings = jnp.full((M + 1, N + 1), alpha, dtype=scores.dtype)
    couplings = couplings.at[:M, :N].set(scores)

    v0 = jnp.concatenate([valid0, jnp.array([True])])
    v1 = jnp.concatenate([valid1, jnp.array([True])])
    pair_mask = v0[:, None] & v1[None, :]
    couplings = jnp.where(pair_mask, couplings, _NEG)

    log_mu = jnp.where(v0, norm, _NEG).at[M].set(jnp.log(jnp.maximum(n, 1.0)) + norm)
    log_nu = jnp.where(v1, norm, _NEG).at[N].set(jnp.log(jnp.maximum(m, 1.0)) + norm)

    def body(carry, _):
        u, v = carry
        u = log_mu - _masked_logsumexp(couplings + v[None, :], pair_mask, axis=1)
        u = jnp.where(v0, u, 0.0)
        v = log_nu - _masked_logsumexp(couplings + u[:, None], pair_mask, axis=0)
        v = jnp.where(v1, v, 0.0)
        return (u, v), None

    init = (jnp.zeros((M + 1,), scores.dtype), jnp.zeros((N + 1,), scores.dtype))
    # unroll to cut while-loop trip overhead; 20 iterations is small
    (u, v), _ = jax.lax.scan(body, init, None, length=iterations, unroll=min(iterations, 5))

    Z = couplings + u[:, None] + v[None, :] - norm
    return jnp.where(pair_mask, Z, _NEG)
