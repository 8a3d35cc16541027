"""Pallas kernels (interpreter mode on CPU) vs the XLA reference ops."""

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.pallas_kernels import log_optimal_transport_pallas
from ur_mvo_tpu.ops.sinkhorn import log_optimal_transport


def test_pallas_sinkhorn_matches_xla():
    key = jax.random.PRNGKey(0)
    M, N = 48, 40
    scores = jax.random.normal(key, (M, N))
    v0 = jnp.arange(M) < 30
    v1 = jnp.arange(N) < 25
    alpha = jnp.asarray(0.7)
    Z_ref = log_optimal_transport(scores, v0, v1, alpha, iterations=30)
    Z_pal = log_optimal_transport_pallas(scores, v0, v1, alpha, iterations=30, interpret=True)
    # compare valid block + dustbins
    ref = np.asarray(Z_ref)
    pal = np.asarray(Z_pal)
    mask = np.asarray(jnp.concatenate([v0, jnp.array([True])]))[:, None] & np.asarray(
        jnp.concatenate([v1, jnp.array([True])])
    )[None, :]
    np.testing.assert_allclose(pal[mask], ref[mask], atol=1e-4)


def test_pallas_sinkhorn_full_valid():
    key = jax.random.PRNGKey(1)
    M = N = 33  # deliberately unaligned
    scores = jax.random.normal(key, (M, N)) * 2.0
    v = jnp.ones((M,), bool)
    Z_ref = log_optimal_transport(scores, v, v, jnp.asarray(1.0), iterations=50)
    Z_pal = log_optimal_transport_pallas(scores, v, v, jnp.asarray(1.0), iterations=50, interpret=True)
    np.testing.assert_allclose(np.asarray(Z_pal), np.asarray(Z_ref), atol=1e-4)


def test_pallas_attention_matches_xla():
    from ur_mvo_tpu.ops.pallas_kernels import attention_pallas

    key = jax.random.PRNGKey(2)
    K, H, D = 64, 4, 32
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (K, H, D))
    k = jax.random.normal(k2, (K, H, D))
    v = jax.random.normal(k3, (K, H, D))
    valid = jnp.arange(K) < 40

    # XLA reference (same math as superglue._attention core)
    logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(jnp.asarray(D, jnp.float32))
    logits = jnp.where(valid[None, None, :], logits, -1e9)
    ref = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(logits, -1), v)

    out = attention_pallas(q, k, v, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
