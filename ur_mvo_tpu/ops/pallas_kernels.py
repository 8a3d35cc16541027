"""Pallas TPU kernels for the matcher's hot inner loops.

``sinkhorn_pallas`` runs ALL log-Sinkhorn iterations with the coupling
matrix resident in VMEM: a (1025+pad)^2 f32 matrix is ~4.6 MB, well under
the ~16 MB VMEM budget, so the row/column log-sum-exp sweeps never touch
HBM between iterations — where the XLA scan version re-materializes the
``couplings + potential`` intermediate each half-sweep. The kernel is
numerically identical to ``ops/sinkhorn.log_optimal_transport`` (same
masking semantics: invalid entries carry ``-1e9`` and zero mass).

Kernels fall back to the XLA implementation off-TPU; tests exercise the
Pallas path in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sinkhorn_kernel(iterations: int, couplings_ref, log_mu_ref, log_nu_ref, out_ref):
    """One program: iterate u/v sweeps over the VMEM-resident matrix."""
    C = couplings_ref[:]  # (Mp, Np)
    log_mu = log_mu_ref[:]  # (Mp, 1)
    log_nu = log_nu_ref[:]  # (1, Np)

    def lse_rows(M):
        m = jnp.max(M, axis=1, keepdims=True)
        m = jnp.maximum(m, _NEG)
        return m + jnp.log(jnp.maximum(jnp.sum(jnp.exp(M - m), axis=1, keepdims=True), 1e-30))

    def lse_cols(M):
        m = jnp.max(M, axis=0, keepdims=True)
        m = jnp.maximum(m, _NEG)
        return m + jnp.log(jnp.maximum(jnp.sum(jnp.exp(M - m), axis=0, keepdims=True), 1e-30))

    def body(_, carry):
        u, v = carry
        u = log_mu - lse_rows(C + v)
        v = log_nu - lse_cols(C + u)
        return (u, v)

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iterations, body, (u0, v0))
    out_ref[:] = C + u + v


def sinkhorn_pallas(
    couplings: jax.Array,
    log_mu: jax.Array,
    log_nu: jax.Array,
    iterations: int = 20,
    interpret: bool = False,
) -> jax.Array:
    """Masked log-Sinkhorn on a prepared (M, N) couplings matrix.

    ``couplings`` must already contain dustbin rows/cols and ``-1e9`` at
    invalid entries; ``log_mu``/``log_nu`` are the (M,)/(N,) log-marginals
    with ``-1e9`` for invalid slots. Returns ``couplings + u + v``.
    """
    M, N = couplings.shape
    Mp = _round_up(M, 8)
    Np = _round_up(N, 128)
    C = jnp.full((Mp, Np), _NEG, couplings.dtype).at[:M, :N].set(couplings)
    mu = jnp.full((Mp, 1), _NEG, couplings.dtype).at[:M, 0].set(log_mu)
    nu = jnp.full((1, Np), _NEG, couplings.dtype).at[0, :N].set(log_nu)

    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, iterations),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), couplings.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(C, mu, nu)
    return out[:M, :N]


def log_optimal_transport_pallas(
    scores: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    alpha: jax.Array,
    iterations: int = 20,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``ops.sinkhorn.log_optimal_transport``
    backed by the VMEM-resident Pallas kernel."""
    M, N = scores.shape
    m = jnp.sum(valid0.astype(scores.dtype))
    n = jnp.sum(valid1.astype(scores.dtype))
    norm = -jnp.log(jnp.maximum(m + n, 1.0))

    couplings = jnp.full((M + 1, N + 1), alpha, dtype=scores.dtype)
    couplings = couplings.at[:M, :N].set(scores)
    v0 = jnp.concatenate([valid0, jnp.array([True])])
    v1 = jnp.concatenate([valid1, jnp.array([True])])
    pair_mask = v0[:, None] & v1[None, :]
    couplings = jnp.where(pair_mask, couplings, _NEG)

    log_mu = jnp.where(v0, norm, _NEG).at[M].set(jnp.log(jnp.maximum(n, 1.0)) + norm)
    log_nu = jnp.where(v1, norm, _NEG).at[N].set(jnp.log(jnp.maximum(m, 1.0)) + norm)

    Z = sinkhorn_pallas(couplings, log_mu, log_nu, iterations, interpret=interpret) - norm
    return jnp.where(pair_mask, Z, _NEG)


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    """Fused masked attention for one head: logits, softmax and the value
    contraction stay in VMEM (a (K, K) f32 logits tile is 4 MB at
    K=1024)."""
    q = q_ref[0]  # (K, D)
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[:]  # (1, K) f32 {0, 1}
    d = q.shape[-1]
    # contraction over D without materializing k.T (Mosaic-friendly)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / (d**0.5))
    logits = logits + (mask - 1.0) * 1e9  # 0 where valid, -1e9 where not
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    out_ref[0] = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array, kv_valid: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Masked multi-head attention, one Pallas program per head.

    ``q``: (K, H, D), ``k``/``v``: (Kkv, H, D), ``kv_valid``: (Kkv,).
    Returns (K, H, D). Equivalent to the XLA attention in
    ``models/superglue._attention`` (tested); keeps the logits tile
    VMEM-resident instead of round-tripping softmax through HBM.
    """
    K_, H_, D_ = q.shape
    Kkv = k.shape[0]
    qh = jnp.swapaxes(q, 0, 1)  # (H, K, D)
    kh = jnp.swapaxes(k, 0, 1)
    vh = jnp.swapaxes(v, 0, 1)
    mask = kv_valid.astype(jnp.float32)[None, :]  # (1, Kkv) in {0, 1}

    out = pl.pallas_call(
        _attention_kernel,
        grid=(H_,),
        in_specs=[
            pl.BlockSpec((1, K_, D_), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kkv, D_), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kkv, D_), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kkv), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K_, D_), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H_, K_, D_), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, mask)
    return jnp.swapaxes(out, 0, 1)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def env_gate(var: str | None, master: str | None = "URMVO_PALLAS") -> bool:
    """Shared formulation-gate parsing (one definition for every TPU
    formulation flag): ``master``=0 force-disables; else ``var``=0/false
    forces off and any other value forces on; unset defaults to
    "running on TPU"."""
    import os

    if master and os.environ.get(master) == "0":
        return False
    env = os.environ.get(var) if var else None
    if env is not None:
        return env not in ("0", "false")
    return _on_tpu()


def sinkhorn_pallas_enabled() -> bool:
    """The Pallas Sinkhorn is Mosaic-verified on TPU v5e: on by default
    on TPU (URMVO_PALLAS=0 force-disables)."""
    return env_gate(None)


def attention_pallas_wanted(batched: bool) -> bool:
    """Pallas-attention policy. For a single pair XLA's fused attention
    benchmarks equal-or-faster (0.90 vs 0.96 ms GNN on v5e), but under a
    sequence batch XLA stops fusing the f32 logits (S·2·4·K² ≈ 134 MB
    per layer at S=4) and per-sequence GNN cost doubles; the
    VMEM-resident kernel keeps it flat (0.92 vs 2.02 ms/seq at S=4).
    ``URMVO_PALLAS_ATTN=0/1`` overrides in either direction."""
    import os

    env = os.environ.get("URMVO_PALLAS_ATTN")
    if env is not None:
        return env not in ("0", "false") and _on_tpu()
    return batched and _on_tpu()


def attention_pallas_enabled() -> bool:
    """Single-pair policy (see :func:`attention_pallas_wanted`)."""
    return attention_pallas_wanted(False)


def pallas_available() -> bool:
    """Back-compat alias for the Sinkhorn fast path."""
    return sinkhorn_pallas_enabled()
