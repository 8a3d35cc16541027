"""SuperGlue matcher training on synthetic warped correspondences.

The reference consumes a pre-trained SuperGlue TensorRT engine and has no
training path at all (``/root/reference/src/super_glue.cpp`` only runs
inference). This module closes that gap TPU-side: it trains the JAX
SuperGlue of ``models/superglue.py`` from scratch with the published
matching objective (Sarlin et al., CVPR 2020, Eq. 10) — negative
log-likelihood of the ground-truth partial assignment under the Sinkhorn
transport matrix, including dustbin rows/columns for unmatched points.

Supervision comes from synthetic geometric correspondence: keypoints in a
virtual frame are warped by a random similarity transform with pixel
jitter, a fraction are dropped (occlusion) and replaced by distractors, and
descriptors of true correspondences are noisy copies of each other. This
teaches the network exactly the inductive bias the matcher needs — combine
descriptor similarity with spatially consistent context — without any
image data, and every batch is a fixed-shape (B, K) table so the whole
step jits onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ur_mvo_tpu.models import superglue
from ur_mvo_tpu.ops.keypoints import FeatureBank

D = superglue.D


# ---------------------------------------------------------------------------
# Synthetic correspondence batches
# ---------------------------------------------------------------------------

def make_batch(
    rng: np.random.Generator,
    batch: int,
    capacity: int,
    width: int,
    height: int,
    drop_frac: float = 0.2,
    desc_noise: float = 1.0,
    jitter_px: float = 1.0,
) -> Tuple[FeatureBank, FeatureBank, np.ndarray, np.ndarray]:
    """Sample a batch of feature-bank pairs with known assignment.

    Returns ``(bank0, bank1, tgt0, tgt1)`` where every array is stacked on
    a leading batch axis. ``tgt0[b, i]`` is the bank-1 column matched to
    bank-0 slot ``i`` (``capacity`` = dustbin); ``tgt1[b, j]`` is the
    bank-0 row for column ``j`` (``capacity`` = dustbin). Padding slots are
    marked invalid and excluded from the loss by the valid masks.

    ``desc_noise`` is the norm of a unit-direction perturbation added to a
    matched descriptor before renormalizing, so the matched-pair cosine is
    ~``1/sqrt(1 + desc_noise**2)`` (1.0 -> ~0.71, the regime of real
    SuperPoint matches; distractor cosines concentrate near 0 at D=256).
    """
    K = capacity
    border = 8.0
    s0 = np.zeros((batch, K), np.float32)
    s1 = np.zeros((batch, K), np.float32)
    k0 = np.zeros((batch, K, 2), np.float32)
    k1 = np.zeros((batch, K, 2), np.float32)
    d0 = np.zeros((batch, K, D), np.float32)
    d1 = np.zeros((batch, K, D), np.float32)
    v0 = np.zeros((batch, K), bool)
    v1 = np.zeros((batch, K), bool)
    tgt0 = np.full((batch, K), K, np.int32)
    tgt1 = np.full((batch, K), K, np.int32)

    for b in range(batch):
        n0 = int(rng.integers(K // 2, K + 1))
        pts = np.stack(
            [rng.uniform(border, width - border, n0), rng.uniform(border, height - border, n0)], 1
        ).astype(np.float32)
        desc = rng.normal(size=(n0, D)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)

        # random similarity warp about the image center
        theta = rng.uniform(-0.3, 0.3)
        scale = rng.uniform(0.85, 1.15)
        t = rng.uniform(-0.12, 0.12, 2) * [width, height]
        c = np.array([width / 2.0, height / 2.0])
        R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        warped = (pts - c) @ (scale * R).T + c + t
        warped += rng.normal(scale=jitter_px, size=warped.shape)

        inside = (
            (warped[:, 0] >= 0) & (warped[:, 0] < width) & (warped[:, 1] >= 0) & (warped[:, 1] < height)
        )
        kept = inside & (rng.random(n0) > drop_frac)
        kept_idx = np.nonzero(kept)[0]
        n_match = len(kept_idx)
        n_distract = min(K - n_match, max(0, int(rng.integers(0, K // 4 + 1))))
        n1 = n_match + n_distract

        # shuffled placement of true correspondences in bank 1
        perm = rng.permutation(n1)
        cols_of_match = perm[:n_match]
        cols_of_distract = perm[n_match:]

        nd = rng.normal(size=(n_match, D)).astype(np.float32)
        nd /= np.linalg.norm(nd, axis=1, keepdims=True)
        noisy = desc[kept_idx] + desc_noise * nd
        noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)

        k0[b, :n0] = pts
        d0[b, :n0] = desc
        s0[b, :n0] = rng.uniform(0.3, 1.0, n0)
        v0[b, :n0] = True
        k1[b, cols_of_match] = warped[kept_idx]
        d1[b, cols_of_match] = noisy
        if n_distract:
            k1[b, cols_of_distract] = np.stack(
                [rng.uniform(border, width - border, n_distract), rng.uniform(border, height - border, n_distract)], 1
            )
            dd = rng.normal(size=(n_distract, D)).astype(np.float32)
            d1[b, cols_of_distract] = dd / np.linalg.norm(dd, axis=1, keepdims=True)
        s1[b, perm] = rng.uniform(0.3, 1.0, n1)
        v1[b, perm] = True
        tgt0[b, kept_idx] = cols_of_match
        tgt1[b, cols_of_match] = kept_idx

    bank0 = FeatureBank(scores=jnp.asarray(s0), kpts=jnp.asarray(k0), desc=jnp.asarray(d0), valid=jnp.asarray(v0))
    bank1 = FeatureBank(scores=jnp.asarray(s1), kpts=jnp.asarray(k1), desc=jnp.asarray(d1), valid=jnp.asarray(v1))
    return bank0, bank1, jnp.asarray(tgt0), jnp.asarray(tgt1)


# ---------------------------------------------------------------------------
# On-device batch generation (jax.random, fully jittable)
# ---------------------------------------------------------------------------

def make_batch_device(
    key: jax.Array,
    batch: int,
    capacity: int,
    width: int,
    height: int,
    drop_frac: float = 0.2,
    desc_noise: float = 1.0,
    jitter_px: float = 1.0,
) -> Tuple[FeatureBank, FeatureBank, jax.Array, jax.Array]:
    """Static-shape synthetic correspondence batch generated on device.

    Same distribution as :func:`make_batch` but with every slot populated
    (dropped points become distractors in bank 1 instead of padding) so the
    whole generator jits and can live inside a ``lax.scan`` training loop —
    on TPU this removes all host->device batch transfers, which dominate
    host-fed training through a thin PCIe/relay link.
    """
    K = capacity
    border = 8.0

    def one(k):
        ks = jax.random.split(k, 10)
        pts = jnp.stack(
            [
                jax.random.uniform(ks[0], (K,), minval=border, maxval=width - border),
                jax.random.uniform(ks[1], (K,), minval=border, maxval=height - border),
            ],
            axis=1,
        )
        desc = jax.random.normal(ks[2], (K, D))
        desc = desc / jnp.linalg.norm(desc, axis=1, keepdims=True)

        theta = jax.random.uniform(ks[3], (), minval=-0.3, maxval=0.3)
        scale = jax.random.uniform(ks[4], (), minval=0.85, maxval=1.15)
        t = jax.random.uniform(ks[5], (2,), minval=-0.12, maxval=0.12) * jnp.array([width, height])
        c = jnp.array([width / 2.0, height / 2.0])
        R = jnp.array([[jnp.cos(theta), -jnp.sin(theta)], [jnp.sin(theta), jnp.cos(theta)]])
        warped = (pts - c) @ (scale * R).T + c + t
        warped = warped + jitter_px * jax.random.normal(ks[6], (K, 2))

        inside = (
            (warped[:, 0] >= 0) & (warped[:, 0] < width) & (warped[:, 1] >= 0) & (warped[:, 1] < height)
        )
        kept = inside & (jax.random.uniform(ks[7], (K,)) > drop_frac)

        # bank-1 content per *source* slot: warped point if kept, fresh
        # distractor otherwise — then shuffled by a random permutation
        dk = jax.random.split(ks[8], 3)
        d_pts = jnp.stack(
            [
                jax.random.uniform(dk[0], (K,), minval=border, maxval=width - border),
                jax.random.uniform(dk[1], (K,), minval=border, maxval=height - border),
            ],
            axis=1,
        )
        d_desc = jax.random.normal(dk[2], (K, D))
        d_desc = d_desc / jnp.linalg.norm(d_desc, axis=1, keepdims=True)
        nd = jax.random.normal(ks[9], (K, D))
        nd = nd / jnp.linalg.norm(nd, axis=1, keepdims=True)
        noisy = desc + desc_noise * nd
        noisy = noisy / jnp.linalg.norm(noisy, axis=1, keepdims=True)

        content_k = jnp.where(kept[:, None], warped, d_pts)
        content_d = jnp.where(kept[:, None], noisy, d_desc)

        perm = jax.random.permutation(jax.random.fold_in(k, 7), K)
        # slot perm[i] of bank 1 holds source i's content
        k1 = jnp.zeros((K, 2)).at[perm].set(content_k)
        d1 = jnp.zeros((K, D)).at[perm].set(content_d)
        tgt0 = jnp.where(kept, perm, K).astype(jnp.int32)
        tgt1 = jnp.full((K,), K, jnp.int32).at[perm].set(jnp.where(kept, jnp.arange(K), K).astype(jnp.int32))

        s0 = jax.random.uniform(jax.random.fold_in(k, 11), (K,), minval=0.3, maxval=1.0)
        s1 = jax.random.uniform(jax.random.fold_in(k, 13), (K,), minval=0.3, maxval=1.0)
        ones = jnp.ones((K,), bool)
        b0 = FeatureBank(scores=s0, kpts=pts, desc=desc, valid=ones)
        b1 = FeatureBank(scores=s1, kpts=k1, desc=d1, valid=ones)
        return b0, b1, tgt0, tgt1

    return jax.vmap(one)(jax.random.split(key, batch))


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def matching_loss(log_p: jax.Array, tgt0: jax.Array, tgt1: jax.Array, valid0: jax.Array, valid1: jax.Array) -> jax.Array:
    """NLL of the GT assignment under one (K+1, K+1) log-transport matrix.

    ``tgt0`` covers both true matches and frame-0 points assigned to the
    dustbin column; frame-1 contributes only its unmatched points (dustbin
    row) so matched pairs are not double counted.
    """
    K0 = tgt0.shape[0]
    K1 = tgt1.shape[0]
    l0 = -log_p[jnp.arange(K0), tgt0]
    l1 = -log_p[tgt1, jnp.arange(K1)]
    unmatched1 = valid1 & (tgt1 == K0)
    total = jnp.sum(jnp.where(valid0, l0, 0.0)) + jnp.sum(jnp.where(unmatched1, l1, 0.0))
    count = jnp.sum(valid0) + jnp.sum(unmatched1)
    return total / jnp.maximum(count, 1)


def batch_loss(
    params: Dict[str, Any],
    bank0: FeatureBank,
    bank1: FeatureBank,
    tgt0: jax.Array,
    tgt1: jax.Array,
    width: int,
    height: int,
    sinkhorn_iterations: int = 20,
    num_heads: int = 4,
) -> jax.Array:
    def one(b0, b1, t0, t1):
        log_p = superglue.match_scores(
            params, b0, b1, width, height, sinkhorn_iterations, num_heads=num_heads
        )
        return matching_loss(log_p, t0, t1, b0.valid, b1.valid)

    return jnp.mean(jax.vmap(one)(bank0, bank1, tgt0, tgt1))


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------

def make_train_step(width: int, height: int, sinkhorn_iterations: int, num_heads: int, optimizer):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, bank0, bank1, tgt0, tgt1):
        loss, grads = jax.value_and_grad(batch_loss)(
            params, bank0, bank1, tgt0, tgt1, width, height, sinkhorn_iterations, num_heads
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train(
    steps: int = 2000,
    batch: int = 8,
    capacity: int = 256,
    width: int = 640,
    height: int = 512,
    num_layers: int = 9,
    num_heads: int = 4,
    sinkhorn_iterations: int = 20,
    lr: float = 1e-4,
    seed: int = 0,
    log_every: int = 50,
    params: Dict[str, Any] | None = None,
    log_fn=print,
    batch_kwargs: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    if params is None:
        params = superglue.init_params(jax.random.PRNGKey(seed), num_layers, num_heads)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = optimizer.init(params)
    step = make_train_step(width, height, sinkhorn_iterations, num_heads, optimizer)
    for i in range(steps):
        b0, b1, t0, t1 = make_batch(rng, batch, capacity, width, height, **(batch_kwargs or {}))
        params, opt_state, loss = step(params, opt_state, b0, b1, t0, t1)
        if log_every and (i % log_every == 0 or i == steps - 1):
            log_fn(f"step {i}: loss {float(loss):.4f}")
    return params


def train_on_device(
    steps: int = 3000,
    batch: int = 8,
    capacity: int = 256,
    width: int = 640,
    height: int = 512,
    num_layers: int = 9,
    num_heads: int = 4,
    sinkhorn_iterations: int = 20,
    lr: float = 1e-4,
    seed: int = 0,
    chunk: int = 100,
    params: Dict[str, Any] | None = None,
    log_fn=print,
    batch_kwargs: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Fully on-device training: ``chunk`` optimizer steps per XLA program
    via ``lax.scan``, batches generated with :func:`make_batch_device`
    inside the scan. The host only fetches one mean-loss scalar per chunk,
    so a remote/relay-attached TPU trains at device speed instead of at
    host-transfer speed.
    """
    bk = batch_kwargs or {}
    if params is None:
        params = superglue.init_params(jax.random.PRNGKey(seed), num_layers, num_heads)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = optimizer.init(params)

    def one_step(carry, key):
        p, s = carry
        b0, b1, t0, t1 = make_batch_device(key, batch, capacity, width, height, **bk)
        loss, grads = jax.value_and_grad(batch_loss)(
            p, b0, b1, t0, t1, width, height, sinkhorn_iterations, num_heads
        )
        updates, s = optimizer.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(p, s, key):
        keys = jax.random.split(key, chunk)
        (p, s), losses = jax.lax.scan(one_step, (p, s), keys)
        return p, s, jnp.mean(losses)

    key = jax.random.PRNGKey(seed + 1)
    done = 0
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, mean_loss = run_chunk(params, opt_state, sub)
        done += chunk
        if log_fn:
            log_fn(f"step {done}: mean chunk loss {float(mean_loss):.4f}")
    return params
