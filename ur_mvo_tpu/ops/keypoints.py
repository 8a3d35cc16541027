"""Fixed-shape keypoint selection: dense maps -> padded feature bank.

TPU-native replacement for the reference's CPU post-processing chain
(``/root/reference/src/super_point.cpp:178-386``): threshold
(``find_high_score_index``), border removal (``remove_borders``) or
semantic-mask filtering (``filter_points``), top-K by score
(``top_k_keypoints``), descriptor ``grid_sample`` + L2 normalize, packed
into a 259-channel feature matrix. Here the whole chain is one fused
device computation with a static output shape: a ``FeatureBank`` of
``capacity`` padded slots with a validity mask, so downstream matching and
geometry are shape-stable under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ur_mvo_tpu.ops.gridsample import sample_descriptors


class FeatureBank(NamedTuple):
    """Padded per-frame feature state (the reference's 259xN matrix,
    ``super_point.h:24-27``, made static-shape)."""

    scores: jax.Array  # (K,) f32, 0 for invalid slots
    kpts: jax.Array  # (K, 2) f32 pixel (x, y); 0 for invalid slots
    desc: jax.Array  # (K, D) f32 L2-normalized; 0 for invalid slots
    valid: jax.Array  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.scores.shape[-1]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def empty_feature_bank(capacity: int, desc_dim: int = 256, dtype=jnp.float32) -> FeatureBank:
    return FeatureBank(
        scores=jnp.zeros((capacity,), dtype),
        kpts=jnp.zeros((capacity, 2), dtype),
        desc=jnp.zeros((capacity, desc_dim), dtype),
        valid=jnp.zeros((capacity,), jnp.bool_),
    )


def select_keypoints(
    score_map: jax.Array,
    desc_map: jax.Array,
    capacity: int,
    threshold: float = 0.0005,
    border: int = 4,
    max_keypoints: int = 1000,
    mask: Optional[jax.Array] = None,
    cell: int = 8,
    raw_scores: Optional[jax.Array] = None,
) -> FeatureBank:
    """Dense maps -> top-K fixed-shape :class:`FeatureBank`.

    ``score_map``: (H, W) post-NMS keypoint scores.
    ``desc_map``: (H//cell, W//cell, D) coarse descriptor map.
    ``mask``: optional (H, W) semantic mask; nonzero keeps a pixel.
      When given, it *replaces* border removal — exactly the reference's
      behavior (``super_point.cpp:356-362``).
    ``raw_scores``: optional (H, W) PRE-NMS score map — enables sub-pixel
      peak refinement (1-D quadratic fit per axis over the 3x3 raw-score
      neighborhood, offsets clamped to ±0.5 px). The reference emits
      integer keypoints (``super_point.cpp:238-251``); sub-pixel peaks
      cut the ±0.5 px quantization that dominates stereo-disparity depth
      error at small baselines. NMS'd scores cannot be used here — NMS
      zeroes exactly the neighborhoods the fit needs.
    """
    H, W = score_map.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    keep = score_map > threshold
    if mask is not None:
        keep &= mask != 0
    else:
        keep &= (row >= border) & (row < H - border) & (col >= border) & (col < W - border)

    masked = jnp.where(keep, score_map, 0.0)
    flat = masked.reshape(-1)
    k = capacity
    if flat.shape[0] < capacity:
        # degenerate tiny image: pad the candidate pool to capacity
        flat = jnp.pad(flat, (0, capacity - flat.shape[0]))
    # approx_max_k: the TPU-native partial-reduction top-k. Exact top_k
    # sorts all H*W scores and was ~65% of the select stage (0.48 ms at
    # 640x512); at recall 0.98 only the weakest borderline keypoints can
    # differ, which NMS already made locally unique. Falls back to exact
    # on CPU.
    top_scores, top_idx = jax.lax.approx_max_k(flat, k, recall_target=0.98)
    yi = top_idx // W
    xi = top_idx % W
    ys = yi.astype(jnp.float32)
    xs = xi.astype(jnp.float32)
    if raw_scores is not None:
        def at(dy, dx):
            yy = jnp.clip(yi + dy, 0, H - 1)
            xx = jnp.clip(xi + dx, 0, W - 1)
            return raw_scores[yy, xx]

        sc, sl, sr = at(0, 0), at(0, -1), at(0, 1)
        su, sd = at(-1, 0), at(1, 0)
        # local max: denominators positive; guard degenerate plateaus
        dx_off = 0.5 * (sr - sl) / jnp.maximum(2.0 * sc - sl - sr, 1e-8)
        dy_off = 0.5 * (sd - su) / jnp.maximum(2.0 * sc - su - sd, 1e-8)
        xs = xs + jnp.clip(dx_off, -0.5, 0.5)
        ys = ys + jnp.clip(dy_off, -0.5, 0.5)

    valid = top_scores > threshold
    if max_keypoints < capacity:
        rank = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]
        valid &= rank < max_keypoints

    kpts = jnp.stack([xs, ys], axis=-1)
    desc = sample_descriptors(desc_map, kpts, cell=cell)

    zero = jnp.zeros((), dtype=score_map.dtype)
    return FeatureBank(
        scores=jnp.where(valid, top_scores, zero),
        kpts=jnp.where(valid[:, None], kpts, zero),
        desc=jnp.where(valid[:, None], desc, zero),
        valid=valid,
    )


def normalize_keypoints_for_matching(kpts: jax.Array, width: int, height: int) -> jax.Array:
    """SuperGlue keypoint normalization: center + scale by 0.7*max-dim
    (parity with ``point_matching.cc:63-76``)."""
    scale = 0.7 * max(width, height)
    cx = width // 2
    cy = height // 2
    return jnp.stack(
        [(kpts[..., 0] - cx) / scale, (kpts[..., 1] - cy) / scale], axis=-1
    )
