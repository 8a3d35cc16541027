"""Bilinear grid sampling on device.

TPU-native replacement for the reference's CPU descriptor sampling loop
(``/root/reference/src/super_point.cpp:253-335`` — a per-keypoint,
per-channel scalar loop). Here sampling is a batched gather + weighted sum
that XLA fuses with the surrounding kernel; conventions match
``torch.nn.functional.grid_sample(..., align_corners=True)`` which is what
the reference's hand-rolled ``grid_sample`` implements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_nearest_corners(feature_map: jax.Array, grid_xy: jax.Array) -> jax.Array:
    """Sample ``feature_map`` (H, W, C) at normalized coords ``grid_xy``
    (N, 2) in [-1, 1] (x, y), align_corners=True, border-clipped.

    Returns (N, C).
    """
    H, W = feature_map.shape[0], feature_map.shape[1]
    ix = (grid_xy[:, 0] + 1.0) * 0.5 * (W - 1)
    iy = (grid_xy[:, 1] + 1.0) * 0.5 * (H - 1)

    ix_nw = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, W - 1)
    iy_nw = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, H - 1)
    ix_se = jnp.clip(ix_nw + 1, 0, W - 1)
    iy_se = jnp.clip(iy_nw + 1, 0, H - 1)

    # Interpolation weights computed against the *clipped* corner indices,
    # matching the reference/torch border behavior.
    nw = (ix_se.astype(ix.dtype) - ix) * (iy_se.astype(iy.dtype) - iy)
    ne = (ix - ix_nw.astype(ix.dtype)) * (iy_se.astype(iy.dtype) - iy)
    sw = (ix_se.astype(ix.dtype) - ix) * (iy - iy_nw.astype(iy.dtype))
    se = (ix - ix_nw.astype(ix.dtype)) * (iy - iy_nw.astype(iy.dtype))

    v_nw = feature_map[iy_nw, ix_nw]
    v_ne = feature_map[iy_nw, ix_se]
    v_sw = feature_map[iy_se, ix_nw]
    v_se = feature_map[iy_se, ix_se]
    return (
        v_nw * nw[:, None] + v_ne * ne[:, None] + v_sw * sw[:, None] + v_se * se[:, None]
    )


def patch_descriptors(img: jax.Array, kpts_xy: jax.Array, patch: int = 16, stride: float = 1.0) -> jax.Array:
    """Normalized intensity-patch descriptors sampled on device.

    ``img``: (H, W) grayscale in [0, 1]; ``kpts_xy``: (K, 2) pixel
    coordinates. Bilinearly samples a ``patch`` x ``patch`` window (spacing
    ``stride`` px) centered on each keypoint and returns zero-mean,
    L2-normalized flattened patches — (K, patch**2), i.e. 256-d at the
    default size, drop-in compatible with SuperPoint descriptors.

    This is a weights-free descriptor source ("superpoint.descriptor_source:
    patch"): robust for the translation-dominant inter-frame motion VO
    tracks, and usable with the from-scratch detector when no trained
    descriptor head is available (the reference has no equivalent — it
    cannot run without its TensorRT engines).
    """
    H, W = img.shape
    K = kpts_xy.shape[0]
    half = (patch - 1) / 2.0
    offs = (jnp.arange(patch) - half) * stride
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    # (K, patch*patch, 2) absolute sample coordinates
    sx = kpts_xy[:, 0:1] + ox.reshape(1, -1)
    sy = kpts_xy[:, 1:2] + oy.reshape(1, -1)
    gx = sx / (W - 1) * 2.0 - 1.0
    gy = sy / (H - 1) * 2.0 - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(K * patch * patch, 2)
    vals = grid_sample_nearest_corners(img[:, :, None], grid).reshape(K, patch * patch)
    vals = vals - jnp.mean(vals, axis=1, keepdims=True)
    norm = jnp.maximum(jnp.linalg.norm(vals, axis=1, keepdims=True), 1e-6)
    return vals / norm


def sample_descriptors(desc_map: jax.Array, kpts_xy: jax.Array, cell: int = 8) -> jax.Array:
    """Sample L2-normalized descriptors at keypoint pixel locations.

    ``desc_map``: (Hc, Wc, D) coarse descriptor map (stride ``cell``).
    ``kpts_xy``: (N, 2) keypoint pixel coordinates (x, y) in the full image.

    Uses SuperPoint's normalization (cell-center alignment; parity with
    ``super_point.cpp:255-268``), bilinear sampling, then L2 normalization.
    """
    Hc, Wc = desc_map.shape[0], desc_map.shape[1]
    s = float(cell)
    gx = (kpts_xy[:, 0] - s / 2 + 0.5) / (Wc * s - s / 2 - 0.5) * 2.0 - 1.0
    gy = (kpts_xy[:, 1] - s / 2 + 0.5) / (Hc * s - s / 2 - 0.5) * 2.0 - 1.0
    desc = grid_sample_nearest_corners(desc_map, jnp.stack([gx, gy], axis=-1))
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    return desc / norm
