"""SuperPoint keypoint detector + descriptor network in pure JAX.

The reference runs this network as a TensorRT engine built from ONNX
(``/root/reference/src/super_point.cpp:55-118``) with the architecture
defined in ``superpoint/SP/model.py``: a VGG-style shared encoder
(64-64-128-128 channels, 3 max-pools), a 65-channel detector head
(8x8 cells + dustbin, softmax -> depth-to-space -> simple_nms) and a
256-channel descriptor head. Here the same architecture is a functional
JAX model operating in NHWC (the TPU-preferred layout), with params as a
pytree so it jits, vmaps, shards and differentiates; NMS and the
post-processing run fused in the same XLA program (see
``ops/keypoints.py``).

Weight import: ``load_torch_weights`` maps a MagicLeap/reference
``superpoint_v1.pth``-style state dict (OIHW conv kernels) onto this
pytree when a checkpoint is available.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ur_mvo_tpu.ops.nms import simple_nms

# (name, in_ch, out_ch, kernel) in forward order; pools applied after the
# 'b' conv of stages 1-3. Mirrors the reference architecture (SP/model.py).
_ENCODER = [
    ("conv1a", 1, 64, 3),
    ("conv1b", 64, 64, 3),
    ("conv2a", 64, 64, 3),
    ("conv2b", 64, 64, 3),
    ("conv3a", 64, 128, 3),
    ("conv3b", 128, 128, 3),
    ("conv4a", 128, 128, 3),
    ("conv4b", 128, 128, 3),
]
_HEADS = [
    ("convPa", 128, 256, 3),
    ("convPb", 256, 65, 1),
    ("convDa", 128, 256, 3),
    ("convDb", 256, 256, 1),
]
_POOL_AFTER = {"conv1b", "conv2b", "conv3b"}


def init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """He-initialized parameter pytree. Kernels are HWIO (NHWC convs)."""
    params: Dict[str, Any] = {}
    for name, cin, cout, k in _ENCODER + _HEADS:
        key, sub = jax.random.split(key)
        fan_in = cin * k * k
        w = jax.random.normal(sub, (k, k, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params[name] = {"w": w, "b": jnp.zeros((cout,), dtype)}
    return params


def _conv(x: jax.Array, p: Dict[str, jax.Array], stride: int = 1) -> jax.Array:
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride, stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["b"].astype(x.dtype)
    )


def _pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def backbone(params: Dict[str, Any], image: jax.Array) -> jax.Array:
    """Shared encoder: (B, H, W, 1) in [0,1] -> (B, H/8, W/8, 128)."""
    x = image
    for name, _, _, _ in _ENCODER:
        x = jax.nn.relu(_conv(x, params[name]))
        if name in _POOL_AFTER:
            x = _pool2(x)
    return x


def detector_head(params: Dict[str, Any], feat: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 128) -> dense keypoint score map (B, H, W).

    65-way softmax over each 8x8 cell + dustbin, then depth-to-space.
    """
    x = jax.nn.relu(_conv(feat, params["convPa"]))
    logits = _conv(x, params["convPb"])  # (B, Hc, Wc, 65)
    probs = jax.nn.softmax(logits, axis=-1)[..., :64]
    B, Hc, Wc = probs.shape[0], probs.shape[1], probs.shape[2]
    # depth-to-space: cell channel c = 8*dy + dx.
    scores = probs.reshape(B, Hc, Wc, 8, 8)
    scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    return scores


def descriptor_head(params: Dict[str, Any], feat: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 128) -> L2-normalized coarse descriptor map
    (B, Hc, Wc, 256)."""
    x = jax.nn.relu(_conv(feat, params["convDa"]))
    d = _conv(x, params["convDb"])
    norm = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    return d / norm


def forward(
    params: Dict[str, Any],
    image: jax.Array,
    nms_radius: int = 4,
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Full dense forward: (B, H, W, 1) image in [0, 1] ->
    (scores (B, H, W) post-NMS, descriptors (B, Hc, Wc, 256)).

    Matches the reference's exported graph (scores already NMS-suppressed
    inside the network, ``SP/model.py:70-78``).
    """
    x = image.astype(compute_dtype)
    feat = backbone(params, x)
    scores = detector_head(params, feat).astype(jnp.float32)
    scores = jax.vmap(partial(simple_nms, radius=nms_radius))(scores)
    desc = descriptor_head(params, feat).astype(jnp.float32)
    return scores, desc


def load_torch_weights(path: str) -> Dict[str, Any]:
    """Load a torch ``superpoint_v1.pth``-style state dict into the NHWC
    pytree (conv kernels OIHW -> HWIO). Also accepts ``.npz`` exports with
    the same key names."""
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        import torch

        state = {k: v.cpu().numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}
    params: Dict[str, Any] = {}
    for name, _, _, _ in _ENCODER + _HEADS:
        w = state[f"{name}.weight"]
        b = state[f"{name}.bias"]
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(b),
        }
    return params


def save_npz(params: Dict[str, Any], path: str) -> None:
    flat = {}
    for name, p in params.items():
        flat[f"{name}.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        flat[f"{name}.bias"] = np.asarray(p["b"])
    np.savez(path, **flat)
