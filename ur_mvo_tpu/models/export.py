"""Ahead-of-time model export: serialized StableHLO programs.

Capability parity with the reference's model-deployment chain
(``/root/reference/superpoint/SP/convert_superpoint_to_onnx.py`` +
TensorRT engine serialization ``super_point.cpp:402-438``): here the
deployable artifact is a serialized ``jax.export`` StableHLO program of
the fused frame step (SuperPoint extract [+ SuperGlue match]), which any
JAX runtime can reload and run without the Python model code — the same
role the ONNX + engine cache plays for the reference. The numeric check
(export -> reload -> compare) mirrors the reference's
``np.testing.assert_allclose`` export test (the only test it ships).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ur_mvo_tpu.models import superglue, superpoint
from ur_mvo_tpu.ops.keypoints import select_keypoints
from ur_mvo_tpu.ops.matching import decode_assignment


def build_frame_step(sp_params, sg_params, height: int, width: int, capacity: int = 1024,
                     max_keypoints: int = 1000, threshold: float = 5e-4,
                     sinkhorn_iterations: int = 20, match_threshold: float = 0.5):
    """The fused extract+match step as a pure function of two images."""

    def frame_step(image0: jax.Array, image1: jax.Array):
        def ext(img):
            scores, desc = superpoint.forward(sp_params, img[None, :, :, None])
            return select_keypoints(
                scores[0], desc[0], capacity=capacity, threshold=threshold, max_keypoints=max_keypoints
            )

        b0 = ext(image0)
        b1 = ext(image1)
        Z = superglue.match_scores(sg_params, b0, b1, width, height, sinkhorn_iterations)
        m = decode_assignment(Z, b0.valid, b1.valid, match_threshold)
        return b0.kpts, b1.kpts, m.idx1, m.score

    return frame_step


def export_frame_step(path: str, sp_params, sg_params, height: int = 512, width: int = 640, **kw) -> None:
    """Serialize the fused frame step to ``path`` (StableHLO bytes)."""
    fn = build_frame_step(sp_params, sg_params, height, width, **kw)
    spec = jax.ShapeDtypeStruct((height, width), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(spec, spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_frame_step(path: str):
    """Reload a serialized frame step; returns a callable(image0, image1)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return lambda a, b: exported.call(a, b)


def verify_roundtrip(path: str, sp_params, sg_params, height: int = 64, width: int = 80, **kw) -> float:
    """Export -> reload -> numeric comparison (the reference's
    ``assert_allclose(rtol=1e-3, atol=1e-5)`` export check)."""
    fn = build_frame_step(sp_params, sg_params, height, width, **kw)
    key = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(key, (height, width))
    img1 = img0 + 0.01
    ref = jax.jit(fn)(img0, img1)
    loaded = load_frame_step(path)
    got = loaded(img0, img1)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) for a, b in zip(ref, got))
    return err
