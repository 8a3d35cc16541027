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


def _fold_cols(x: jax.Array) -> jax.Array:
    """Column space-to-depth: (B, H, W, C) -> (B, H, W/2, 2C) where
    folded channel q*C + c holds original column 2u+q, channel c."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def _conv_folded(x_folded: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """3x3 SAME conv evaluated in the column-folded layout.

    TPU rationale: vector lanes are 128-wide, so NHWC activations with
    C=64 (conv1/conv2 of this net) waste half of every tile — 2x the HBM
    traffic and half the MXU lanes. Folding column pairs into channels
    makes every stage-1/2 activation exactly 128 channels. A 3x3 stride-1
    conv decomposes exactly into TWO 3x2 convs over the folded array, one
    per output column parity q (output col 2u+q taps original cols
    2u+q-1..2u+q+1, which live in folded cols {u-1, u} for q=0 and
    {u, u+1} for q=1 — asymmetric column padding selects the window):

      q=0:  kx=0 -> (u-1, q=1)=w[:,0];  kx=1 -> (u,0)=w[:,1], (u,1)=w[:,2]
      q=1:  kx=0 -> (u,0)=w[:,0], (u,1)=w[:,1];  kx=1 -> (u+1, 0)=w[:,2]

    1.33x the FLOPs of the unfolded conv (structured zeros), but at
    full-lane layouts: measured 2.2x faster end-to-end for stages 1-3
    (0.885 -> ~0.4 ms for stage 1 at 640x512 on v5e). Replaces the
    reference's TensorRT engine internals (super_point.cpp:115-156).
    """
    w = p["w"]  # (3, 3, Cin, Cout)
    Cin = w.shape[2]
    dt = x_folded.dtype
    w = w.astype(dt)
    zeros = jnp.zeros_like(w[:, 0])
    # channel-concat axis: folded input channel q*Cin + c
    kx0_q0 = jnp.concatenate([zeros, w[:, 0]], axis=1)
    kx1_q0 = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)
    Kq0 = jnp.stack([kx0_q0, kx1_q0], axis=1)  # (3, 2, 2Cin, Cout)
    kx0_q1 = jnp.concatenate([w[:, 0], w[:, 1]], axis=1)
    kx1_q1 = jnp.concatenate([w[:, 2], zeros], axis=1)
    Kq1 = jnp.stack([kx0_q1, kx1_q1], axis=1)
    b = p["b"].astype(dt)

    def cv(k, col_pad):
        return jax.lax.conv_general_dilated(
            x_folded, k, window_strides=(1, 1),
            padding=((1, 1), col_pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    out_q0 = cv(Kq0, (1, 0))
    out_q1 = cv(Kq1, (0, 1))
    return jnp.concatenate([out_q0, out_q1], axis=-1)  # folded: q*Cout+c


def _folded_kernel(w: jax.Array, dt) -> jax.Array:
    """Reshape a (3, 3, Cin, Cout) kernel into the combined column-folded
    kernel (3, 3, 2*Cin, 2*Cout) computing BOTH output parities in one
    conv. Output parity q at folded col u is original col 2u+q; tap
    (dy, fx, input parity p) supplies original column offset
    dx = 2*fx + p - q (zero weight when |dx| > 1 — 1/3 structural zeros).

    TPU rationale: :func:`_conv_folded` runs two Cout=64 convs whose
    output tiles fill only half the 128 MXU lanes; the combined kernel
    trades 1.5x FLOPs (vs the unfolded conv's 1.33x) for full-lane
    output tiles, which profiles faster under XLA's conv lowering.
    """
    Cin, Cout = w.shape[2], w.shape[3]
    w = w.astype(dt)
    zeros = jnp.zeros((Cin, Cout), dt)
    rows = []
    for dy in range(3):
        drow = []
        for fx in (-1, 0, 1):
            prow = []
            for pq in range(2):
                qcat = []
                for q in range(2):
                    dx = 2 * fx + pq - q
                    qcat.append(w[dy, dx + 1] if -1 <= dx <= 1 else zeros)
                prow.append(jnp.concatenate(qcat, axis=1))  # (Cin, 2Cout)
            drow.append(jnp.concatenate(prow, axis=0))  # (2Cin, 2Cout)
        rows.append(jnp.stack(drow, axis=0))  # (3, 2Cin, 2Cout)
    return jnp.stack(rows, axis=0)  # (3, 3, 2Cin, 2Cout)


def _conv_folded2(x_folded: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """Column-folded 3x3 conv as ONE full-lane conv (see
    :func:`_folded_kernel`). Numerically identical to
    :func:`_conv_folded` (tested)."""
    dt = x_folded.dtype
    K = _folded_kernel(p["w"], dt)
    b = p["b"].astype(dt)
    out = jax.lax.conv_general_dilated(
        x_folded, K, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + jnp.concatenate([b, b])


def _conv_folded_im2col(x_folded: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """Column-folded 3x3 conv as an explicit im2col matmul.

    XLA lowers convolutions with tiny input depth (conv1a: Cin=1, folded
    Cin=2) far off the MXU roofline (~0.45 ms of stage 1 on v5e — the
    contraction depth is too small to tile). Building the 18*Cin-tap
    patch tensor with pad+slice+concat (VPU, fused) and contracting it
    against a (18*Cin, 2*Cout) weight matrix puts the op back on the MXU
    as one well-shaped matmul. Output layout/semantics are identical to
    :func:`_conv_folded` (folded channel q*Cout + c). Only profitable
    when Cin is small; used for conv1a.

    Weight mapping: output parity q at folded col u is original col
    2u+q; tap (dy, fx, parity p) supplies original column offset
    dx = 2*fx + p - q, valid when |dx| <= 1.
    """
    w = p["w"]  # (3, 3, Cin, Cout)
    Cin, Cout = w.shape[2], w.shape[3]
    dt = x_folded.dtype
    B, H, Wf, _ = x_folded.shape
    xp = jnp.pad(x_folded, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, dy : dy + H, fx : fx + Wf, :] for dy in range(3) for fx in range(3)],
        axis=-1,
    )  # (B, H, Wf, 9*2Cin), tap order (dy, fx, p*Cin+ci)
    Wm = _folded_kernel(w, dt).reshape(9 * 2 * Cin, 2 * Cout)
    b = p["b"].astype(dt)
    out = jnp.einsum("bhwk,kc->bhwc", patches, Wm)
    return out + jnp.concatenate([b, b])


def _patches3(x: jax.Array) -> jax.Array:
    """3x3 SAME im2col patch tensor: (B, H, W, C) -> (B, H, W, 9C),
    tap order (dy, dx)."""
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )


def _conv_im2col(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """3x3 SAME conv as an explicit im2col matmul.

    XLA's conv lowering leaves the late-stage convs (small spatial, 128
    channels) ~10x off the MXU roofline on v5e; one (H*W, 9*Cin) x
    (9*Cin, Cout) matmul with the patch tensor built by fused pad+slice+
    concat is bandwidth- and MXU-clean. Only used where the patch tensor
    is small (stage 4 + heads at H/8 resolution)."""
    w = p["w"]
    Cin, Cout = w.shape[2], w.shape[3]
    Wm = w.astype(x.dtype).reshape(9 * Cin, Cout)
    return jnp.einsum("bhwk,kc->bhwc", _patches3(x), Wm) + p["b"].astype(x.dtype)


def _pool2_folded(x_folded: jax.Array) -> jax.Array:
    """2x2/2 maxpool consuming the folded layout; returns standard NHWC.

    The column pair of each pooling window is exactly the two channel
    halves of a folded pixel, so the fold collapses for free."""
    C = x_folded.shape[-1] // 2
    t = jnp.maximum(x_folded[..., :C], x_folded[..., C:])
    return jax.lax.reduce_window(
        t, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )


def _stage12_xla(p12: Dict[str, Any], image: jax.Array) -> jax.Array:
    """XLA reference for encoder stages 1-2 (plain convs): used as the
    VJP of the Pallas slab kernels and for their numeric tests."""
    x = image
    for name in ("conv1a", "conv1b"):
        x = jax.nn.relu(_conv(x, p12[name]))
    x = _pool2(x)
    for name in ("conv2a", "conv2b"):
        x = jax.nn.relu(_conv(x, p12[name]))
    return _pool2(x)


def _stage123_xla(p123: Dict[str, Any], image: jax.Array) -> jax.Array:
    x = _stage12_xla(p123, image)
    for name in ("conv3a", "conv3b"):
        x = jax.nn.relu(_conv(x, p123[name]))
    return _pool2(x)


@jax.custom_vjp
def _stage123_pallas(p123: Dict[str, Any], image: jax.Array) -> jax.Array:
    from ur_mvo_tpu.ops.pallas_conv import stage123_nhwc

    return stage123_nhwc(p123, image)


def _stage123_fwd(p123, image):
    return _stage123_pallas(p123, image), (p123, image)


def _stage123_bwd(res, ct):
    p123, image = res
    out_x, vjp = jax.vjp(_stage123_xla, p123, image)
    return vjp(ct.astype(out_x.dtype))


_stage123_pallas.defvjp(_stage123_fwd, _stage123_bwd)


@jax.custom_vjp
def _stage12_pallas(p12: Dict[str, Any], image: jax.Array) -> jax.Array:
    from ur_mvo_tpu.ops.pallas_conv import stage12_nhwc

    return stage12_nhwc(p12, image)


def _stage12_fwd(p12, image):
    return _stage12_pallas(p12, image), (p12, image)


def _stage12_bwd(res, ct):
    # backward via the XLA path (forward recompute + vjp): the kernels
    # are inference-optimized; training pays the XLA cost only on bwd
    p12, image = res
    out_x, vjp = jax.vjp(_stage12_xla, p12, image)
    return vjp(ct.astype(out_x.dtype))


_stage12_pallas.defvjp(_stage12_fwd, _stage12_bwd)


def _pallas_conv_wanted(H: int, W: int) -> bool:
    from ur_mvo_tpu.ops.pallas_conv import conv_pallas_enabled, conv_pallas_supported

    return conv_pallas_enabled() and conv_pallas_supported(H, W)


def _folding_enabled() -> bool:
    """Column folding is a TPU layout optimization (full 128-lane tiles);
    on CPU it is pure overhead (1.33x FLOPs). Overridable for tests."""
    from ur_mvo_tpu.ops.pallas_kernels import env_gate

    return env_gate("URMVO_FOLDED_CONV", master=None)


def backbone(
    params: Dict[str, Any],
    image: jax.Array,
    folded: bool | None = None,
    pallas: bool | None = None,
) -> jax.Array:
    """Shared encoder: (B, H, W, 1) in [0,1] -> (B, H/8, W/8, 128).

    On TPU at supported shapes, stages 1-2 run as Pallas slab kernels
    (``ops/pallas_conv``: VMEM-resident activations, full-K paired
    matmuls) with an XLA-path custom VJP; stage 3 runs column-folded
    (see :func:`_conv_folded`); stage 4 is already 128-channel and runs
    unfolded. Off-TPU the profiled folded/plain XLA formulations apply."""
    x = image
    H, W = x.shape[1], x.shape[2]
    if pallas is None:
        pallas = _pallas_conv_wanted(H, W)
    if pallas:
        if H % (8 * 16) == 0:
            # stages 1-3 fully slab-resident; the slab->NHWC transpose is
            # deferred to the (H/8, W/8, 128) tensor
            x = _stage123_pallas(
                {k: params[k] for k in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b")}, x
            )
        else:
            x = _stage12_pallas({k: params[k] for k in ("conv1a", "conv1b", "conv2a", "conv2b")}, x)
            xf = _fold_cols(x)
            xf = jax.nn.relu(_conv_folded(xf, params["conv3a"]))
            xf = jax.nn.relu(_conv_folded(xf, params["conv3b"]))
            x = _pool2_folded(xf)
        # stage 4 at H/8: im2col matmuls (XLA convs are ~10x off roofline
        # at this spatial size; the patch tensors are only ~12 MB)
        x = jax.nn.relu(_conv_im2col(x, params["conv4a"]))
        x = jax.nn.relu(_conv_im2col(x, params["conv4b"]))
        return x
    if folded is None:
        folded = _folding_enabled()
    if folded and W % 8 == 0 and H % 8 == 0:
        # Per-stage formulation, A/B-profiled on v5e (scripts/
        # profile_conv_variants.py): stage 1 runs conv1a as an im2col
        # matmul (Cin=1 defeats XLA's conv tiling) and conv1b as the
        # combined full-lane folded kernel (0.562 ms vs 0.756 for the
        # two-half-conv form); stages 2-3 keep the two-half-conv form
        # (0.181/0.093 ms — at these resolutions it profiles faster,
        # and conv3's per-parity convs are already full-lane).
        stage_fns = (
            (_conv_folded_im2col, _conv_folded2),
            (_conv_folded, _conv_folded),
            (_conv_folded, _conv_folded),
        )
        for (na, nb), (fa, fb) in zip(
            (("conv1a", "conv1b"), ("conv2a", "conv2b"), ("conv3a", "conv3b")), stage_fns
        ):
            xf = _fold_cols(x)
            xf = jax.nn.relu(fa(xf, params[na]))
            xf = jax.nn.relu(fb(xf, params[nb]))
            x = _pool2_folded(xf)
        x = jax.nn.relu(_conv(x, params["conv4a"]))
        x = jax.nn.relu(_conv(x, params["conv4b"]))
        return x
    for name, _, _, _ in _ENCODER:
        x = jax.nn.relu(_conv(x, params[name]))
        if name in _POOL_AFTER:
            x = _pool2(x)
    return x


def _cell_softmax_to_scores(logits: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 65) detector logits -> dense (B, H, W) score map:
    65-way softmax (64 positions + dustbin), drop the dustbin,
    depth-to-space with cell channel c = 8*dy + dx."""
    probs = jax.nn.softmax(logits, axis=-1)[..., :64]
    B, Hc, Wc = probs.shape[0], probs.shape[1], probs.shape[2]
    scores = probs.reshape(B, Hc, Wc, 8, 8)
    return scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)


def _l2_normalize(d: jax.Array) -> jax.Array:
    """sqrt(sum+eps), NOT max(norm, eps): a cell with an exactly-zero
    descriptor (zero-filled warp borders through a zero-bias net) makes
    d(norm)/dd infinite, and the max guard does not stop the NaN from
    poisoning gradients (0 * inf) — training through this head hits it."""
    return d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)


def detector_head(params: Dict[str, Any], feat: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 128) -> dense keypoint score map (B, H, W).

    65-way softmax over each 8x8 cell + dustbin, then depth-to-space.
    """
    x = jax.nn.relu(_conv(feat, params["convPa"]))
    logits = _conv(x, params["convPb"])  # (B, Hc, Wc, 65)
    return _cell_softmax_to_scores(logits)


def descriptor_head(params: Dict[str, Any], feat: jax.Array) -> jax.Array:
    """(B, Hc, Wc, 128) -> L2-normalized coarse descriptor map
    (B, Hc, Wc, 256)."""
    x = jax.nn.relu(_conv(feat, params["convDa"]))
    return _l2_normalize(_conv(x, params["convDb"]))


def _heads_im2col(params: Dict[str, Any], feat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Both heads with ONE shared im2col patch tensor: convPa and convDa
    are 3x3 convs over the same features, so their weight matrices concat
    into a single (9*128, 512) matmul; the 1x1 convPb/convDb run as plain
    matmuls. Numerically identical to detector_head + descriptor_head
    (tested)."""
    dt = feat.dtype
    pa, pb = params["convPa"], params["convPb"]
    da, db = params["convDa"], params["convDb"]
    Cin = pa["w"].shape[2]
    Wcat = jnp.concatenate(
        [pa["w"].astype(dt).reshape(9 * Cin, 256), da["w"].astype(dt).reshape(9 * Cin, 256)], axis=1
    )
    bcat = jnp.concatenate([pa["b"], da["b"]]).astype(dt)
    h = jax.nn.relu(jnp.einsum("bhwk,kc->bhwc", _patches3(feat), Wcat) + bcat)
    logits = jnp.einsum("bhwc,cd->bhwd", h[..., :256], pb["w"][0, 0].astype(dt)) + pb["b"].astype(dt)
    d = jnp.einsum("bhwc,cd->bhwd", h[..., 256:], db["w"][0, 0].astype(dt)) + db["b"].astype(dt)
    return _cell_softmax_to_scores(logits), _l2_normalize(d.astype(jnp.float32))


def _im2col_heads_enabled() -> bool:
    """Fused im2col heads are a TPU formulation choice (URMVO_IM2COL
    overrides)."""
    from ur_mvo_tpu.ops.pallas_kernels import env_gate

    return env_gate("URMVO_IM2COL", master=None)


def forward(
    params: Dict[str, Any],
    image: jax.Array,
    nms_radius: int = 4,
    compute_dtype=jnp.float32,
    return_raw_scores: bool = False,
) -> tuple:
    """Full dense forward: (B, H, W, 1) image in [0, 1] ->
    (scores (B, H, W) post-NMS, descriptors (B, Hc, Wc, 256)).

    Matches the reference's exported graph (scores already NMS-suppressed
    inside the network, ``SP/model.py:70-78``). With
    ``return_raw_scores`` the pre-NMS score map is returned as a third
    output — NMS zeroes the 3x3 neighborhoods that sub-pixel peak
    refinement needs (``ops.keypoints.select_keypoints(subpixel=...)``).
    """
    x = image.astype(compute_dtype)
    feat = backbone(params, x)
    if _im2col_heads_enabled():
        scores, desc = _heads_im2col(params, feat)
        scores = scores.astype(jnp.float32)
        desc = desc.astype(jnp.float32)
    else:
        scores = detector_head(params, feat).astype(jnp.float32)
        desc = descriptor_head(params, feat).astype(jnp.float32)
    raw = scores
    scores = jax.vmap(partial(simple_nms, radius=nms_radius))(scores)
    if return_raw_scores:
        return scores, desc, raw
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
