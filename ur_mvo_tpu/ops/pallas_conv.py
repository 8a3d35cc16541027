"""Pallas TPU kernels for the SuperPoint encoder's first two stages.

The backbone's cost concentrates in stages 1-2 (full/half-resolution
3x3 convs at 64 channels): XLA's conv lowering leaves them 3-5x off the
MXU roofline even after column folding (see
``models/superpoint._conv_folded2`` and scripts/profile_conv_variants.py).
These kernels use a **slab layout** — activations as (rows, C, W) with
image columns in the 128-wide vector lanes — so that:

* every 3x3 conv becomes K-paired batched matmuls with a FULL 128-deep
  contraction: two taps' (64ch) input planes concat along channels and
  multiply a stacked (64, 128) weight block — no half-lane output tiles
  and no folding FLOPs overhead (9 taps -> 4 pairs + 1 single);
* all intermediate activations (conv1a 42 MB at 640x512 in NHWC terms)
  live only in VMEM: HBM sees the raw image in and the pooled stage
  output out;
* the 2x2 max-pool's column decimation runs as a (W, W/2) indicator
  matmul on the MXU (lane-strided slicing is not a Mosaic strength).

Grid = row strips (16 conv rows -> 8 pooled rows per step); halo rows
come from dynamic slices of the VMEM-resident padded image (stage 1) or
from prev/cur/next block triplets (stage 2).

Replaces the TensorRT engine internals of ``super_point.cpp:115-156``.
Falls back to the XLA path off-TPU; numerics match the plain conv path
to bf16 tolerance (tested, interpret mode).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP = 16  # conv rows per grid step (8 pooled output rows)

# 3x3 tap order t = dy*3 + dx; K-128 pairing of the 9 taps
_PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7)]
_LAST = 8


def _shifts3(x):
    """Three lane-shifted copies of (..., W): [w-1, w, w+1] with zero
    boundary (SAME padding)."""
    z = jnp.zeros_like(x[..., :1])
    return (
        jnp.concatenate([z, x[..., :-1]], -1),
        x,
        jnp.concatenate([x[..., 1:], z], -1),
    )


def _conv_slab_pairs(xin, Wp, Wl, b, out_rows):
    """3x3 conv in slab layout via K-paired batched matmuls.

    ``xin``: (out_rows+2, C, W) input slab (rows include the +-1 halo),
    ``Wp``: (4, Cout, 2C) stacked tap-pair weights, ``Wl``: (Cout, C)
    the 9th tap, ``b``: (Cout, 1). Returns (out_rows, Cout, W) f32
    (pre-activation).
    """
    R = out_rows
    xs = _shifts3(xin)

    def tap(t, rows):
        dy, dx = divmod(t, 3)
        return xs[dx][dy : dy + rows]

    acc = None
    for g, (ta, tb) in enumerate(_PAIRS):
        Ag = jnp.concatenate([tap(ta, R), tap(tb, R)], axis=1)  # (R, 2C, W)
        Wg = jnp.broadcast_to(Wp[g][None], (R,) + Wp[g].shape)  # (R, Cout, 2C)
        c = jax.lax.dot_general(
            Wg, Ag, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        acc = c if acc is None else acc + c
    Al = tap(_LAST, R)
    Wlb = jnp.broadcast_to(Wl[None], (R,) + Wl.shape)
    acc = acc + jax.lax.dot_general(
        Wlb, Al, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return acc + b[None].astype(jnp.float32)


def _pool2_slab(z):
    """2x2/2 max-pool of a (2R, C, W) f32 slab -> (R, C, W/2) via row-pair
    max + column-decimation matmul (MXU; Mosaic lacks fast lane-strided
    slicing)."""
    R2, C, W = z.shape
    rmax = jnp.max(z.reshape(R2 // 2, 2, C, W), axis=1)  # (R, C, W)
    zsh = jnp.concatenate([rmax[..., 1:], jnp.full_like(rmax[..., :1], -jnp.inf)], -1)
    m = jnp.maximum(rmax, zsh).astype(jnp.bfloat16)  # (R, C, W), cols maxed with right neighbor
    D = (
        jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 0)
        == 2 * jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 1)
    ).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        m, D, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, C, W/2)
    return out


def _stage1_kernel(Wa_ref, ba_ref, Wp_ref, Wl_ref, bb_ref, img_ref, out_ref):
    i = pl.program_id(0)
    x = img_ref[pl.ds(i * _STRIP, _STRIP + 4), :].astype(jnp.bfloat16)  # (20, W)
    # conv1a (Cin=1): 9-tap im2col matmul, one plain 2D dot per row.
    # (A batched dot over stacked shifted slices crashes Mosaic's
    # ApplyVectorLayout pass — "limits[i] <= dim(i)" in extract_slice —
    # on v5e; the per-row 2D form lowers cleanly and the matmuls are
    # tiny relative to conv1b.)
    xs = _shifts3(x)
    Wa = Wa_ref[:]  # (64, 9)
    rows = []
    for h in range(_STRIP + 2):
        Ah = jnp.concatenate(
            [xs[dx][h + dy : h + dy + 1, :] for dy in range(3) for dx in range(3)], axis=0
        )  # (9, W)
        rows.append(
            jax.lax.dot_general(
                Wa, Ah, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    o1 = jnp.stack(rows)  # (18, 64, W)
    o1 = jax.nn.relu(o1 + ba_ref[:][None].astype(jnp.float32)).astype(jnp.bfloat16)
    # rows of o1 are conv1a at global rows [16i-1, 16i+17); out-of-image
    # halo rows must be LITERAL zeros for conv1b's SAME padding (a conv
    # of the padded image rows is nonzero after bias+relu)
    H = img_ref.shape[0] - 4
    g = i * _STRIP - 1 + jax.lax.broadcasted_iota(jnp.int32, (_STRIP + 2, 1, 1), 0)
    o1 = jnp.where((g >= 0) & (g < H), o1, jnp.zeros_like(o1))
    # conv1b + pool
    o2 = _conv_slab_pairs(o1, Wp_ref[:], Wl_ref[:], bb_ref[:], _STRIP)
    o2 = jax.nn.relu(o2)
    out_ref[:] = _pool2_slab(o2).astype(out_ref.dtype)


def _stage2_kernel(Wpa_ref, Wla_ref, ba_ref, Wpb_ref, Wlb_ref, bb_ref,
                   prev_ref, cur_ref, nxt_ref, out_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    pv = prev_ref[_STRIP - 2 : _STRIP]
    pv = jnp.where(i > 0, pv, jnp.zeros_like(pv))
    nx = nxt_ref[0:2]
    nx = jnp.where(i < n - 1, nx, jnp.zeros_like(nx))
    xin = jnp.concatenate([pv, cur_ref[:], nx], axis=0)  # (20, C, W)
    oa = jax.nn.relu(
        _conv_slab_pairs(xin, Wpa_ref[:], Wla_ref[:], ba_ref[:], _STRIP + 2)
    ).astype(jnp.bfloat16)
    # out-of-image conv2a halo rows must be literal zeros for conv2b's
    # SAME padding (same reasoning as the stage-1 mask)
    g = i * _STRIP - 1 + jax.lax.broadcasted_iota(jnp.int32, (_STRIP + 2, 1, 1), 0)
    oa = jnp.where((g >= 0) & (g < n * _STRIP), oa, jnp.zeros_like(oa))
    ob = jax.nn.relu(_conv_slab_pairs(oa, Wpb_ref[:], Wlb_ref[:], bb_ref[:], _STRIP))
    out_ref[:] = _pool2_slab(ob).astype(out_ref.dtype)


def _pack33(p, dt):
    """(3,3,C,Cout) kernel -> ((4, Cout, 2C) pairs, (Cout, C) last,
    (Cout, 1) bias) for the slab matmuls."""
    w = p["w"].astype(dt)
    C, Cout = w.shape[2], w.shape[3]
    taps = [w[t // 3, t % 3] for t in range(9)]  # (C, Cout) each
    Wp = jnp.stack(
        [jnp.concatenate([taps[a], taps[b]], axis=0).T for a, b in _PAIRS]
    )  # (4, Cout, 2C)
    Wl = taps[_LAST].T  # (Cout, C)
    b = p["b"].astype(dt)[:, None]
    return Wp, Wl, b


def _stage_pair_slab(pa: Dict[str, Any], pb: Dict[str, Any], x: jax.Array, interpret: bool = False) -> jax.Array:
    """Generic conv_a+relu, conv_b+relu, 2x2-pool on a (Hs, C, Ws) slab ->
    (Hs/2, Cout, Ws/2). The kernel (``_stage2_kernel``) is width/channel
    agnostic; weights arrive packed (see :func:`_pack33`)."""
    Hs, C, Ws = x.shape
    assert Hs % _STRIP == 0, (Hs,)
    dt = jnp.bfloat16
    Wpa, Wla, ba = _pack33(pa, dt)
    Wpb, Wlb, bb = _pack33(pb, dt)
    Cout = pb["w"].shape[3]
    n = Hs // _STRIP
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    blk = lambda f: pl.BlockSpec((_STRIP, C, Ws), f, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _stage2_kernel,
        grid=(n,),
        in_specs=[
            full(Wpa.shape), full(Wla.shape), full(ba.shape),
            full(Wpb.shape), full(Wlb.shape), full(bb.shape),
            blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            blk(lambda i: (i, 0, 0)),
            blk(lambda i: (jnp.minimum(i + 1, n - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((_STRIP // 2, Cout, Ws // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hs // 2, Cout, Ws // 2), dt),
        interpret=interpret,
    )(Wpa, Wla, ba, Wpb, Wlb, bb, x, x, x)


def stage12_slab(params: Dict[str, Any], img: jax.Array, interpret: bool = False) -> jax.Array:
    """Stages 1+2 of the SuperPoint encoder: (H, W) f32/bf16 image ->
    (H/4, 64, W/4) bf16 slab (rows, channels, cols)."""
    H, W = img.shape
    assert H % (2 * _STRIP) == 0 and W % 128 == 0, (H, W)
    dt = jnp.bfloat16
    imgp = jnp.pad(img.astype(jnp.float32), ((2, 2), (0, 0)))  # (H+4, W)
    Wa = params["conv1a"]["w"].astype(dt).reshape(9, 64).T  # (64, 9)
    ba = params["conv1a"]["b"].astype(dt)[:, None]
    Wp1, Wl1, bb1 = _pack33(params["conv1b"], dt)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    s1 = pl.pallas_call(
        _stage1_kernel,
        grid=(H // _STRIP,),
        in_specs=[
            full(Wa.shape), full(ba.shape), full(Wp1.shape), full(Wl1.shape), full(bb1.shape),
            full(imgp.shape),
        ],
        out_specs=pl.BlockSpec((_STRIP // 2, 64, W // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H // 2, 64, W // 2), dt),
        interpret=interpret,
    )(Wa, ba, Wp1, Wl1, bb1, imgp)

    return _stage_pair_slab(params["conv2a"], params["conv2b"], s1, interpret=interpret)


def stage123_slab(params: Dict[str, Any], img: jax.Array, interpret: bool = False) -> jax.Array:
    """Stages 1-3: (H, W) image -> (H/8, 128, W/8) bf16 slab. Stage 3 is
    the same slab kernel at 64->128 channels; the slab->NHWC transpose is
    deferred to this 4x-smaller tensor (see ``superpoint.backbone``)."""
    s2 = stage12_slab(params, img, interpret=interpret)
    return _stage_pair_slab(params["conv3a"], params["conv3b"], s2, interpret=interpret)


def stage123_nhwc(params: Dict[str, Any], image: jax.Array, interpret: bool | None = None) -> jax.Array:
    """(B, H, W, 1) image -> (B, H/8, W/8, 128) NHWC via the slab kernels
    for encoder stages 1-3."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    outs = []
    for b in range(image.shape[0]):
        slab = stage123_slab(params, image[b, :, :, 0], interpret=interpret)
        outs.append(jnp.transpose(slab, (0, 2, 1)))  # (H/8, W/8, 128)
    return jnp.stack(outs)


def stage12_nhwc(params: Dict[str, Any], image: jax.Array, interpret: bool | None = None) -> jax.Array:
    """(B, H, W, 1) image -> (B, H/4, W/4, 64) NHWC, via the slab kernels
    (B folded into a python loop; the VO extract path runs B=1)."""
    if interpret is None:
        # Mosaic needs a real TPU; interpret elsewhere (tests, CPU debug)
        interpret = jax.default_backend() != "tpu"
    outs = []
    for b in range(image.shape[0]):
        slab = stage12_slab(params, image[b, :, :, 0], interpret=interpret)
        outs.append(jnp.transpose(slab, (0, 2, 1)))  # (H/4, W/4, 64)
    return jnp.stack(outs)


def conv_pallas_supported(H: int, W: int) -> bool:
    return H % (2 * _STRIP) == 0 and W % 128 == 0


def conv_pallas_enabled() -> bool:
    """Gate for the slab conv kernels (URMVO_PALLAS=0 force-disables,
    URMVO_PALLAS_CONV=0/1 overrides)."""
    from ur_mvo_tpu.ops.pallas_kernels import env_gate

    return env_gate("URMVO_PALLAS_CONV")
