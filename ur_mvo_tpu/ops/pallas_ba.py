"""Pallas TPU kernel for the BA normal-equation point-side reduction.

Replaces the dense one-hot contraction in
``ops.ba.build_normal_terms_matmul`` (the ``Ep_b`` einsum): per LM
iteration that formulation reads a (O, P) bf16 indicator matrix
(~34 MB at production padding) and round-trips the (O, FF*18) slot-
expanded value matrix through HBM (~9 MB) — pure memory-bandwidth tax
for what is algebraically a segment-sum. Here the indicator and the
slot expansion are (re)built **inside VMEM** per 512-observation chunk
and contracted on the MXU, with the (P, FF*18+12) f32 accumulator
resident in VMEM across the whole grid; HBM traffic drops to the
~1 MB of actual per-observation values plus one output write.

Summand-for-summand identical to the matmul path (bf16 products,
f32 accumulation); no observation ordering requirements. Falls back
to the XLA path off-TPU (tests run the kernel in interpreter mode).

Replaces the g2o sparse-block assembly the reference builds row-by-row
on CPU (``/root/reference/src/g2o_optimization.cc:20-123``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _reduce_kernel(FF: int, P: int, VP: int, av_ref, idc_ref, idr_ref, out_ref):
    """One chunk: out += onehot(pt)^T @ [slot-expanded A | Vp]."""
    c = pl.program_id(0)
    av = av_ref[:]  # (CH, 32) bf16: [A 18 | Vp 12 | pad]
    CH = av.shape[0]
    A = av[:, :18]
    Vp = av[:, 18:30]
    slot_col = idc_ref[:, 1:2]  # (CH, 1) int32

    # slot-expanded A: EA[o, f*18+v] = A[o, v] * (slot[o] == f)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, FF * 18), 1)
    mask = (lane // 18) == slot_col
    At = jnp.concatenate([A] * FF, axis=1)  # (CH, FF*18)
    EA = jnp.where(mask, At, jnp.zeros_like(At))
    C = jnp.concatenate(
        [EA, Vp, jnp.zeros((CH, VP - FF * 18 - 12), av.dtype)], axis=1
    )  # (CH, VP)

    # transposed point indicator built directly in (P, CH) layout
    pt_row = idr_ref[0:1, :]  # (1, CH) int32
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P, CH), 0)
    ohT = (iota_p == pt_row).astype(av.dtype)  # (P, CH)

    contrib = jax.lax.dot_general(
        ohT, C, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (P, VP)

    @pl.when(c == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(c != 0)
    def _acc():
        out_ref[:] += contrib


def point_reduce_pallas(
    A: jax.Array,
    Vp: jax.Array,
    pt_ids: jax.Array,
    slot_ids: jax.Array,
    P: int,
    FF: int,
    interpret: bool = False,
) -> jax.Array:
    """Segment-reduce per-observation value rows onto points.

    ``A``: (O, 18) coupling-block values, ``Vp``: (O, 12) [H_pp | b_p]
    values, ``pt_ids``: (O,) int32 target point of each observation,
    ``slot_ids``: (O,) int32 free-frame slot in [0, FF). Rows of
    invalid observations must already be zero (their ids are then
    irrelevant). Returns (P, FF*18 + 12) f32:
    ``out[p, f*18+v] = sum_{o: pt=p, slot=f} A[o, v]`` and
    ``out[p, FF*18+v] = sum_{o: pt=p} Vp[o, v]``.
    """
    O = A.shape[0]
    V = FF * 18 + 12
    VP = _round_up(V, 128)
    Op = _round_up(O, _CHUNK)
    dt = jnp.bfloat16

    av = jnp.zeros((Op, 32), dt)
    av = av.at[:O, :18].set(A.astype(dt)).at[:O, 18:30].set(Vp.astype(dt))
    ids = jnp.zeros((Op, 2), jnp.int32)
    ids = (
        ids.at[:O, 0].set(jnp.clip(pt_ids, 0, P - 1))
        .at[Op:, 0].set(0)
        .at[:O, 1].set(jnp.clip(slot_ids, 0, FF - 1))
    )
    ids_rows = ids.T  # (2, Op)

    grid = Op // _CHUNK
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, FF, P, VP),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_CHUNK, 32), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, 2), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _CHUNK), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, VP), lambda c: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, VP), jnp.float32),
        interpret=interpret,
    )(av, ids, ids_rows)
    return out[:, :V]


# ---------------------------------------------------------------------------
# Sorted-window reduction: the dense formulations above (XLA one-hot and the
# chunked kernel) contract every observation chunk against ALL P points —
# O(O * P * V) MACs, ~94% of them structural zeros. With observations sorted
# by point id, the distinct points touched by a 512-observation chunk form a
# <=512-long CONTIGUOUS range of compact point ranks, so each chunk needs one
# (WIN, CHUNK) x (CHUNK, VP) dot against a ~528-row window of the accumulator
# — O(O * CHUNK * V) total, independent of P. The sort, rank remap and
# window table are loop-invariant per BA problem (built once outside the LM
# scan); the f32 accumulator stays VMEM-resident across the grid.
# ---------------------------------------------------------------------------

_SCHUNK = 512
_SWIN = _SCHUNK + 16  # <=CHUNK distinct ranks + 8-align slack, 16-multiple


def _sorted_reduce_kernel(FF: int, VP: int, win_ref, av_ref, idc_ref, idr_ref, out_ref):
    """One sorted chunk: out[w0 : w0+WIN] += local_onehot(rank)^T @ C."""
    c = pl.program_id(0)
    # window starts are 8-aligned by construction (make_sorted_layout);
    # Mosaic needs the hint to allow the dynamic f32 sublane store
    w0 = pl.multiple_of(win_ref[c], 8)
    av = av_ref[:]  # (CH, 32) bf16: [A 18 | Vp 12 | pad]
    CH = av.shape[0]
    A = av[:, :18]
    Vp = av[:, 18:30]
    slot_col = idc_ref[:, 1:2]  # (CH, 1) int32

    # slot-expanded A: EA[o, f*18+v] = A[o, v] * (slot[o] == f)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, FF * 18), 1)
    mask = (lane // 18) == slot_col
    At = jnp.concatenate([A] * FF, axis=1)
    EA = jnp.where(mask, At, jnp.zeros_like(At))
    C = jnp.concatenate([EA, Vp, jnp.zeros((CH, VP - FF * 18 - 12), av.dtype)], axis=1)

    # local-window transposed indicator: rows are compact ranks rel. w0
    rank_row = idr_ref[0:1, :]  # (1, CH) int32
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (_SWIN, CH), 0)
    ohT = (iota_w == (rank_row - w0)).astype(av.dtype)  # (WIN, CH)

    contrib = jax.lax.dot_general(
        ohT, C, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (WIN, VP)

    @pl.when(c == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[pl.ds(w0, _SWIN), :] += contrib


def point_reduce_sorted_pallas(
    A: jax.Array,
    Vp: jax.Array,
    rank_ids: jax.Array,
    slot_ids: jax.Array,
    win: jax.Array,
    n_ranks_pad: int,
    FF: int,
    interpret: bool = False,
) -> jax.Array:
    """Segment-reduce OBSERVATION-SORTED value rows onto compact point ranks.

    ``A`` (O, 18) / ``Vp`` (O, 12): value rows in point-sorted order (invalid
    rows zero). ``rank_ids`` (O,): compact point rank of each row
    (non-decreasing). ``slot_ids`` (O,): free-frame slot. ``win``
    (ceil(O/512),): 8-aligned accumulator window start per chunk, with
    ``rank_ids[c*512 + j] - win[c]`` in ``[0, 527]`` for every row of chunk c
    (guaranteed by sortedness + alignment). ``n_ranks_pad``: accumulator
    rows; must be >= max(win) + 528. Returns (n_ranks_pad, FF*18+12) f32;
    rows beyond the real ranks are exact zeros.
    """
    O = A.shape[0]
    V = FF * 18 + 12
    VP = _round_up(V, 128)
    Op = _round_up(max(O, _SCHUNK), _SCHUNK)
    dt = jnp.bfloat16

    av = jnp.zeros((Op, 32), dt)
    av = av.at[:O, :18].set(A.astype(dt)).at[:O, 18:30].set(Vp.astype(dt))
    ids = jnp.zeros((Op, 2), jnp.int32)
    ids = (
        ids.at[:O, 0].set(rank_ids)
        .at[O:, 0].set(rank_ids[-1] if O else 0)  # pad rows: in-window, zero values
        .at[:O, 1].set(jnp.clip(slot_ids, 0, FF - 1))
    )
    ids_rows = ids.T  # (2, Op)
    grid = Op // _SCHUNK
    win = jnp.concatenate([win, jnp.broadcast_to(win[-1:], (grid - win.shape[0],))])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_SCHUNK, 32), lambda c, w: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SCHUNK, 2), lambda c, w: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _SCHUNK), lambda c, w: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_ranks_pad, VP), lambda c, w: (0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sorted_reduce_kernel, FF, VP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ranks_pad, VP), jnp.float32),
        interpret=interpret,
    )(win, av, ids, ids_rows)
    return out[:, :V]


def ba_pallas_enabled() -> bool:
    """On by default on TPU (URMVO_PALLAS=0 force-disables)."""
    from ur_mvo_tpu.ops.pallas_kernels import env_gate

    return env_gate(None)
