"""Pallas TPU kernel: stereo window correlation over VMEM-resident bands.

TPU-native replacement for the window phase of ORB_compute_stereo_match
(orb_stereo_match.cu:990-1053, the cuBLAS-GEMV L1 correlation): for every
matched left slot, sample the 11x11 left patch and the 11x21 right strip and
produce the 11 center-subtracted L1 disparity costs.

The XLA band path needs (a) a (K, KR) one-hot matmul to re-derive each left
slot's right band at the left octave and (b) materialized one-hot window
selectors; both round-trip HBM.  Here the kernel exploits the tile-anchored
band geometry (ops/bands.py) twice:

- the right band slot for left slot k lives in the SAME tile row at a
  tile-x <= the left tile-x, so a block of SB consecutive left slots only
  references right bands in the static window
  [block_start - (max_tiles_w - 1), block_start + SB): ONE strided DMA
  pulls that window's relevant rows into VMEM;
- window origins inside a band span only the tile size (the keypoint is in
  its tile), so the kernel statically restricts to an 8-aligned row band
  around [MARGIN-5, MARGIN-5+tile+10] and never touches the rest.

Slot->band selection is a per-row (SB, WIN) one-hot matmul; the 11-wide
row/col window extraction rides small banded one-hot dots, everything in
VMEM, with no Mosaic-unsupported reshapes or unaligned HBM slices.

meta columns (int32): [oy_l, ox_l, slot_r, oy_r, ox_r, 0, 0, 0] where
oy/ox are window ORIGINS inside the band (left: kp - PATCH_HALF; right
cols: kp - PATCH_HALF - NBR_HALF) and slot_r is the absolute right-band
slot id at the left octave.  Invalid slots may carry arbitrary (clipped)
values: their costs are garbage but gated by `matched` downstream.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bands import MARGIN

PATCH_W = 11
PATCH_HALF = 5
NBRHOOD = 11
NBR_HALF = 5
STRIP_W = PATCH_W + NBRHOOD - 1   # 21
SB = 128                           # left slots per program (default;
                                   # tuned on v5e, examples/check_stereo_v2.py)
COST_PAD = 16                      # costs padded 11 -> 16 lanes
ROW0 = MARGIN - PATCH_HALF         # first band row any window can touch
ROW0A = (ROW0 // 8) * 8            # 8-aligned DMA/crop base


def _banded_onehot(origin, span, width, sb):
    """(sb, span, width) bf16 with [s, origin[s]+u, u] = 1 — the banded
    row/col selector (origin relative to the cropped row window / full
    band columns)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (sb, span, width), 1)
    of = jax.lax.broadcasted_iota(jnp.int32, (sb, span, width), 2)
    return (io == origin[:, :, None] + of).astype(jnp.bfloat16)


def _center_full(row2d, idx, cols, sb):
    """Broadcast row2d[:, idx] to (sb, PATCH_W, cols) — Mosaic cannot
    broadcast sublanes+lanes in one op, so expand lanes then sublanes."""
    c = row2d[:, idx:idx + 1]                             # (sb, 1)
    c_row = jnp.broadcast_to(c, (sb, cols))               # lanes only
    return jax.lax.broadcast_in_dim(
        c_row, (sb, PATCH_W, cols), (0, 2))               # sublanes only


def _kernel(meta_ref, bands_l_ref, bands_r_hbm, costs_ref,
            win_ref, sem, *, span, win, pad_l, k_slots, bw, bw_r, sb):
    b = pl.program_id(0)
    j = pl.program_id(1)
    # 8-aligned window start (manual DMA slices must be tile-aligned);
    # win = ceil8(sb + pad_l + 7) so flooring to 8 never loses coverage of
    # [j*sb - pad_l, j*sb + sb)
    start = jnp.clip(((j * sb - pad_l) // 8) * 8, 0, k_slots - win)
    start = pl.multiple_of(start, 8)
    # one strided DMA: the 8-aligned row band any right strip can touch,
    # for every band in this block's static reference window
    cp = pltpu.make_async_copy(
        bands_r_hbm.at[b, pl.ds(start, win),
                       pl.ds(ROW0A * bw_r, span * bw_r)],
        win_ref, sem)
    cp.start()

    meta = meta_ref[0]                                    # (SB, 8)
    oy_l = meta[:, 0:1] - ROW0A
    ox_l = meta[:, 1:2]
    slot_r = meta[:, 2:3]
    oy_r = meta[:, 3:4] - ROW0A
    ox_r = meta[:, 4:5]

    # ---- left 11x11 patch from the row-cropped left band
    rawL = bands_l_ref[0][:, ROW0A:ROW0A + span, :]
    rawL = rawL.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    RL = _banded_onehot(oy_l, span, PATCH_W, sb)              # (SB, span, 11)
    CL = _banded_onehot(ox_l, bw, PATCH_W, sb)                # (SB, bw, 11)
    stripL = jax.lax.dot_general(                         # (SB, bw, 11u)
        rawL, RL, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    lpatch = jax.lax.dot_general(                         # (SB, 11u, 11v)
        stripL.astype(jnp.bfloat16), CL,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    cp.wait()
    # ---- select each slot's right band: ONE (SB, WIN) one-hot matmul over
    # the flat (win, span*128) window, then the native lanes->sublanes
    # reshape (the last dim stays exactly 128, which Mosaic supports)
    io_w = jax.lax.broadcasted_iota(jnp.int32, (sb, win), 1)
    selw = (io_w == (slot_r - start)).astype(jnp.bfloat16)
    winf = win_ref[...].astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)                 # (win, span*128)
    rawR = jax.lax.dot_general(
        selw, winf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (SB, span*128)
    rawR = rawR.reshape(sb, span, bw_r).astype(jnp.bfloat16)

    # ---- right 11x21 strip via banded one-hot dots
    RR = _banded_onehot(oy_r, span, PATCH_W, sb)              # (SB, span, 11)
    stripR = jax.lax.dot_general(                         # (SB, bw_r, 11u)
        rawR, RR, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    CR = _banded_onehot(ox_r, bw_r, STRIP_W, sb)              # (SB, bw_r, 21)
    rstrip = jax.lax.dot_general(                         # (SB, 11u, 21)
        stripR, CR,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # ---- center-subtracted L1 over the 11 disparity shifts
    lrow = lpatch[:, PATCH_W // 2, :]                     # (SB, 11)
    ldiff = lpatch - _center_full(lrow, PATCH_W // 2, PATCH_W, sb)
    rrow = rstrip[:, PATCH_W // 2, :]                     # (SB, 21)
    cost_cols = []
    for o in range(NBRHOOD):
        rsh = rstrip[:, :, o:o + PATCH_W]                 # (SB, 11, 11)
        rc = _center_full(rrow, o + PATCH_W // 2, PATCH_W, sb)
        d = jnp.abs(ldiff - (rsh - rc))
        cost_cols.append(jnp.sum(jnp.sum(d, axis=2), axis=1,
                                 keepdims=True))
    costs = jnp.concatenate(
        cost_cols + [jnp.zeros((sb, COST_PAD - NBRHOOD), jnp.float32)], 1)
    costs_ref[0] = costs


@partial(jax.jit, static_argnames=("max_tiles_w", "max_tile_h", "max_tile_w",
                                   "interpret", "sb"))
def stereo_costs_pallas(bands_left_u8, bands_right_u8, meta,
                        max_tiles_w: int, max_tile_h: int, max_tile_w: int,
                        interpret: bool = False, sb: int = SB):
    """bands_left_u8: (B or 2B, K, bh, bw) uint8 — left frames first, read
    in place (no split copy).  bands_right_u8: (B, K, bh, bw_r) uint8 with
    bw_r a multiple of 128 (pre-padded by the extractor so the manual DMA's
    lane slices are tile-aligned).  meta: (B, K, 8) int32 (module
    docstring).  max_tiles_w: max tiles per row over levels (sizes the
    right-band reference window); max_tile_h/w: max tile pixel size over
    levels (sizes the static row span windows can touch).
    Returns costs (B, K, NBRHOOD) float32."""
    B, K, _, bw_r = bands_right_u8.shape
    bh, bw = bands_left_u8.shape[2], bands_left_u8.shape[3]
    assert bw_r % 128 == 0, "right bands must be 128-lane padded"
    while K % sb:
        sb //= 2
    pad_l = max_tiles_w - 1
    win = min(-(-(sb + pad_l + 7) // 8) * 8, K)
    hi = ROW0 + max(max_tile_h, max_tile_w) + PATCH_W - 1
    span = min(-(-(hi - ROW0A) // 8) * 8, bh - ROW0A)
    # flat (B, K, bh*bw_r): the row window becomes one contiguous,
    # 128-aligned lane slice for the manual DMA
    bands_right_flat = bands_right_u8.reshape(B, K, bh * bw_r)
    grid = (B, K // sb)
    kernel = partial(_kernel, span=span, win=win, pad_l=pad_l, k_slots=K,
                     bw=bw, bw_r=bw_r, sb=sb)
    costs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sb, 8), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, sb, bh, bw), lambda b, j: (b, j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, sb, COST_PAD), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, COST_PAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win, span * bw_r), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, bands_left_u8, bands_right_flat)
    return costs[:, :, :NBRHOOD]
