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
  tile-x <= the left tile-x, so slot_r for a block of sb consecutive left
  slots lies in [j*sb - (max_tiles_w - 1), (j+1)*sb): the kernel reads the
  right bands through TWO BlockSpec views of the same array — the current
  block and the previous block as the tail — so Mosaic double-buffers both
  automatically (a v1 of this kernel issued one manual strided DMA per
  program and exposed ~15 us of un-overlapped DMA latency per step,
  ~2.7 ms/16-frame batch);
- window origins inside a band span only the tile size (the keypoint is in
  its tile), so the kernel statically restricts to an 8-aligned row band
  around [MARGIN-5, MARGIN-5+tile+10] and never touches the rest, and
  every reachable window column is < bw (= tile + 2*MARGIN), so the
  selected right band is cropped back to bw lanes before the strip dots
  (the 128-lane padding exists only to make the flatten/select legal).

Slot->band selection is a pair of (sb, sb) one-hot matmuls over the
flattened row windows; the 11-wide row/col window extraction rides small
banded one-hot dots, everything in VMEM, with no Mosaic-unsupported
reshapes or unaligned HBM slices.

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


def _kernel(meta_ref, bands_l_ref, br_main_ref, br_tail_ref, br_head_ref,
            costs_ref, *, span, k_slots, bw, bw_r, sb):
    j = pl.program_id(1)

    meta = meta_ref[0]                                    # (sb, 8)
    oy_l = meta[:, 0:1] - ROW0A
    ox_l = meta[:, 1:2]
    slot_r = meta[:, 2:3]
    oy_r = meta[:, 3:4] - ROW0A
    ox_r = meta[:, 4:5]

    # ---- left 11x11 patch from the row-cropped left band
    rawL = bands_l_ref[0][:, ROW0A:ROW0A + span, :]
    rawL = rawL.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    RL = _banded_onehot(oy_l, span, PATCH_W, sb)          # (sb, span, 11)
    CL = _banded_onehot(ox_l, bw, PATCH_W, sb)            # (sb, bw, 11)
    stripL = jax.lax.dot_general(                         # (sb, bw, 11u)
        rawL, RL, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    lpatch = jax.lax.dot_general(                         # (sb, 11u, 11v)
        stripL.astype(jnp.bfloat16), CL,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # ---- select each slot's right band: slot_r lies in the current block
    # [j*sb, (j+1)*sb), the previous one (tail — same-row tiles to the
    # left, up to max_tiles_w-1 back), or the next one (head — the
    # correlation row yy = round(vL*inv_s) can round into the NEXT tile
    # row, pushing slot_r up to max_tiles_w slots ABOVE the left slot);
    # three (sb, sb) one-hot matmuls over the flat (sb, span*bw_r) row
    # windows, then the native lanes->sublanes reshape (last dim 128)
    off = slot_r - j * sb                                 # (sb, 1)
    io_w = jax.lax.broadcasted_iota(jnp.int32, (sb, sb), 1)
    sel_m = (io_w == off).astype(jnp.bfloat16)
    sel_t = (io_w == off + sb).astype(jnp.bfloat16)       # off < 0 -> tail
    sel_h = (io_w == off - sb).astype(jnp.bfloat16)       # off >= sb -> head

    def flat(ref):
        return ref[0][:, ROW0A:ROW0A + span, :].reshape(
            sb, span * bw_r).astype(jnp.int32).astype(
                jnp.float32).astype(jnp.bfloat16)

    rawR = jax.lax.dot_general(
        sel_m, flat(br_main_ref),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rawR = rawR + jax.lax.dot_general(
        sel_t, flat(br_tail_ref),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rawR = rawR + jax.lax.dot_general(
        sel_h, flat(br_head_ref),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (sb, span*bw_r)
    # every reachable window column is < bw: crop the lane padding away
    # before the strip dots (halves their contraction width)
    rawR = rawR.reshape(sb, span, bw_r)[:, :, :bw].astype(jnp.bfloat16)

    # ---- right 11x21 strip via banded one-hot dots
    RR = _banded_onehot(oy_r, span, PATCH_W, sb)          # (sb, span, 11)
    stripR = jax.lax.dot_general(                         # (sb, bw, 11u)
        rawR, RR, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    CR = _banded_onehot(ox_r, bw, STRIP_W, sb)            # (sb, bw, 21)
    rstrip = jax.lax.dot_general(                         # (sb, 11u, 21)
        stripR, CR,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # ---- center-subtracted L1 over the 11 disparity shifts
    lrow = lpatch[:, PATCH_W // 2, :]                     # (sb, 11)
    ldiff = lpatch - _center_full(lrow, PATCH_W // 2, PATCH_W, sb)
    rrow = rstrip[:, PATCH_W // 2, :]                     # (sb, 21)
    cost_cols = []
    for o in range(NBRHOOD):
        rsh = rstrip[:, :, o:o + PATCH_W]                 # (sb, 11, 11)
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
    bw_r a multiple of 128 (lane-padded by the caller so the in-kernel
    flatten/select is tile-aligned).  meta: (B, K, 8) int32 (module
    docstring).  max_tiles_w: max tiles per row over levels (must be <= sb
    so the previous block covers every referenced tail slot); max_tile_h/w:
    max tile pixel size over levels (sizes the static row span windows can
    touch).  Returns costs (B, K, NBRHOOD) float32."""
    B, K, _, bw_r = bands_right_u8.shape
    bh, bw = bands_left_u8.shape[2], bands_left_u8.shape[3]
    assert bw_r % 128 == 0, "right bands must be 128-lane padded"
    while K % sb:
        sb //= 2
    if sb < max_tiles_w:
        # slot_r can sit up to max_tiles_w slots ABOVE the left slot, so a
        # head-view offset reaches (sb-1)+max_tiles_w; covering the head
        # range [sb, 2*sb) requires sb >= max_tiles_w — with sb smaller, no
        # selector fires and the window silently reads zeros.
        raise ValueError(
            f"slot block size {sb} (largest power-of-two divisor of K={K} "
            f"<= {SB}) must cover max_tiles_w={max_tiles_w} head slots")
    hi = ROW0 + max(max_tile_h, max_tile_w) + PATCH_W - 1
    span = min(-(-(hi - ROW0A) // 8) * 8, bh - ROW0A)
    n_j = K // sb
    grid = (B, n_j)
    kernel = partial(_kernel, span=span, k_slots=K, bw=bw, bw_r=bw_r, sb=sb)
    costs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sb, 8), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, sb, bh, bw), lambda b, j: (b, j, 0, 0)),
            pl.BlockSpec((1, sb, bh, bw_r), lambda b, j: (b, j, 0, 0)),
            pl.BlockSpec((1, sb, bh, bw_r),
                         lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0)),
            pl.BlockSpec((1, sb, bh, bw_r),
                         lambda b, j: (b, jnp.minimum(j + 1, n_j - 1), 0,
                                       0)),
        ],
        out_specs=pl.BlockSpec((1, sb, COST_PAD), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, COST_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, bands_left_u8, bands_right_u8, bands_right_u8,
      bands_right_u8)
    return costs[:, :, :NBRHOOD]
