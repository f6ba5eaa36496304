"""Pallas TPU kernel: fused FAST-16 score + NMS-L over pyramid canvases.

TPU-native re-design of the reference's per-pixel front-end kernels
(src/cuda/orb_FAST_compute_score.cu:1412-1623 fused with the NMS-L half of
src/cuda/orb_FAST_apply_NMS_G.cu:1256-1284).  The XLA fallback
(ops/frontend.fast_score_map) materialises a 16-way rolled ring stack in HBM;
this kernel streams row strips through VMEM, so HBM traffic drops to one
uint8 read + two int32 writes per canvas.

The reference's 2^16-entry segment-test lookup table (orb_gpu.cpp:366-436)
becomes an arithmetic circular-run test: for FAST_N_MAX == 16 (every shipped
config) the quirky first-maximal-run scan semantics reduce exactly to
"exists a circular run of >= FAST_N_MIN consecutive bright (or dark) ring
bits, and the mask is not 0xFFFF" — verified bit-exactly against the LUT for
all 65536 masks in tests/test_pallas_frontend.py.  Gathering a 64K LUT per
pixel would serialise the VPU; the run test is ~10 shift/AND ops.

Grid = (canvases, row strips).  The halo-padded canvas stays in HBM; each
program DMAs its (STRIP + 8)-row window (4-row halo: 3 ring + 1 NMS) into a
VMEM scratch — overlapping windows are not expressible as BlockSpec blocks —
and writes one (STRIP, W0) strip of both outputs.  Peak VMEM stays ~2 MB
regardless of image size (a full-canvas-per-program variant OOMed v5e's
16 MB VMEM at 320x240).  Per-level ROI rectangles ride as scalar-prefetch
SMEM so one compiled kernel serves every pyramid level.  Vertical halo reads
come from explicit zero padding rather than jnp.roll's wraparound; the two
differ only within 4 rows of the border, all zeroed by the BORDER_SKIP=20
ROI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import FAST_RING

HALO = 4  # 3 (FAST ring radius) + 1 (NMS-L neighborhood)
STRIP = 64


def _rollx(x, dx: int):
    """result[:, c] = input[:, c + dx] (circular columns, like jnp.roll)."""
    if dx == 0:
        return x
    return pltpu.roll(x, (-dx) % x.shape[1], 1)


def _rot16(x, s):
    s = s % 16
    if s == 0:
        return x
    return ((x >> np.uint32(s)) | (x << np.uint32(16 - s))) & np.uint32(0xFFFF)


def _run_ge_mask(mask_u32, n: int):
    """Positional run test: bit i of the result is set iff ring bits
    i, i+1, ..., i+n-1 (circular, ascending) are ALL set.  Doubling chain,
    all static shifts."""
    acc = None
    acc_len = 0
    base = mask_u32
    base_len = 1
    k = n
    while k > 0:
        if k & 1:
            if acc is None:
                acc, acc_len = base, base_len
            else:
                acc = acc & _rot16(base, acc_len)
                acc_len += base_len
        k >>= 1
        if k:
            base = base & _rot16(base, base_len)
            base_len *= 2
    return acc


def _circular_run_ge(mask_u32, n: int):
    """Does the 16-bit ring mask contain a circular run of >= n set bits?"""
    return _run_ge_mask(mask_u32, n) != 0


def _lin_ge_mask(mask_u32, n: int):
    """LINEAR run test: bit k set iff bits k..k+n-1 (no wraparound) are all
    set.  Plain right shifts zero-fill, so runs cannot cross bit 15."""
    acc = None
    acc_len = 0
    base = mask_u32
    base_len = 1
    k = n
    while k > 0:
        if k & 1:
            if acc is None:
                acc, acc_len = base, base_len
            else:
                acc = acc & (base >> np.uint32(acc_len))
                acc_len += base_len
        k >>= 1
        if k:
            base = base & (base >> np.uint32(base_len))
            base_len *= 2
    return acc


def _popcount16(x):
    x = x - ((x >> np.uint32(1)) & np.uint32(0x5555))
    x = (x & np.uint32(0x3333)) + ((x >> np.uint32(2)) & np.uint32(0x3333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F)
    return (x + (x >> np.uint32(8))) & np.uint32(0x001F)


def _segment_test(mask_u32, n_min: int, n_max: int):
    """Full reference segment test, bit-equivalent to the quirky
    first-maximal-run LUT scan (orb_gpu.cpp:366-436, ops/tables.fast_lut)
    for every (n_min, n_max); verified over all 65536 masks in
    tests/test_pallas_frontend.py.

    The scan walks the 16 ring bits MSB->LSB as a LINEAR string: every
    zero-terminated maximal linear run (including the one starting at bit
    15) is tested against [n_min, n_max]; only if none matches, the
    trailing run (ending at bit 0) combined with the leading run (starting
    at bit 15) is tested.  Entry 0xFFFF is always rejected."""
    full = np.uint32(0xFFFF)
    if n_max >= 16:
        # any circular run >= n_min is in range (runs cap at 16)
        return (_run_ge_mask(mask_u32, n_min) != 0) & (mask_u32 != full)
    x = mask_u32 & full
    # case 1: maximal linear run starting at k with a zero below it
    # (prev bit k-1 clear, k >= 1) and linear length in [n_min, n_max]
    lge_min = _lin_ge_mask(x, n_min)
    lge_cap = _lin_ge_mask(x, n_max + 1)
    prev_clear = (~(x << np.uint32(1))) & np.uint32(0xFFFE)
    case1 = (prev_clear & lge_min & (~lge_cap)) != 0
    # the leading run (start k with k+length-1 == 15, no zero above) is
    # also tested by the scan: its start has prev clear unless it begins
    # at k=0 (then it IS the wrap run); lge/~lge_cap already measure its
    # true linear length because shifts zero-fill past bit 15.
    # case 2: trailing ones (bits .. 0) + leading ones (bit 15 ..)
    trail = _popcount16(x & (~(x + np.uint32(1))) & full)
    inv = (~x) & full
    fill = inv
    for sft in (1, 2, 4, 8):
        fill = fill | (fill >> np.uint32(sft))
    lead = np.uint32(16) - _popcount16(fill)   # ones above the highest zero
    wrap = trail + lead
    case2 = (wrap >= np.uint32(n_min)) & (wrap <= np.uint32(n_max))
    return (case1 | ((~case1) & case2)) & (x != full)


def _fast_nms_kernel(roi_ref, hbm_ref, *rest, threshold: int, n_min: int,
                     n_max: int, has_mask: bool):
    if has_mask:
        (mask_hbm, raw_ref, nms_ref, win_ref, mwin_ref, sem, msem) = rest
    else:
        (raw_ref, nms_ref, win_ref, sem) = rest
    n = pl.program_id(0)
    j = pl.program_id(1)

    # DMA this strip's window (strip + halo rows) from the padded HBM canvas
    copy = pltpu.make_async_copy(
        hbm_ref.at[n, pl.ds(j * STRIP, STRIP + 2 * HALO), :], win_ref, sem)
    copy.start()
    if has_mask:
        # per-level binarized mask (orb_gpu.cpp:64-91): only the score rows
        mcopy = pltpu.make_async_copy(
            mask_hbm.at[n, pl.ds(j * STRIP + HALO - 1, STRIP + 2), :],
            mwin_ref, msem)
        mcopy.start()
        mcopy.wait()
    copy.wait()

    win = win_ref[:].astype(jnp.int32)            # (STRIP + 8, W0)
    W0 = win.shape[1]
    SC = STRIP + 2                                # score rows: strip +-1 for NMS

    # score region = window rows [HALO-1, HALO-1+SC); ring shift dy reads
    # rows [HALO-1+dy, ...): all static slices of the VMEM window.
    im = win[HALO - 1:HALO - 1 + SC]
    vt = im + threshold
    v_t = im - threshold

    sad = jnp.zeros_like(im)
    bright = jnp.zeros(im.shape, jnp.uint32)
    dark = jnp.zeros(im.shape, jnp.uint32)
    within = {}
    for k, (dy, dx) in enumerate(np.asarray(FAST_RING)):
        dy, dx = int(dy), int(dx)
        r = _rollx(win[HALO - 1 + dy:HALO - 1 + dy + SC], dx)
        sad = sad + jnp.abs(r - im)
        bit = np.uint32(1 << k)
        bright = bright | jnp.where(r > vt, bit, np.uint32(0))
        dark = dark | jnp.where(r < v_t, bit, np.uint32(0))
        if k in (0, 4, 8, 12):
            within[k] = (r <= vt) & (r >= v_t)

    # early-exit opposite-pair pruning (orb_FAST_compute_score.cu:1470-1520)
    pruned = (within[4] & within[12]) | (within[0] & within[8])

    is_corner = (_segment_test(bright, n_min, n_max)
                 | _segment_test(dark, n_min, n_max))

    score = jnp.where(is_corner & ~pruned, sad, 0)
    if has_mask:
        score = jnp.where(mwin_ref[...] > 0, score, 0)

    # ROI: global row of score-region row m is j*STRIP - 1 + m
    rows = (jax.lax.broadcasted_iota(jnp.int32, (SC, W0), 0)
            + j * STRIP - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SC, W0), 1)
    roi = ((rows >= roi_ref[n, 0]) & (rows < roi_ref[n, 1])
           & (cols >= roi_ref[n, 2]) & (cols < roi_ref[n, 3]))
    score = jnp.where(roi, score, 0)
    raw_ref[0] = score[1:1 + STRIP]

    # fused NMS-L: keep only >= all 8 neighbors (orb_FAST_apply_NMS_G.cu:1256)
    nmax = jnp.zeros((STRIP, W0), jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nmax = jnp.maximum(nmax, _rollx(score[1 + dy:1 + dy + STRIP], dx))
    ctr = score[1:1 + STRIP]
    nms_ref[0] = jnp.where(ctr >= nmax, ctr, 0)


@partial(jax.jit,
         static_argnames=("threshold", "n_min", "n_max", "interpret"))
def fast_score_nms_pallas(stack_u8, roi, threshold: int, n_min: int,
                          n_max: int = 16, mask_u8=None,
                          interpret: bool = False):
    """Fused FAST score + NMS-L over a batch of pyramid canvases.

    stack_u8: (N, H0, W0) uint8 zero-padded canvases (N = eyes x levels).
    roi: (N, 4) int32 rows/cols half-open ROI [y_lo, y_hi, x_lo, x_hi) —
    the true per-level extent shrunk by BORDER_SKIP.
    mask_u8: optional (N, H0, W0) uint8 per-canvas detection masks
    (score zeroed where mask == 0, reference orb_gpu.cpp:64-91 semantics).
    Returns (raw_score, nms_score), both (N, H0, W0) int32: raw feeds the
    sub-pixel parabola, nms feeds the per-tile NMS-G argmax.
    """
    N, H0, W0 = stack_u8.shape
    S = -(-H0 // STRIP)
    Hp = S * STRIP
    Wp = -(-W0 // 128) * 128  # Mosaic: last-dim slices must be 128-aligned
    # halo-pad rows so every strip window is in bounds
    padded = jnp.pad(stack_u8, ((0, 0), (HALO, Hp - H0 + HALO), (0, Wp - W0)))
    has_mask = mask_u8 is not None

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [pltpu.VMEM((STRIP + 2 * HALO, Wp), jnp.uint8),
               pltpu.SemaphoreType.DMA(())]
    operands = [roi, padded]
    if has_mask:
        mpadded = jnp.pad(mask_u8,
                          ((0, 0), (HALO, Hp - H0 + HALO), (0, Wp - W0)))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.insert(1, pltpu.VMEM((STRIP + 2, Wp), jnp.uint8))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        operands.append(mpadded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, S),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, STRIP, Wp), lambda n, j, roi: (n, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STRIP, Wp), lambda n, j, roi: (n, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )
    kernel = partial(_fast_nms_kernel, threshold=int(threshold),
                     n_min=int(n_min), n_max=int(n_max), has_mask=has_mask)
    raw, nms = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((N, Hp, Wp), jnp.int32),
        ),
        interpret=interpret,
    )(roi, padded, mpadded) if has_mask else pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((N, Hp, Wp), jnp.int32),
        ),
        interpret=interpret,
    )(roi, padded)
    return raw[:, :H0, :W0], nms[:, :H0, :W0]
