"""Stereo keypoint matching: Hamming coarse match + window-L1 subpixel refine.

TPU re-design of ORB_GPU::ORB_compute_stereo_match
(src/cuda/orb_stereo_match.cu:105-580).  The reference's five CPU/GPU phases
(row table -> candidate pairs -> batched Hamming -> per-left argmin -> 11x11
window correlation via cuBLAS GEMV -> subpixel parabola -> median prune)
become one jitted program over DENSE slot arrays:

- candidate gating is a (KL, KR) boolean mask (row-band, disparity window,
  |octave diff| <= 1) — no host-side pair lists;
- Hamming distances are one MXU matmul (ops/hamming.py);
- the window correlation samples the 11x11 left patch and the 11x21 right
  strip from static tile-anchored BANDS (ops/bands.py) with one-hot MXU
  matmuls — zero gathers (the fused fast path, stereo_match_bands), or from
  flat pyramid-stack gathers (stereo_match_core, the portable fallback kept
  for standalone per-eye call sites).  The cuBLAS-GEMV-with-ones reduce
  (orb_stereo_match.cu:1036-1053) is just a sum on TPU.

Outputs are dense (KL,) arrays u_right / depth with -1 for unmatched slots,
matching Frame::ComputeStereoMatches' mvuRight/mvDepth semantics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import hamming_matrix
from .bands import MARGIN, window_patches

TH_HIGH = 100  # reference ORBmatcher.cpp:24-25
TH_LOW = 50
PATCH_W = 11       # reference PATCH_WINDOW (orb_stereo_match.cu:56)
PATCH_HALF = 5
NBRHOOD = 11       # reference NBRHOOD (orb_stereo_match.cu:60)
NBR_HALF = 5
INVALID = 1 << 29  # python int: keep it a literal, not a traced constant


def _coarse_match(left, right, scales, inv_scales, level_widths, mbf, min_z):
    """Phases A-C: row/disparity/octave gating + MXU Hamming argmin + the
    (TH_HIGH+TH_LOW)/2 acceptance and window-correlation bounds check.
    Spec: orb_stereo_match.cu:119-290."""
    vL, uL = left.ys, left.xs
    vR, uR = right.ys, right.xs

    scales_j = jnp.asarray(scales, jnp.float32)
    inv_scales_j = jnp.asarray(inv_scales, jnp.float32)
    r_right = 2.0 * jnp.take(scales_j, right.octave)     # row slack per right kp
    # row table semantics: right kp spans rows [floor(vR-r), ceil(vR+r)];
    # left looks up row int(vL)
    row_lo = jnp.floor(vR - r_right)
    row_hi = jnp.ceil(vR + r_right)
    t_row = jnp.floor(vL)

    max_d = mbf / min_z
    ok = (
        left.valid[:, None]
        & right.valid[None, :]
        & (t_row[:, None] >= row_lo[None, :])
        & (t_row[:, None] <= row_hi[None, :])
        & (jnp.abs(left.octave[:, None] - right.octave[None, :]) <= 1)
        & (uR[None, :] >= uL[:, None] - max_d)
        & (uR[None, :] <= uL[:, None])
    )

    # bf16 distance table: values <= 256 are exact in bfloat16 and the
    # (K, K) matrix is the front-end's biggest temp at int32
    dist = hamming_matrix(left.desc, right.desc, dtype=jnp.bfloat16)
    dist = jnp.where(ok, dist, jnp.bfloat16(30000.0))
    best_idx = jnp.argmin(dist, axis=1)
    best_dist = jnp.take_along_axis(dist, best_idx[:, None], axis=1)[:, 0]
    best_dist = best_dist.astype(jnp.int32)
    # reference: init TH_HIGH, keep only if strictly better, then < (TH_HIGH+TH_LOW)/2
    th_orb = (TH_HIGH + TH_LOW) // 2
    matched = best_dist < th_orb

    octave = left.octave
    inv_s = jnp.take(inv_scales_j, octave)
    s = jnp.take(scales_j, octave)
    uR0 = jnp.take(uR, best_idx)
    scaled_uR0 = jnp.round(uR0 * inv_s)
    scaled_uL0 = jnp.round(uL * inv_s)
    scaled_vL0 = jnp.round(vL * inv_s)
    w_lvl = jnp.take(jnp.asarray(level_widths, jnp.int32), octave).astype(jnp.float32)
    in_bounds = (scaled_uR0 - (PATCH_HALF + NBR_HALF) >= 0) & (
        scaled_uR0 + (PATCH_HALF + NBR_HALF) < w_lvl)
    matched = matched & in_bounds
    return dict(
        best_idx=best_idx, best_dist=best_dist, matched=matched,
        xl=scaled_uL0.astype(jnp.int32), xr=scaled_uR0.astype(jnp.int32),
        yy=scaled_vL0.astype(jnp.int32), s=s, max_d=max_d, uL=uL,
        scaled_uR0=scaled_uR0,
    )


_SHIFT_SEL = None


def _shift_selector():
    """Static (NBRHOOD, PATCH_W+NBRHOOD-1, PATCH_W) one-hot tensor S with
    S[o, v+o, v] = 1: contracting the 21-wide strip against it yields all 11
    disparity-shifted 11-wide windows in ONE einsum, instead of 11
    lane-misaligned slices (each of which costs a layout shuffle on TPU)."""
    global _SHIFT_SEL
    if _SHIFT_SEL is None:
        S = np.zeros((NBRHOOD, PATCH_W + NBRHOOD - 1, PATCH_W), np.float32)
        for o in range(NBRHOOD):
            for v in range(PATCH_W):
                S[o, v + o, v] = 1.0
        _SHIFT_SEL = S
    return _SHIFT_SEL


def _neighborhood_costs(lpatch, rstrip):
    """Center-subtracted L1 over the 11 disparity offsets.
    lpatch: (..., 11, 11) f32; rstrip: (..., 11, 21) f32 -> (..., 11).
    Spec: orb_stereo_match.cu:990-1053 (the cuBLAS-GEMV-ones reduce is a
    sum on TPU)."""
    S = jnp.asarray(_shift_selector())
    lc = lpatch[..., PATCH_HALF, PATCH_HALF]
    ldiff = lpatch - lc[..., None, None]
    # all shifted windows at once: (..., o, u, v)
    rsh = jnp.einsum("...uw,owv->...ouv", rstrip, S,
                     preferred_element_type=jnp.float32)
    rc = rsh[..., PATCH_HALF, PATCH_HALF]                      # (..., o)
    diff = ldiff[..., None, :, :] - (rsh - rc[..., None, None])
    return jnp.sum(jnp.abs(diff), axis=(-2, -1))               # (..., 11)


def _refine_and_prune(costs, c, mbf):
    """Phase E: parabola subpixel, disparity/depth, median prune.
    Spec: orb_stereo_match.cu:1092-1175."""
    matched, uL, s = c["matched"], c["uL"], c["s"]
    KL = uL.shape[0]
    best_r = jnp.argmin(costs, axis=1)
    best_cost = jnp.take_along_axis(costs, best_r[:, None], axis=1)[:, 0]
    interior = (best_r > 0) & (best_r < NBRHOOD - 1)
    br = jnp.clip(best_r, 1, NBRHOOD - 2)
    d1 = jnp.take_along_axis(costs, (br - 1)[:, None], axis=1)[:, 0]
    d2 = jnp.take_along_axis(costs, br[:, None], axis=1)[:, 0]
    d3 = jnp.take_along_axis(costs, (br + 1)[:, None], axis=1)[:, 0]
    denom = 2.0 * (d1 + d3 - 2.0 * d2)
    delta = jnp.where(jnp.abs(denom) > 0, (d1 - d3) / denom, 2.0)
    good_delta = (delta >= -1.0) & (delta <= 1.0)

    best_u_r = c["s"] * (c["scaled_uR0"] + br.astype(jnp.float32) - NBR_HALF + delta)
    disparity = uL - best_u_r
    in_disp = (disparity >= 0.0) & (disparity < c["max_d"])
    clamped = disparity <= 0.0
    disparity = jnp.where(clamped, 0.01, disparity)
    best_u_r = jnp.where(clamped, uL - 0.01, best_u_r)

    accept = matched & interior & good_delta & in_disp
    depth = jnp.where(accept, mbf / disparity, -1.0)
    u_right = jnp.where(accept, best_u_r, -1.0)

    # ---- median-distance outlier pruning (orb_stereo_match.cu:565-580) ----
    n_acc = jnp.sum(accept)
    sort_costs = jnp.sort(jnp.where(accept, best_cost, jnp.inf))
    median = sort_costs[jnp.clip(n_acc // 2, 0, KL - 1)]
    th_dist = 1.5 * 1.4 * median
    keep = accept & (best_cost < th_dist)
    depth = jnp.where(keep, depth, -1.0)
    u_right = jnp.where(keep, u_right, -1.0)
    return u_right, depth


@partial(jax.jit, static_argnames=("n_levels",))
def stereo_match(
    left, right,
    pyr_left_stack, pyr_right_stack, level_widths,
    scales, inv_scales,
    mbf: float, min_z: float,
    n_levels: int,
):
    """Jitted wrapper around stereo_match_core (kept for call sites that
    extract eyes separately; the fused path is OrbFrontend.frame_step)."""
    return stereo_match_core(left, right, pyr_left_stack, pyr_right_stack,
                             level_widths, scales, inv_scales, mbf, min_z,
                             n_levels)


def stereo_match_core(
    left, right,
    pyr_left_stack, pyr_right_stack, level_widths,
    scales, inv_scales,
    mbf, min_z,
    n_levels: int,
    rel_l=None, rel_r=None,
):
    """Dense stereo matching via flat pyramid-stack gathers (portable path).

    left/right: FrontendResult pytrees (dense slots).
    pyr_*_stack: (L, H0, W0) uint8 — per-level images zero-padded to level-0
    size (stacked so per-slot octave selection is one flat gather).
    level_widths: (L,) int32 true widths per level.
    rel_l / rel_r: optional precomputed flat window offsets (121,) / (231,)
    int32 device arrays (pass them as jit ARGUMENTS — see stereo_rel_offsets —
    to avoid capturing large trace constants).
    Returns (u_right, depth, best_dist) each (KL,) float32/int32.
    """
    c = _coarse_match(left, right, scales, inv_scales, level_widths, mbf, min_z)
    xl, xr, yy, lvl = c["xl"], c["xr"], c["yy"], left.octave

    H0 = pyr_left_stack.shape[1]
    W0 = pyr_left_stack.shape[2]
    if rel_l is None or rel_r is None:
        rl, rr = stereo_rel_offsets(W0)
        rel_l = jnp.asarray(rl) if rel_l is None else rel_l
        rel_r = jnp.asarray(rr) if rel_r is None else rel_r

    base_l = lvl * (H0 * W0) + yy * W0 + xl
    base_r = lvl * (H0 * W0) + yy * W0 + xr
    lflat = pyr_left_stack.reshape(-1)
    rflat = pyr_right_stack.reshape(-1)
    lpatch = jnp.take(lflat, base_l[:, None] + rel_l, mode="clip").astype(
        jnp.float32).reshape(-1, PATCH_W, PATCH_W)
    rstrip = jnp.take(rflat, base_r[:, None] + rel_r, mode="clip").astype(
        jnp.float32).reshape(-1, PATCH_W, PATCH_W + NBRHOOD - 1)
    costs = _neighborhood_costs(lpatch, rstrip)
    u_right, depth = _refine_and_prune(costs, c, mbf)
    return u_right, depth, c["best_dist"]


def stereo_match_bands(
    left, right,
    bands_left, bands_right,
    band_y0, band_x0,
    lvl_tile_h, lvl_tile_w, lvl_ntw, lvl_off,
    level_widths, scales, inv_scales,
    mbf, min_z,
):
    """Dense stereo matching with band-sampled window correlation (no gathers).

    bands_left/right: (K, BH, BW) bfloat16 tile-anchored raw-pyramid bands
    (ops/bands.py), one per keypoint slot.  band_y0/x0: (K,) static tile
    origins.  lvl_*: (L,) int32 per-level tile geometry used to locate the
    RIGHT-eye band at the LEFT keypoint's octave (the reference correlates at
    the left octave, orb_stereo_match.cu:990-1053 — the matched right slot's
    own band can sit at a neighboring level, so the band is re-derived from
    the scaled right coordinate instead of taken from best_idx's slot).
    """
    bands_left = bands_left.astype(jnp.bfloat16)     # u8 bands from the
    bands_right = bands_right.astype(jnp.bfloat16)   # fused extraction
    c = _coarse_match(left, right, scales, inv_scales, level_widths, mbf, min_z)
    xl, xr, yy, lvl = c["xl"], c["xr"], c["yy"], left.octave
    KR = bands_right.shape[0]

    # right band at the LEFT octave containing (yy, xr): slot id is dynamic
    th = jnp.take(lvl_tile_h, lvl)
    tw = jnp.take(lvl_tile_w, lvl)
    tyr = yy // th
    txr = xr // tw
    slot_r = jnp.take(lvl_off, lvl) + tyr * jnp.take(lvl_ntw, lvl) + txr
    slot_r = jnp.clip(slot_r, 0, KR - 1)  # safety; gated by `matched` anyway
    sel = (jnp.arange(KR, dtype=jnp.int32)[None, :] == slot_r[:, None]
           ).astype(jnp.bfloat16)
    rb = jnp.einsum("kr,rhw->khw", sel,
                    bands_right, preferred_element_type=jnp.bfloat16)

    # left 11x11 patch from the left slot's own band; right 11x21 strip from
    # the re-derived band (measured: extracting both through one concatenated
    # window_patches call costs MORE than the second pair of one-hot matmuls
    # — the (2K, bh, bw) concat copy dominates)
    oy_l = yy - band_y0 + (MARGIN - PATCH_HALF)
    ox_l = xl - band_x0 + (MARGIN - PATCH_HALF)
    lpatch = window_patches(bands_left, oy_l, ox_l, PATCH_W, PATCH_W)
    oy_r = yy - tyr * th + (MARGIN - PATCH_HALF)
    ox_r = xr - txr * tw + (MARGIN - PATCH_HALF - NBR_HALF)
    rstrip = window_patches(rb, oy_r, ox_r, PATCH_W, PATCH_W + NBRHOOD - 1)

    costs = _neighborhood_costs(lpatch, rstrip)
    u_right, depth = _refine_and_prune(costs, c, mbf)
    return u_right, depth, c["best_dist"]


def stereo_match_bands_batch_pallas(
    L, R, bands_left_u8, bands_right_u8,
    band_y0, band_x0,
    lvl_tile_h, lvl_tile_w, lvl_ntw, lvl_off,
    level_widths, scales, inv_scales,
    mbf, min_z, max_tiles_w: int, max_tile_h: int, max_tile_w: int,
    interpret: bool = False, sb: int = 128,
):
    """Batched stereo matching with the Pallas window-correlation kernel.

    L/R: FrontendResult pytrees with leading (B,) frame axis.
    bands_left_u8: (B, K, bh, bw) or the FULL (2B, K, bh, bw) band tensor
    with left frames first (the kernel reads left blocks in place).
    bands_right_u8: (B, K, bh, 128) right-eye bands pre-padded to 128 lanes
    (OrbFrontend._extract_bands_r128).  Coarse gating and the subpixel
    refine/prune run in XLA (vmapped over frames); the window sampling + 11
    shifted L1 costs run in ops/pallas_stereo.py — one DMA'd right-band
    window per slot block, every intermediate in VMEM.  Costs are
    bit-identical to stereo_match_bands (integer arithmetic in f32).
    """
    from .pallas_stereo import stereo_costs_pallas

    def coarse(l, r):
        return _coarse_match(l, r, scales, inv_scales, level_widths, mbf,
                             min_z)

    c = jax.vmap(coarse)(L, R)
    xl, xr, yy, lvl = c["xl"], c["xr"], c["yy"], L.octave
    K = bands_left_u8.shape[1]
    th = jnp.take(lvl_tile_h, lvl)
    tw = jnp.take(lvl_tile_w, lvl)
    tyr = yy // th
    txr = xr // tw
    slot_r = jnp.take(lvl_off, lvl) + tyr * jnp.take(lvl_ntw, lvl) + txr
    slot_r = jnp.clip(slot_r, 0, K - 1)  # safety; gated by `matched` anyway
    oy_l = yy - band_y0[None] + (MARGIN - PATCH_HALF)
    ox_l = xl - band_x0[None] + (MARGIN - PATCH_HALF)
    oy_r = yy - tyr * th + (MARGIN - PATCH_HALF)
    ox_r = xr - txr * tw + (MARGIN - PATCH_HALF - NBR_HALF)
    zero = jnp.zeros_like(slot_r)
    meta = jnp.stack([oy_l, ox_l, slot_r, oy_r, ox_r, zero, zero, zero],
                     axis=-1).astype(jnp.int32)
    costs = stereo_costs_pallas(bands_left_u8, bands_right_u8, meta,
                                max_tiles_w, max_tile_h, max_tile_w,
                                interpret=interpret, sb=sb)
    u_right, depth = jax.vmap(lambda co, cc: _refine_and_prune(co, cc, mbf))(
        costs, c)
    return u_right, depth, c["best_dist"]


def stereo_rel_offsets(w0: int):
    """Static flat offsets for the 11x11 left patch and 11x21 right strip."""
    dy, dx = np.mgrid[-PATCH_HALF:PATCH_HALF + 1, -PATCH_HALF:PATCH_HALF + 1]
    rel_l = (dy * w0 + dx).reshape(-1).astype(np.int32)
    dys, dxs = np.mgrid[-PATCH_HALF:PATCH_HALF + 1,
                        -PATCH_HALF - NBR_HALF:PATCH_HALF + NBR_HALF + 1]
    rel_r = (dys * w0 + dxs).reshape(-1).astype(np.int32)
    return rel_l, rel_r


def stack_pyramid(levels, h0: int, w0: int):
    """Zero-pad per-level images into one (L, H0, W0) uint8 stack."""
    out = []
    for im in levels:
        h, w = im.shape
        out.append(jnp.zeros((h0, w0), jnp.uint8).at[:h, :w].set(im))
    return jnp.stack(out)
