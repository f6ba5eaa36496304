"""Static tile-anchored pixel bands: the TPU-native gather killer.

NMS-G guarantees exactly one keypoint slot per tile (reference
orb_FAST_apply_NMS_G.cu:1372-1384), so every per-keypoint sampling window
(intensity-centroid patch, rotated rBRIEF samples, stereo correlation
windows) lies inside a STATIC band around the slot's tile: rows
[ty*th - MARGIN, ty*th + th + MARGIN), cols likewise.  Extracting those
bands needs no gather at all — it is a stack of shifted slices of the
level image (each band row block is a row block of the image shifted by a
static tile count).  Downstream, any dynamic window inside a band becomes a
small one-hot matmul on the MXU, replacing XLA gathers that move ~1 element
per cycle on TPU.

This module provides the extraction; ops/frontend.py and ops/stereo.py own
the one-hot sampling.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# band margin around each tile: rBRIEF rotated offsets reach <= 19, plus 3
# for the 7x7 gaussian support when the blur runs band-local (the fused
# Pallas descriptor kernel, ops/pallas_descriptor.py); also covers the IC
# patch (15) and the stereo correlation strip (11)
MARGIN = 22


def band_shape(tile_hs, tile_ws) -> tuple:
    """Common (BH, BW) across pyramid levels, rounded up to sublane/8."""
    bh = max(int(t) for t in tile_hs) + 2 * MARGIN
    bw = max(int(t) for t in tile_ws) + 2 * MARGIN
    rnd = lambda v: -(-v // 8) * 8
    return rnd(bh), rnd(bw)


def extract_tile_bands(img, th: int, tw: int, n_ty: int, n_tx: int,
                       bh: int, bw: int):
    """img: (B, H, W) -> (B, n_ty*n_tx, bh, bw) bands.

    Band (ty, tx) holds img rows [ty*th - MARGIN, ty*th - MARGIN + bh) and
    cols [tx*tw - MARGIN, tx*tw - MARGIN + bw), zero-padded out of bounds.
    Pure pad/reshape/slice/stack — compiles to copies, no gathers.
    """
    B, H, W = img.shape
    # --- rows: band row u of tile ty reads padded row ty*th + u,
    # u = q*th + r  ->  block (ty + q), inner row r
    n_q = -(-bh // th)
    n_blocks = n_ty + n_q
    pad_bot = n_blocks * th - MARGIN - H
    p = jnp.pad(img, ((0, 0), (MARGIN, max(pad_bot, 0)), (0, 0)))
    if pad_bot < 0:  # image taller than block cover (tiny tiles): trim
        p = p[:, : n_blocks * th, :]
    blocks = p.reshape(B, n_blocks, th, W)
    rows = jnp.stack([blocks[:, q:q + n_ty] for q in range(n_q)], axis=2)
    # (B, n_ty, n_q, th, W) -> (B, n_ty, n_q*th, W) -> crop to bh
    rows = rows.reshape(B, n_ty, n_q * th, W)[:, :, :bh, :]

    # --- cols: same trick on the last axis
    n_c = -(-bw // tw)
    n_cblocks = n_tx + n_c
    pad_r = n_cblocks * tw - MARGIN - W
    p2 = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (MARGIN, max(pad_r, 0))))
    if pad_r < 0:
        p2 = p2[..., : n_cblocks * tw]
    cblocks = p2.reshape(B, n_ty, bh, n_cblocks, tw)
    cols = jnp.stack([cblocks[:, :, :, c:c + n_tx] for c in range(n_c)],
                     axis=4)
    # (B, n_ty, bh, n_tx, n_c, tw) -> (B, n_ty, n_tx, bh, n_c*tw) -> crop
    cols = cols.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, n_ty, n_tx, bh, n_c * tw)[..., :bw]
    return cols.reshape(B, n_ty * n_tx, bh, bw)


def band_row_selector(H: int, n_ty: int, th: int, bh: int) -> np.ndarray:
    """(n_ty*bh, H) one-hot constant: band row (ty, u) <- image row
    ty*th - MARGIN + u (zero where out of image)."""
    R = np.zeros((n_ty * bh, H), np.float32)
    for ty in range(n_ty):
        for u in range(bh):
            r = ty * th - MARGIN + u
            if 0 <= r < H:
                R[ty * bh + u, r] = 1.0
    return R


def band_col_selector(W: int, n_tx: int, tw: int, bw: int) -> np.ndarray:
    """(W, n_tx*bw) one-hot constant: band col (tx, v) <- image col
    tx*tw - MARGIN + v."""
    C = np.zeros((W, n_tx * bw), np.float32)
    for tx in range(n_tx):
        for v in range(bw):
            c = tx * tw - MARGIN + v
            if 0 <= c < W:
                C[c, tx * bw + v] = 1.0
    return C


def extract_tile_bands_matmul(img, rsel, csel, n_ty: int, n_tx: int,
                              bh: int, bw: int):
    """Band extraction as two CONSTANT one-hot matmuls on the MXU
    (bit-equal to extract_tile_bands; measured ~1.7x faster on TPU — the
    slice-stack path's shifted copies are lane-misaligned, the matmuls are
    regular).  img: (B, H, W) uint8; rsel/csel from band_{row,col}_selector
    as bf16 device constants."""
    B = img.shape[0]
    imgf = img.astype(jnp.bfloat16)
    rows = jnp.einsum("rH,bHW->brW", rsel, imgf,
                      preferred_element_type=jnp.float32)
    full = jnp.einsum("brW,Wc->brc", rows.astype(jnp.bfloat16), csel,
                      preferred_element_type=jnp.float32)
    bands = full.reshape(B, n_ty, bh, n_tx, bw).transpose(
        0, 1, 3, 2, 4).reshape(B, n_ty * n_tx, bh, bw)
    return bands.astype(jnp.uint8)


def slot_band_origins(geom) -> tuple:
    """Static per-slot tile origins (ty*th, tx*tw) as int32 numpy arrays,
    padded to a multiple of 128 slots.  In-band coordinate of image pixel
    (y, x) for slot k is (y - band_y0[k] + MARGIN, x - band_x0[k] + MARGIN).
    """
    n = geom.total_slots
    npad = -(-n // 128) * 128
    y0 = np.zeros(npad, np.int32)
    x0 = np.zeros(npad, np.int32)
    for i in range(geom.n_levels):
        o = geom.level_offsets[i]
        nth, ntw = geom.n_tiles_h[i], geom.n_tiles_w[i]
        ty, tx = np.mgrid[0:nth, 0:ntw]
        y0[o:o + nth * ntw] = (ty * geom.tile_h[i]).reshape(-1)
        x0[o:o + nth * ntw] = (tx * geom.tile_w[i]).reshape(-1)
    return y0, x0


def window_onehots(origin_y, origin_x, ph: int, pw: int, bh: int, bw: int,
                   dtype=jnp.bfloat16):
    """One-hot window selectors for a (ph, pw) window at a dynamic in-band
    origin.  origin_*: (..., ) int32.  Returns R (..., ph, bh) and
    C (..., pw, bw) with R[.., u, origin_y+u] = 1 (0 if out of band).
    """
    def oh(origin, p, n):
        i_p = jnp.arange(p, dtype=jnp.int32)[:, None]
        i_n = jnp.arange(n, dtype=jnp.int32)[None, :]
        rel = i_n - i_p  # (p, n)
        shape = (1,) * origin.ndim + (p, n)
        return (rel.reshape(shape) == origin[..., None, None]).astype(dtype)

    return oh(origin_y, ph, bh), oh(origin_x, pw, bw)


def window_patches(bands, origin_y, origin_x, ph: int, pw: int,
                   dtype=jnp.bfloat16, out_dtype=jnp.float32):
    """Extract (ph, pw) windows at dynamic in-band origins via two one-hot
    MXU matmuls.  bands: (..., bh, bw) numeric (bfloat16 recommended);
    origin_*: (...,) int32.  Returns (..., ph, pw) out_dtype, exact for
    integer-valued inputs |v| < 2^8 (one-hot selection, f32 accumulate).
    """
    bh, bw = bands.shape[-2:]
    R, C = window_onehots(origin_y, origin_x, ph, pw, bh, bw, dtype)
    strips = jnp.einsum("...uh,...hw->...uw", R, bands,
                        preferred_element_type=jnp.float32)
    return jnp.einsum("...uw,...vw->...uv", strips.astype(dtype), C,
                      preferred_element_type=out_dtype)
