"""NumPy oracle of the Jetson-SLAM GPU front-end, written as straight loops.

This is the behavioral spec used by the unit tests: each function mirrors a
reference CUDA kernel's semantics exactly (citations inline).  Slow, clear,
and independent of the JAX implementation.
"""
from __future__ import annotations

import numpy as np

from jetson_slam_tpu.ops.tables import (
    BORDER_SKIP,
    FAST_RING,
    HALF_PATCH_SIZE,
    fast_lut,
    gaussian_weights,
    orb_pattern,
    umax_table,
)


def pyramid_resize(img0: np.ndarray, out_h: int, out_w: int, inv_scale: float) -> np.ndarray:
    """Bilinear downscale from level 0 (orb_pyramid.cu:18-66), uint8 truncation."""
    H, W = img0.shape
    scale = 1.0 / np.float32(inv_scale)
    out = np.zeros((out_h, out_w), dtype=np.uint8)
    src = img0.astype(np.float32)
    for h in range(out_h):
        for w in range(out_w):
            ip_h = np.float32(scale * h)
            ip_w = np.float32(scale * w)
            xl = int(np.floor(ip_w)); xr = xl + 1
            yt = int(np.floor(ip_h)); yb = yt + 1
            w_xl = xr - ip_w; w_xr = 1.0 - w_xl
            w_yt = yb - ip_h; w_yb = 1.0 - w_yt
            xr_c = min(xr, W - 1); yb_c = min(yb, H - 1)
            val = (w_yt * w_xl * src[yt, xl] + w_yt * w_xr * src[yt, xr_c]
                   + w_yb * w_xl * src[yb_c, xl] + w_yb * w_xr * src[yb_c, xr_c])
            out[h, w] = np.uint8(val)  # CUDA float->uchar truncates
    return out


def fast_score(img: np.ndarray, threshold: int, n_min: int, n_max: int,
               mask: np.ndarray | None = None) -> np.ndarray:
    """FAST SAD score map (orb_FAST_compute_score.cu:1412-1623)."""
    H, W = img.shape
    lut = fast_lut(n_min, n_max)
    score = np.zeros((H, W), dtype=np.int32)
    im = img.astype(np.int32)
    for h in range(BORDER_SKIP, H - BORDER_SKIP):
        for w in range(BORDER_SKIP, W - BORDER_SKIP):
            if mask is not None and not mask[h, w]:
                continue
            v = im[h, w]
            vt, v_t = v + threshold, v - threshold
            ring = [im[h + dy, w + dx] for dy, dx in FAST_RING]
            # early-exit opposite pairs (4,12) then (0,8)
            if v_t <= ring[4] <= vt and v_t <= ring[12] <= vt:
                continue
            if v_t <= ring[0] <= vt and v_t <= ring[8] <= vt:
                continue
            bright = sum((1 << i) for i in range(16) if ring[i] > vt)
            dark = sum((1 << i) for i in range(16) if ring[i] < v_t)
            if lut[bright] or lut[dark]:
                score[h, w] = sum(abs(r - v) for r in ring)
    return score


def nms_lg(score: np.ndarray, tile_h: int, tile_w: int, fuse_nms_l: bool = True):
    """Fused NMS-L + NMS-G per-tile max (orb_FAST_apply_NMS_G.cu:1178-1384).

    Returns (kp_x, kp_y, kp_score) dense per-tile arrays, row-major over
    tiles.  A slot with score 0 is empty.  NMS-L keeps a pixel only if its
    score >= all 8 neighbors; tile rows are clamped to the BORDER_SKIP ROI.
    """
    H, W = score.shape
    n_th = (H - 1) // tile_h + 1
    n_tw = (W - 1) // tile_w + 1
    kp_x = np.zeros(n_th * n_tw, dtype=np.int32)
    kp_y = np.zeros(n_th * n_tw, dtype=np.int32)
    kp_s = np.zeros(n_th * n_tw, dtype=np.int32)
    for ty in range(n_th):
        for tx in range(n_tw):
            h_min = max(ty * tile_h, BORDER_SKIP)
            h_max = min((ty + 1) * tile_h, H - BORDER_SKIP)
            best = (0, 0, 0)  # score, y, x
            for h in range(h_min, h_max):
                for w in range(tx * tile_w, min((tx + 1) * tile_w, W)):
                    s = int(score[h, w])
                    if s == 0:
                        continue
                    if fuse_nms_l:
                        ok = True
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                if dy == 0 and dx == 0:
                                    continue
                                if s < score[h + dy, w + dx]:
                                    ok = False
                        if not ok:
                            s = 0
                    if s > best[0]:
                        best = (s, h, w)
            idx = ty * n_tw + tx
            kp_s[idx], kp_y[idx], kp_x[idx] = best
    return kp_x, kp_y, kp_s


def nms_ms(kp_x, kp_y, kp_s, kp_level, kp_scale, n_levels, h0, w0):
    """Multi-scale NMS, GPU path (orb_FAST_apply_NMS_MS.cu:389-467).

    Modifies kp_s in place (zeroing suppressed slots) and returns it.
    kp_* are the concatenated per-tile slot arrays over all levels;
    kp_scale[i] = scale_[level_of_slot_i] (level->level0 multiplier).
    """
    s0 = np.zeros((n_levels, h0, w0), dtype=np.int64)
    hs = (kp_y * kp_scale).astype(np.int64)  # truncation, like the kernel
    ws = (kp_x * kp_scale).astype(np.int64)
    valid = kp_s > 0
    # phase 1: scatter (last writer wins is irrelevant: one winner per cell/level)
    for i in np.flatnonzero(valid):
        s0[kp_level[i], hs[i], ws[i]] = kp_s[i]
    # phase 2: per-kp level argmax at its cell; winner writes sum & zero-count
    nms_score = np.zeros((h0, w0), dtype=np.int64)
    nms_level = np.zeros((h0, w0), dtype=np.int64)
    writes = []
    for i in np.flatnonzero(valid):
        col = s0[:, hs[i], ws[i]]
        max_level = int(np.argmax(col)) if col.max() > 0 else 0
        if int(kp_level[i]) == max_level:
            writes.append((hs[i], ws[i], int(col.sum()), int((col == 0).sum())))
    # (all phase-2 threads read s0 before any zeroing matters: per-cell columns
    # are zeroed only at slots that were read by kps of that same cell; the
    # kernel zeroes s0[level][h][w] after reading, but every reader of a cell
    # reads the full column first — emulate by applying writes after all reads)
    for h, w, ssum, zc in writes:
        nms_score[h, w] = ssum
        nms_level[h, w] = zc
    # phase 3: 3x3 cross-scale suppression on score*zerocount products
    out = kp_s.copy()
    for i in np.flatnonzero(valid):
        h, w = hs[i], ws[i]
        p = nms_score[h, w] * nms_level[h, w]
        ok = True
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if p < nms_score[h + dy, w + dx] * nms_level[h + dy, w + dx]:
                    ok = False
        if not ok:
            out[i] = 0
    return out


def ic_angle(img: np.ndarray, kp_x: int, kp_y: int) -> float:
    """Intensity centroid angle in radians (orb_FAST_orientation.cu:17-62)."""
    umax = umax_table()
    im = img.astype(np.int64)
    hp = HALF_PATCH_SIZE
    m01 = 0
    m10 = 0
    for u in range(-hp, hp + 1):
        m10 += u * im[kp_y, kp_x + u]
    for v in range(1, hp + 1):
        v_sum = 0
        d = int(umax[v])
        for u in range(-d, d + 1):
            vp = im[kp_y + v, kp_x + u]
            vm = im[kp_y - v, kp_x + u]
            v_sum += vp - vm
            m10 += u * (vp + vm)
        m01 += v * v_sum
    return float(np.arctan2(np.float32(m01), np.float32(m10)))


def gaussian_blur(img: np.ndarray) -> np.ndarray:
    """7x7 sigma=10 blur, uint8 truncation, borders left as original pixels
    (orb_gaussian.cu:21-110: only pixels with full 7x7 support are written)."""
    H, W = img.shape
    wts = gaussian_weights()
    out = img.copy()
    src = img.astype(np.float32)
    for h in range(3, H - 3):
        for w in range(3, W - 3):
            acc = 0.0
            for j in range(-3, 4):
                for k in range(-3, 4):
                    acc += wts[j + 3, k + 3] * src[h + j, w + k]
            out[h, w] = np.uint8(np.float32(acc))
    return out


def orb_descriptor(img_blur: np.ndarray, kp_x: int, kp_y: int, angle: float) -> np.ndarray:
    """32-byte rBRIEF descriptor (orb_descriptor.cu:12-68)."""
    pat = orb_pattern()
    a = np.float32(np.cos(np.float32(angle)))
    b = np.float32(np.sin(np.float32(angle)))
    im = img_blur.astype(np.int32)

    def sample(p):
        px, py = int(p[0]), int(p[1])
        row = int(np.round(px * b + py * a))
        col = int(np.round(px * a - py * b))
        return im[kp_y + row, kp_x + col]

    desc = np.zeros(32, dtype=np.uint8)
    for byte in range(32):
        val = 0
        for i in range(8):
            t0 = sample(pat[byte * 16 + i * 2])
            t1 = sample(pat[byte * 16 + i * 2 + 1])
            val |= int(t0 < t1) << i
        desc[byte] = val
    return desc


def hamming_distance(d1: np.ndarray, d2: np.ndarray) -> int:
    """256-bit Hamming distance (orb_stereo_match.cu ORBGetDistanceStereoGPU)."""
    return int(np.unpackbits(np.bitwise_xor(d1, d2)).sum())
