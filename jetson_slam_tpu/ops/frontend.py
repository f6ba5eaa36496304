"""TPU-native ORB front-end (pyramid, FAST, NMS, orientation, blur, rBRIEF).

Re-design of the reference CUDA front-end (src/cuda/orb_gpu.cpp `extract`,
orb_pyramid.cu, orb_FAST_compute_score.cu, orb_FAST_apply_NMS_G.cu,
orb_FAST_apply_NMS_MS.cu, orb_FAST_orientation.cu, orb_gaussian.cu,
orb_descriptor.cu, orb_copy_output.cu) as ONE jitted XLA program:

- The pyramid resize is two small matmuls per level (separable bilinear
  weights), which ride the MXU instead of a gather.
- FAST + NMS are dense (H, W) vector ops; the per-tile NMS-G max becomes a
  reshape + argmax, so keypoints live in DENSE per-tile slots (1 slot/tile,
  score==0 -> empty).  The reference's CPU compaction step
  (orb_FAST_obtain_keypoints.cpp) disappears: downstream consumers carry a
  validity mask instead, which keeps every shape static for XLA.
- Orientation/descriptor gather fixed-size patches per slot (vmapped
  dynamic_slice) and reduce them with precomputed masks.

Keypoint slot layout matches the reference's SoA planes: x, y, response,
angle, octave, size at level-0 coordinates (orb_copy_output.cu:12-45).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .tables import BORDER_SKIP, FAST_RING, PyramidGeometry

DESC_PATCH_HALF = 19  # max |rint(rotated rBRIEF offset)| for pattern radius <= 13*sqrt(2)
DESC_PATCH = 2 * DESC_PATCH_HALF + 2  # 40: even size for friendlier layouts
IC_PATCH = 2 * tables.HALF_PATCH_SIZE + 1  # 31


def _resize_weights(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """Dense (out, in) separable bilinear weight matrix, float32.

    Matches orb_pyramid.cu:45-64: src coord = scale * dst, top-left aligned,
    neighbor clamped at the image edge.
    """
    W = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        ip = np.float32(np.float32(scale) * o)
        lo = int(np.floor(ip))
        hi = min(lo + 1, in_size - 1)
        w_lo = np.float32(lo + 1) - ip
        W[o, lo] += w_lo
        W[o, hi] += np.float32(1.0) - w_lo
    return W


def _band_matrix(n: int, kernel_1d: np.ndarray) -> np.ndarray:
    """(n, n) banded matrix applying a centered 1-D kernel with zero padding
    at the edges (matches conv SAME semantics used by gaussian_blur)."""
    k = len(kernel_1d)
    half = k // 2
    M = np.zeros((n, n), dtype=np.float64)
    for o in range(n):
        for j in range(k):
            i = o + j - half
            if 0 <= i < n:
                M[o, i] = kernel_1d[j]
    return M


def bilinear_resize(img_f32: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """out = wy @ img @ wx^T on the MXU, then uint8 truncation.

    Precision HIGHEST: TPU matmuls default to one bf16 pass, whose rounding
    of the bilinear weights flips the floor() on near-integer outputs —
    levels 1+ would differ from the CPU pyramid by +-1 grey and every
    downstream per-keypoint quantity with them.  The resize is ~1 GFLOP, so
    exact f32 costs nothing measurable."""
    with jax.default_matmul_precision("highest"):
        out = jnp.dot(wy, jnp.dot(img_f32, wx.T,
                                  preferred_element_type=jnp.float32),
                      preferred_element_type=jnp.float32)
    return jnp.floor(out).astype(jnp.uint8)


def fast_score_map(img_u8, lut, threshold: int, mask=None):
    """FAST-16 SAD score map (spec: orb_FAST_compute_score.cu:1412-1623).

    img_u8: (..., H, W) uint8 (leading dims batch).  Returns (..., H, W)
    int32 score map, zero outside the BORDER_SKIP ROI and wherever the
    segment test fails.
    """
    H, W = img_u8.shape[-2:]
    im = img_u8.astype(jnp.int32)
    v = im
    vt = v + threshold
    v_t = v - threshold

    ring = []
    for dy, dx in np.asarray(FAST_RING):
        ring.append(jnp.roll(im, (-int(dy), -int(dx)), axis=(-2, -1)))
    ring = jnp.stack(ring)  # (16, ..., H, W)

    # early-exit opposite-pair pruning: pairs (4,12) then (0,8)
    def within(r):
        return (r <= vt) & (r >= v_t)

    pruned = (within(ring[4]) & within(ring[12])) | (within(ring[0]) & within(ring[8]))

    shifts = (1 << jnp.arange(16, dtype=jnp.int32)).reshape((16,) + (1,) * im.ndim)
    bright_idx = jnp.sum(jnp.where(ring > vt[None], shifts, 0), axis=0)
    dark_idx = jnp.sum(jnp.where(ring < v_t[None], shifts, 0), axis=0)

    is_corner = (jnp.take(lut, bright_idx) | jnp.take(lut, dark_idx)).astype(jnp.bool_)
    sad = jnp.sum(jnp.abs(ring - v[None]), axis=0)

    score = jnp.where(is_corner & ~pruned, sad, 0)

    roi = jnp.zeros((H, W), dtype=jnp.bool_)
    roi = roi.at[BORDER_SKIP:H - BORDER_SKIP, BORDER_SKIP:W - BORDER_SKIP].set(True)
    score = jnp.where(roi, score, 0)
    if mask is not None:
        score = jnp.where(mask > 0, score, 0)
    return score


def nms_lg(score, tile_h: int, tile_w: int, fuse_nms_l: bool = True):
    """Fused NMS-L (3x3, >= neighbors) + NMS-G per-tile argmax.

    Spec: orb_FAST_apply_NMS_G.cu:1256-1384.  score: (..., H, W); returns
    dense per-tile (x, y, s) int32 arrays of shape (..., n_tiles) (row-major
    tiles).  Tie-break is first-in-row-major order (the reference's
    thread-scan order differs only on exact integer score ties).
    """
    H, W = score.shape[-2:]
    batch = score.shape[:-2]
    if fuse_nms_l:
        neigh = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh.append(jnp.roll(score, (-dy, -dx), axis=(-2, -1)))
        nmax = jnp.max(jnp.stack(neigh), axis=0)
        score = jnp.where(score >= nmax, score, 0)

    n_th = (H - 1) // tile_h + 1
    n_tw = (W - 1) // tile_w + 1
    Hp, Wp = n_th * tile_h, n_tw * tile_w
    padded = jnp.zeros(batch + (Hp, Wp), dtype=score.dtype).at[..., :H, :W].set(score)
    tiles = padded.reshape(batch + (n_th, tile_h, n_tw, tile_w))
    tiles = jnp.swapaxes(tiles, -3, -2)  # (..., n_th, n_tw, tile_h, tile_w)
    flat = tiles.reshape(batch + (n_th * n_tw, tile_h * tile_w))
    idx = jnp.argmax(flat, axis=-1)
    s = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    ty = jnp.arange(n_th * n_tw, dtype=jnp.int32) // n_tw
    tx = jnp.arange(n_th * n_tw, dtype=jnp.int32) % n_tw
    y = ty * tile_h + (idx // tile_w).astype(jnp.int32)
    x = tx * tile_w + (idx % tile_w).astype(jnp.int32)
    empty = s <= 0
    zero = jnp.zeros_like(s)
    return (jnp.where(empty, zero, x), jnp.where(empty, zero, y),
            jnp.where(empty, zero, s))


def nms_ms(kp_x, kp_y, kp_s, kp_level, kp_scale, n_levels: int, h0: int, w0: int):
    """Multi-scale NMS over concatenated per-tile slots.

    Spec: orb_FAST_apply_NMS_MS.cu:389-467 (see tests/oracles/frontend.py
    for the scalar spec).  Deterministic variant of the kernel's racy
    read/zero ordering: all phase-2 column reads happen before any zeroing.
    """
    valid = kp_s > 0
    hs = (kp_y.astype(jnp.float32) * kp_scale).astype(jnp.int32)
    ws = (kp_x.astype(jnp.float32) * kp_scale).astype(jnp.int32)

    # phase 1: scatter winners into the (L, H0, W0) level-0 grid
    flat_idx = (kp_level * h0 + hs) * w0 + ws
    dump = n_levels * h0 * w0  # out-of-range slot for invalid entries
    flat_idx = jnp.where(valid, flat_idx, dump)
    s0 = jnp.zeros(n_levels * h0 * w0 + 1, dtype=jnp.int32).at[flat_idx].set(
        jnp.where(valid, kp_s, 0))

    # phase 2: per-slot column over levels at its cell
    cell = hs * w0 + ws
    cols = s0[:-1].reshape(n_levels, h0 * w0)
    col = jnp.where(valid[None, :], jnp.take(cols, cell, axis=1), 0)
    max_level = jnp.argmax(col, axis=0).astype(jnp.int32)
    col_sum = jnp.sum(col, axis=0)
    zero_count = jnp.sum(col == 0, axis=0).astype(jnp.int32)
    winner = valid & (kp_level == max_level)

    cell_dump = h0 * w0
    w_idx = jnp.where(winner, cell, cell_dump)
    nms_score = jnp.zeros(h0 * w0 + 1, dtype=jnp.int32).at[w_idx].set(
        jnp.where(winner, col_sum, 0))
    nms_level = jnp.zeros(h0 * w0 + 1, dtype=jnp.int32).at[w_idx].set(
        jnp.where(winner, zero_count, 0))

    # phase 3: 3x3 cross-scale suppression on (sum * zero_count) products
    prod = (nms_score[:-1] * nms_level[:-1]).reshape(h0, w0)
    my_p = jnp.take(prod.reshape(-1), cell)
    ok = jnp.ones_like(valid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nbr = jnp.take(prod.reshape(-1), (hs + dy) * w0 + (ws + dx))
            ok = ok & (my_p >= nbr)
    return jnp.where(valid & ~ok, 0, kp_s)


def subpixel_offsets(score, kp_x, kp_y):
    """Per-keypoint (dx, dy) in [-0.5, 0.5] from a 3x3 parabola fit on the
    RAW (pre-NMS) SAD score map.

    The reference emits integer keypoint coordinates (orb_copy_output.cu:35);
    sub-pixel localization is a deliberate improvement here: per-frame VO
    rotation noise scales directly with keypoint sigma, and the quadratic fit
    costs three gathers per slot on TPU.  Analogous in spirit to the
    reference's stereo-disparity parabola (orb_stereo_match.cu:1092-1110).
    """
    H, W = score.shape
    flat = score.reshape(-1).astype(jnp.float32)

    def at(dy, dx):
        yy = jnp.clip(kp_y + dy, 0, H - 1)
        xx = jnp.clip(kp_x + dx, 0, W - 1)
        return jnp.take(flat, yy * W + xx)

    s0 = at(0, 0)
    sl, sr = at(0, -1), at(0, 1)
    su, sd = at(-1, 0), at(1, 0)

    def fit(sm, sp):
        den = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(den) > 1e-6, 0.5 * (sm - sp) / den, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    return fit(sl, sr), fit(su, sd)


def ic_angles(img_u8, kp_x, kp_y):
    """Batched intensity-centroid angles, radians.

    Spec: orb_FAST_orientation.cu:17-62.  Moments are exact int32 sums; the
    final atan2 is float32 like the CUDA atan2f.
    """
    wu, wv = tables.ic_angle_masks()
    wu = jnp.asarray(wu.astype(np.int32))
    wv = jnp.asarray(wv.astype(np.int32))
    hp = tables.HALF_PATCH_SIZE
    im = img_u8.astype(jnp.int32)

    def one(x, y):
        patch = jax.lax.dynamic_slice(im, (y - hp, x - hp), (IC_PATCH, IC_PATCH))
        m10 = jnp.sum(patch * wu)
        m01 = jnp.sum(patch * wv)
        return jnp.arctan2(m01.astype(jnp.float32), m10.astype(jnp.float32))

    return jax.vmap(one)(kp_x, kp_y)


def gaussian_blur(img_u8, weights):
    """7x7 blur; border pixels (< 3 from edge) keep original values.

    Spec: orb_gaussian.cu:21-110 (uint8 truncation on store).
    """
    H, W = img_u8.shape
    src = img_u8.astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        src[None, None], jnp.asarray(weights)[None, None],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    out = jnp.floor(out).astype(jnp.uint8)
    interior = jnp.zeros((H, W), dtype=jnp.bool_).at[3:H - 3, 3:W - 3].set(True)
    return jnp.where(interior, out, img_u8)


def orb_descriptors(img_blur_u8, kp_x, kp_y, angles):
    """Batched 32-byte rBRIEF (spec: orb_descriptor.cu:12-68).

    Per keypoint: gather a 40x40 patch, sample 512 rotated pattern points via
    take_along_axis, compare pairs, pack bits LSB-first per byte.
    """
    pat = tables.orb_pattern().astype(np.float32)  # (512, 2) x,y
    px = jnp.asarray(pat[:, 0])
    py = jnp.asarray(pat[:, 1])

    a = jnp.cos(angles)  # (K,)
    b = jnp.sin(angles)
    # rotated integer offsets, rint = round-half-even like CUDA rintf
    rows = jnp.round(px[None, :] * b[:, None] + py[None, :] * a[:, None]).astype(jnp.int32)
    cols = jnp.round(px[None, :] * a[:, None] - py[None, :] * b[:, None]).astype(jnp.int32)

    hp = DESC_PATCH_HALF
    im = img_blur_u8

    def patch_of(x, y):
        return jax.lax.dynamic_slice(im, (y - hp, x - hp), (DESC_PATCH, DESC_PATCH))

    patches = jax.vmap(patch_of)(kp_x, kp_y).reshape(kp_x.shape[0], -1)  # (K, 1600)
    flat = (rows + hp) * DESC_PATCH + (cols + hp)  # (K, 512)
    samples = jnp.take_along_axis(patches, flat, axis=1).astype(jnp.int32)  # (K, 512)
    t0 = samples[:, 0::2]
    t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint8).reshape(kp_x.shape[0], 32, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :].astype(jnp.uint32)
    return jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)


@dataclasses.dataclass
class FrontendResult:
    """Dense keypoint SoA at level-0 coordinates (one slot per NMS-G tile)."""
    xs: jnp.ndarray        # (K,) float32, level-0 x (reference truncates: int(x*scale))
    ys: jnp.ndarray        # (K,) float32
    response: jnp.ndarray  # (K,) int32 SAD score
    angle: jnp.ndarray     # (K,) float32 degrees
    octave: jnp.ndarray    # (K,) int32
    size: jnp.ndarray      # (K,) float32 (int(31*scale))
    valid: jnp.ndarray     # (K,) bool
    desc: jnp.ndarray      # (K, 32) uint8
    # level-local integer coords (used by the stereo window correlation)
    lx: jnp.ndarray        # (K,) int32
    ly: jnp.ndarray        # (K,) int32

jax.tree_util.register_pytree_node(
    FrontendResult,
    lambda r: ((r.xs, r.ys, r.response, r.angle, r.octave, r.size, r.valid, r.desc, r.lx, r.ly), None),
    lambda _, c: FrontendResult(*c),
)


class OrbFrontend:
    """Orchestrates the per-level pipeline as a single jitted program.

    TPU analog of ORB_GPU (include/cuda/orb_gpu.hpp): the per-level CUDA
    streams become one fused XLA program; the pyramid-stacked outputs are
    dense slot arrays padded to a multiple of 128 lanes.
    """

    def __init__(self, height, width, n_levels=8, scale_factor=1.2,
                 fast_n_min=9, fast_n_max=16, threshold=20,
                 tile_h=30, tile_w=30, fixed_multi_scale_tile_size=False,
                 apply_nms_ms=False, mask=None, quantize_level0_coords=False,
                 subpixel=True, use_pallas="auto", use_pallas_desc="auto",
                 use_pallas_stereo="auto"):
        # quantize_level0_coords=True reproduces the reference's int cast in
        # copy_output (orb_copy_output.cu:35: keypoints_x_op is int*), which
        # quantizes level-L keypoints by scale^L pixels at level 0.  Off by
        # default: float coords are strictly more accurate and cost nothing.
        self.quantize_level0_coords = quantize_level0_coords
        # subpixel: 3x3 score-parabola keypoint refinement (improvement over
        # the reference's integer keypoints; see subpixel_offsets)
        self.subpixel = subpixel and not quantize_level0_coords
        self.geom = tables.pyramid_geometry(
            height, width, n_levels, scale_factor, tile_h, tile_w,
            fixed_multi_scale_tile_size)
        g = self.geom
        self.threshold = int(threshold)
        self.fast_n_min = int(fast_n_min)
        self.fast_n_max = int(fast_n_max)
        self.apply_nms_ms = bool(apply_nms_ms) and n_levels > 1
        # Pallas fused FAST+NMS-L kernel (ops/pallas_frontend.py): the
        # arithmetic segment test is bit-equivalent to the LUT for EVERY
        # (n_min, n_max) and masks ride as a second DMA'd canvas, so masked
        # rigs (stereo_rig_realsense.yaml) keep the fast path.
        # use_pallas: "auto" -> on real TPU only; True -> always (interpreted
        # off-TPU, for tests); False -> XLA path.
        if use_pallas == "auto":
            self._use_pallas = jax.default_backend() == "tpu"
        else:
            self._use_pallas = bool(use_pallas)
        # fused blur+IC+rBRIEF kernel (ops/pallas_descriptor.py): no config
        # constraints; "auto" -> real TPU only (interpreted execution is too
        # slow for CPU test suites — a dedicated unit test covers interpret)
        if use_pallas_desc == "auto":
            self._use_pallas_desc = jax.default_backend() == "tpu"
        else:
            self._use_pallas_desc = bool(use_pallas_desc)
        # Pallas stereo window-correlation kernel (ops/pallas_stereo.py):
        # costs are bit-identical to the XLA band path (integer arithmetic)
        if use_pallas_stereo == "auto":
            self._use_pallas_stereo = jax.default_backend() == "tpu"
        else:
            self._use_pallas_stereo = bool(use_pallas_stereo)
        self._max_tiles_w = int(max(g.n_tiles_w))
        self._bands_matmul = jax.default_backend() == "tpu"
        self._pallas_interpret = jax.default_backend() != "tpu"
        self.lut = jnp.asarray(tables.fast_lut(fast_n_min, fast_n_max).astype(np.int32))
        self.gauss = jnp.asarray(tables.gaussian_weights())
        self.n_slots = g.total_slots
        self.n_slots_padded = -(-g.total_slots // 128) * 128

        # resize weight matrices per level (static)
        self._wy = [None]
        self._wx = [None]
        for i in range(1, g.n_levels):
            self._wy.append(jnp.asarray(_resize_weights(g.heights[0], g.heights[i], g.scales[i])))
            self._wx.append(jnp.asarray(_resize_weights(g.widths[0], g.widths[i], g.scales[i])))

        # per-slot static level / scale tables
        lvl = np.zeros(self.n_slots_padded, dtype=np.int32)
        scl = np.ones(self.n_slots_padded, dtype=np.float32)
        for i in range(g.n_levels):
            o = g.level_offsets[i]
            n = g.n_tiles_h[i] * g.n_tiles_w[i]
            lvl[o:o + n] = i
            scl[o:o + n] = np.float32(g.scales[i])
        self.slot_level = jnp.asarray(lvl)
        self.slot_scale = jnp.asarray(scl)

        # per-level masks (resized nearest + binarized, reference orb_gpu.cpp:64-91)
        self.masks = None
        if mask is not None:
            self.masks = []
            m0 = np.asarray(mask)
            for i in range(g.n_levels):
                hi, wi = g.heights[i], g.widths[i]
                ys = (np.arange(hi) * (g.heights[0] / hi)).astype(np.int64).clip(0, g.heights[0] - 1)
                xs = (np.arange(wi) * (g.widths[0] / wi)).astype(np.int64).clip(0, g.widths[0] - 1)
                mi = (m0[ys][:, xs] > 10).astype(np.int32)
                self.masks.append(jnp.asarray(mi))

        # ---- static tables for the fused batched path ----
        H0, W0, L = g.heights[0], g.widths[0], g.n_levels
        self._h0w0 = (H0, W0)
        # per-slot flat base offset into a flattened (L, H0, W0) stack
        self._lvl_base = self.slot_level * np.int32(H0 * W0)
        wu, wv = tables.ic_angle_masks()
        # moment masks as a (31, 31, 2) tensor for the patch-slice moment
        # einsum (see _extract_batch_core)
        self._wuv2d = jnp.asarray(np.stack([wu, wv], -1).astype(np.float32))
        # tile-anchored band geometry (ops/bands.py): every per-keypoint
        # window sits inside its slot's static band, so sampling becomes
        # one-hot MXU matmuls instead of gathers
        from .bands import band_shape, slot_band_origins
        self.band_hw = band_shape(g.tile_h, g.tile_w)
        band_y0, band_x0 = slot_band_origins(g)
        self._band_y0 = jnp.asarray(band_y0)
        self._band_x0 = jnp.asarray(band_x0)
        # per-slot static meta for the Pallas descriptor kernel:
        # [band_y0, band_x0, level_h, level_w, 0, 0]
        smeta = np.zeros((self.n_slots_padded, 6), np.int32)
        smeta[:, 0] = band_y0
        smeta[:, 1] = band_x0
        smeta[:, 2] = np.asarray(g.heights, np.int32)[lvl]
        smeta[:, 3] = np.asarray(g.widths, np.int32)[lvl]
        # band-local blur support: band matrices sized to the band, plus the
        # static per-slot interior mask (pixels >= 3 from the TRUE level
        # border keep their raw value, orb_gaussian.cu:21-110).  Image coords
        # of band pixel (r, c) in slot k: (band_y0[k] - MARGIN + r, ...)
        from .bands import MARGIN as _BM
        bhh, bww = self.band_hw
        g1b = np.exp(-(np.arange(-3, 4, dtype=np.float64) ** 2) / 200.0)
        g1b = g1b / g1b.sum()
        self._band_gy = jnp.asarray(_band_matrix(bhh, g1b).astype(np.float32))
        self._band_gx = jnp.asarray(_band_matrix(bww, g1b).astype(np.float32))
        rows_img = band_y0[:, None] - _BM + np.arange(bhh)[None, :]
        cols_img = band_x0[:, None] - _BM + np.arange(bww)[None, :]
        rows_ok = (rows_img >= 3) & (rows_img < smeta[:, 2:3] - 3)
        cols_ok = (cols_img >= 3) & (cols_img < smeta[:, 3:4] - 3)
        self._band_interior = jnp.asarray(
            rows_ok[:, :, None] & cols_ok[:, None, :])
        # rBRIEF pattern as device vectors
        pat = tables.orb_pattern().astype(np.float32)
        self._pat_x = jnp.asarray(pat[:, 0])
        self._pat_y = jnp.asarray(pat[:, 1])
        # separable gaussian: band matrices ride the MXU (7x7 sigma=10 is an
        # outer product, reference orb_gpu.cpp:196-220)
        g1 = np.exp(-(np.arange(-3, 4, dtype=np.float64) ** 2) / 200.0)
        g1 = g1 / g1.sum()
        self._gy = jnp.asarray(_band_matrix(H0, g1).astype(np.float32))
        self._gx = jnp.asarray(_band_matrix(W0, g1).astype(np.float32))
        # blur interior mask per level (pixels < 3 from the true level border
        # keep their original value, orb_gaussian.cu:21-110)
        interior = np.zeros((L, H0, W0), dtype=bool)
        for i in range(L):
            hi, wi = g.heights[i], g.widths[i]
            interior[i, 3:hi - 3, 3:wi - 3] = True
        self._blur_interior = jnp.asarray(interior)
        # subpixel parabola: flat offsets of (center, left, right, up, down)
        self._rel_sub = jnp.asarray(np.array([0, -1, 1, -W0, W0], np.int32))

        # All device tables ride as EXPLICIT pytree arguments of the jitted
        # entry points (module-level, self static).  Capturing them as jit
        # closure constants triggers a hoisted-constant arity bug when
        # multiple instances share compiled executables.
        self._tables = dict(
            lut=self.lut,
            wy=tuple(self._wy[1:]),
            wx=tuple(self._wx[1:]),
            slot_level=self.slot_level,
            slot_scale=self.slot_scale,
            lvl_base=self._lvl_base,
            wuv2d=self._wuv2d,
            pat_x=self._pat_x,
            pat_y=self._pat_y,
            gy=self._gy,
            gx=self._gx,
            blur_interior=self._blur_interior,
            rel_sub=self._rel_sub,
            masks=tuple(self.masks) if self.masks is not None else (),
            widths=jnp.asarray(np.asarray(g.widths, np.int32)),
            scales=jnp.asarray(np.asarray(g.scales, np.float32)),
            inv_scales=jnp.asarray(np.asarray(g.inv_scales, np.float32)),
            band_y0=self._band_y0,
            band_x0=self._band_x0,
            slot_meta=jnp.asarray(smeta),
            band_gy=self._band_gy,
            band_gx=self._band_gx,
            band_interior=self._band_interior,
            lvl_tile_h=jnp.asarray(np.asarray(g.tile_h, np.int32)),
            lvl_tile_w=jnp.asarray(np.asarray(g.tile_w, np.int32)),
            lvl_ntw=jnp.asarray(np.asarray(g.n_tiles_w, np.int32)),
            lvl_off=jnp.asarray(np.asarray(g.level_offsets, np.int32)),
        )
        # per-level FAST ROI rectangles for the pallas kernel (half-open)
        roi_l = np.array(
            [[BORDER_SKIP, g.heights[i] - BORDER_SKIP,
              BORDER_SKIP, g.widths[i] - BORDER_SKIP]
             for i in range(g.n_levels)], np.int32)
        self._tables["roi_l"] = jnp.asarray(roi_l)
        # constant one-hot band-extraction selectors (TPU matmul path)
        from .bands import band_col_selector, band_row_selector
        bhh2, bww2 = self.band_hw
        self._tables["band_rsel"] = tuple(
            jnp.asarray(band_row_selector(
                g.heights[i], g.n_tiles_h[i], g.tile_h[i], bhh2
            ).astype(np.float32), dtype=jnp.bfloat16)
            for i in range(g.n_levels))
        self._tables["band_csel"] = tuple(
            jnp.asarray(band_col_selector(
                g.widths[i], g.n_tiles_w[i], g.tile_w[i], bww2
            ).astype(np.float32), dtype=jnp.bfloat16)
            for i in range(g.n_levels))
        # 128-lane variant: right-eye stereo bands come out pre-padded for
        # the Pallas kernel's aligned manual DMA
        self._tables["band_csel128"] = tuple(
            jnp.asarray(band_col_selector(
                g.widths[i], g.n_tiles_w[i], g.tile_w[i], 128
            ).astype(np.float32), dtype=jnp.bfloat16)
            for i in range(g.n_levels))

    # ------------------------------------------------------------------
    def compute_pyramid(self, img_u8):
        g = self.geom
        levels = [img_u8]
        f0 = img_u8.astype(jnp.float32)
        for i in range(1, g.n_levels):
            levels.append(bilinear_resize(f0, self._wy[i], self._wx[i]))
        return levels

    def _pyramid_batch(self, T, imgs_u8):
        """imgs_u8: (B, H0, W0) uint8 -> list of (B, Hi, Wi) uint8 levels."""
        g = self.geom
        levels = [imgs_u8]
        f0 = imgs_u8.astype(jnp.float32)
        # exact f32 resize (see bilinear_resize): keeps the TPU pyramid
        # bit-identical to the CPU one
        with jax.default_matmul_precision("highest"):
            for i in range(1, g.n_levels):
                # same contraction order as bilinear_resize: (img @ wx.T), wy @
                t = jnp.einsum("bhw,xw->bhx", f0, T["wx"][i - 1],
                               preferred_element_type=jnp.float32)
                out = jnp.einsum("oh,bhx->box", T["wy"][i - 1], t,
                                 preferred_element_type=jnp.float32)
                levels.append(jnp.floor(out).astype(jnp.uint8))
        return levels

    def _take_b(self, flat_b, idx_b):
        """Batched flat gather: flat_b (B, N), idx_b (B, ...) -> (B, ...)."""
        return jax.vmap(lambda f, i: jnp.take(f, i, mode="clip"))(flat_b, idx_b)

    def _subpixel_scores(self, T, score_stack, kp_x, kp_y):
        """3x3-cross raw neighbor scores (sl, sr, su, sd) per slot, gather-free.

        The former (B, Kp, 5) flat gather cost ~3 ms/32-eye batch (TPU
        gathers move ~1 element/cycle).  Instead: shift the whole score
        stack by one pixel in each direction (pad+slice copies), retile
        every shifted map with the SAME tile partition the NMS-G argmax
        used, and pull each slot's value with an in-tile one-hot
        mask-reduce — exact int32 arithmetic, pure copies + VPU reduces.
        The FAST ROI keeps every real keypoint >= 3 px inside its level, so
        a zero-filled shifted slice agrees with the old flat gather on all
        valid slots.  score_stack: (B, L, H0, W0) int32 raw scores.
        """
        g = self.geom
        B = score_stack.shape[0]
        W0 = score_stack.shape[-1]
        H0 = score_stack.shape[-2]
        # FAST scores are < 4096 -> int16 halves the shift/retile traffic;
        # the center score is NOT re-fetched (the NMS-G per-tile max IS the
        # raw score at the keypoint — the caller passes kp_s as s0)
        s16 = score_stack.astype(jnp.int16)
        shl = jnp.pad(s16, ((0, 0), (0, 0), (0, 0), (1, 0)))[..., :, :W0]
        shr = jnp.pad(s16, ((0, 0), (0, 0), (0, 0), (0, 1)))[..., :, 1:]
        shu = jnp.pad(s16, ((0, 0), (0, 0), (1, 0), (0, 0)))[..., :H0, :]
        shd = jnp.pad(s16, ((0, 0), (0, 0), (0, 1), (0, 0)))[..., 1:, :]
        sh4 = jnp.stack([shl, shr, shu, shd], 0)          # (4, B, L, H0, W0)

        outs = [[] for _ in range(4)]
        for i in range(g.n_levels):
            h, w = g.heights[i], g.widths[i]
            th, tw = g.tile_h[i], g.tile_w[i]
            nth, ntw = g.n_tiles_h[i], g.n_tiles_w[i]
            hp, wp = nth * th, ntw * tw
            padded = jnp.zeros((4, B, hp, wp), jnp.int16).at[
                :, :, :h, :w].set(sh4[:, :, i, :h, :w])
            t = padded.reshape(4, B, nth, th, ntw, tw).swapaxes(3, 4)
            tf = t.reshape(4, B, nth * ntw, th * tw)
            o = g.level_offsets[i]
            k_l = nth * ntw
            it = ((kp_y[:, o:o + k_l] - T["band_y0"][None, o:o + k_l]) * tw
                  + (kp_x[:, o:o + k_l] - T["band_x0"][None, o:o + k_l]))
            iot = jnp.arange(th * tw, dtype=jnp.int32)
            sel = (iot[None, None, :] == it[..., None])[None]  # (1,B,k,thw)
            picked = jnp.sum(jnp.where(sel, tf.astype(jnp.int32), 0),
                             axis=-1)                     # (4, B, k_l)
            for s in range(4):
                outs[s].append(picked[s])
        pad = self.n_slots_padded - self.n_slots
        zpad = jnp.zeros((B, pad), jnp.int32)
        return tuple(jnp.concatenate(v + [zpad], axis=1).astype(jnp.float32)
                     for v in outs)

    def _extract_bands(self, levels):
        """Per-level tile-anchored bands, concatenated in slot order and
        padded to (B, n_slots_padded, BH, BW).  levels: list of (B, Hi, Wi).

        On TPU the extraction rides two constant one-hot matmuls per level
        (ops/bands.extract_tile_bands_matmul, bit-equal, measured ~1.7x
        faster than the shifted-slice stack whose copies are
        lane-misaligned); elsewhere the portable slice-stack path runs."""
        from .bands import extract_tile_bands, extract_tile_bands_matmul
        g = self.geom
        bh, bw = self.band_hw
        parts = []
        for i in range(g.n_levels):
            if self._bands_matmul:
                parts.append(extract_tile_bands_matmul(
                    levels[i], self._tables["band_rsel"][i],
                    self._tables["band_csel"][i],
                    g.n_tiles_h[i], g.n_tiles_w[i], bh, bw))
            else:
                parts.append(extract_tile_bands(
                    levels[i], g.tile_h[i], g.tile_w[i],
                    g.n_tiles_h[i], g.n_tiles_w[i], bh, bw))
        bands = jnp.concatenate(parts, axis=1)
        pad = self.n_slots_padded - self.n_slots
        if pad:
            bands = jnp.pad(bands, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return bands

    def _extract_batch_core(self, T, imgs_u8):
        """The fused front-end over a batch of images (both stereo eyes ride
        one program).  imgs_u8: (B, H0, W0) uint8.

        Returns (FrontendResult with leading batch dim, raw pyramid stack
        (B, L, H0, W0) uint8 zero-padded to level-0 size).

        TPU re-design of ORB_GPU::extract (orb_gpu.cpp:489-841): the per-level
        CUDA streams become one XLA program; all per-keypoint stages
        (orientation moments, rBRIEF sampling, subpixel fit) are single flat
        gathers from padded pyramid stacks + MXU matmuls instead of per-level
        kernels, and the Gaussian blur is a pair of separable band-matrix
        matmuls on the MXU instead of a 7x7 convolution.
        """
        g = self.geom
        B = imgs_u8.shape[0]
        H0, W0 = self._h0w0
        L = g.n_levels
        Kp = self.n_slots_padded

        pyr = self._pyramid_batch(T, imgs_u8)

        # raw pyramid stack (zero-padded canvases) for moment/stereo gathers
        raw_stack = jnp.zeros((B, L, H0, W0), jnp.uint8)
        for i in range(L):
            raw_stack = raw_stack.at[:, i, :g.heights[i], :g.widths[i]].set(pyr[i])

        # FAST score + NMS
        xs_l, ys_l, s_l = [], [], []
        if self._use_pallas:
            # fused pallas kernel over all B*L canvases in ONE launch
            from .pallas_frontend import fast_score_nms_pallas
            roi = jnp.tile(T["roi_l"], (B, 1))
            mask_stack = None
            if self.masks is not None:
                ms = jnp.zeros((L, H0, W0), jnp.uint8)
                for i in range(L):
                    ms = ms.at[i, :g.heights[i], :g.widths[i]].set(
                        T["masks"][i].astype(jnp.uint8))
                mask_stack = jnp.tile(ms, (B, 1, 1))
            raw_s, nms_s = fast_score_nms_pallas(
                raw_stack.reshape(B * L, H0, W0), roi, self.threshold,
                self.fast_n_min, self.fast_n_max, mask_u8=mask_stack,
                interpret=self._pallas_interpret)
            score_stack = raw_s.reshape(B, L, H0, W0)
            nms_stack = nms_s.reshape(B, L, H0, W0)
            for i in range(L):
                x, y, s = nms_lg(nms_stack[:, i, :g.heights[i], :g.widths[i]],
                                 g.tile_h[i], g.tile_w[i], fuse_nms_l=False)
                xs_l.append(x); ys_l.append(y); s_l.append(s)
        else:
            # XLA path, per level (batched over eyes)
            score_stack = jnp.zeros((B, L, H0, W0), jnp.int32)
            for i in range(L):
                mask_i = T["masks"][i] if self.masks is not None else None
                score = fast_score_map(pyr[i], T["lut"], self.threshold, mask_i)
                score_stack = score_stack.at[:, i, :g.heights[i], :g.widths[i]].set(score)
                x, y, s = nms_lg(score, g.tile_h[i], g.tile_w[i], fuse_nms_l=True)
                xs_l.append(x); ys_l.append(y); s_l.append(s)

        pad = Kp - self.n_slots
        zpad = jnp.zeros((B, pad), jnp.int32)
        kp_x = jnp.concatenate(xs_l + [zpad], axis=1)  # (B, Kp)
        kp_y = jnp.concatenate(ys_l + [zpad], axis=1)
        kp_s = jnp.concatenate(s_l + [zpad], axis=1)

        if self.apply_nms_ms:
            kp_s = jax.vmap(
                lambda x, y, s: nms_ms(x, y, s, T["slot_level"], T["slot_scale"],
                                       L, H0, W0))(kp_x, kp_y, kp_s)

        # subpixel 3x3 parabola on the raw score stack; the center score is
        # kp_s itself (the NMS-G argmax value), only the 4 neighbors are
        # fetched
        if self.subpixel:
            s0 = kp_s.astype(jnp.float32)
            sl, sr, su, sd = self._subpixel_scores(
                T, score_stack, kp_x, kp_y)

            def fit(sm, sp):
                den = sm - 2.0 * s0 + sp
                off = jnp.where(jnp.abs(den) > 1e-6, 0.5 * (sm - sp) / den, 0.0)
                return jnp.clip(off, -0.5, 0.5)

            sub_dx, sub_dy = fit(sl, sr), fit(su, sd)

        # ---- tile-anchored bands (ops/bands.py): all remaining per-keypoint
        # sampling (IC moments, rBRIEF, and the stereo correlation downstream)
        # rides one-hot MXU matmuls over these bands — zero gathers.  The
        # former flat-gather rBRIEF (~18 ms/frame) and vmapped-dynamic-slice
        # IC patches (~4 ms/frame) were the two dominant costs of round 1.
        bands_u8 = self._extract_bands(pyr)                   # (B, Kp, bh, bw)
        oy = kp_y - T["band_y0"][None, :]                     # kp - tile origin
        ox = kp_x - T["band_x0"][None, :]

        if self._use_pallas_desc:
            # fused Pallas kernel: blur + IC moments + rBRIEF entirely in
            # VMEM (ops/pallas_descriptor.py); the canvas blur, the second
            # band extraction and the HBM one-hot selectors all disappear
            from .pallas_descriptor import orb_descriptors_pallas
            bh, bw = self.band_hw
            meta = jnp.concatenate([
                oy[..., None], ox[..., None],
                jnp.broadcast_to(T["slot_meta"][None], (B, Kp, 6)),
            ], axis=-1).astype(jnp.int32)
            desc_i, mom = orb_descriptors_pallas(
                bands_u8.reshape(B * Kp, bh, bw),
                meta.reshape(B * Kp, 8), interpret=self._pallas_interpret)
            mom = mom.reshape(B, Kp, 8)
            ang = jnp.arctan2(mom[..., 1], mom[..., 0])       # (B, Kp)
            desc = desc_i.reshape(B, Kp, 32).astype(jnp.uint8)
        else:
            # XLA band-local path: blur, IC moments and rBRIEF all operate
            # DIRECTLY on the (B, Kp, bh, bw) bands — no canvas blur, no
            # second band extraction, no intermediate 40x40 windows.  The
            # band margin (22 = 19 rBRIEF reach + 3 blur support) guarantees
            # every sampled position has real image pixels under its blur
            # window (see ops/bands.MARGIN).
            from .bands import MARGIN
            bh, bw = self.band_hw
            bands_raw = bands_u8.astype(jnp.bfloat16)

            # separable 7-tap blur of the bands on the MXU (band matrices),
            # f32 exact; border-preserve vs the TRUE level border via the
            # static per-slot interior table
            bf32 = bands_u8.astype(jnp.float32)
            tb = jnp.einsum("bkhw,xw->bkhx", bf32, T["band_gx"],
                            preferred_element_type=jnp.float32)
            blb = jnp.einsum("oh,bkhx->bkox", T["band_gy"], tb,
                             preferred_element_type=jnp.float32)
            bands_blur = jnp.where(T["band_interior"][None],
                                   jnp.floor(blb), bf32).astype(jnp.bfloat16)

            # intensity-centroid orientation: 31x31 one-hot window matmuls
            # over the raw bands (integer-exact: one-hot selection, f32
            # accumulate, every term < 2^24)
            iota_bh = jnp.arange(bh, dtype=jnp.int32)
            iota_bw = jnp.arange(bw, dtype=jnp.int32)
            u31 = jnp.arange(IC_PATCH, dtype=jnp.int32)
            r31 = (oy + (MARGIN - tables.HALF_PATCH_SIZE))[..., None] + u31
            c31 = (ox + (MARGIN - tables.HALF_PATCH_SIZE))[..., None] + u31
            R31 = (iota_bh == r31[..., None]).astype(jnp.bfloat16)  # (B,Kp,31,bh)
            C31 = (iota_bw == c31[..., None]).astype(jnp.bfloat16)  # (B,Kp,31,bw)
            strips = jnp.einsum("bkua,bkaw->bkuw", R31, bands_raw,
                                preferred_element_type=jnp.float32)
            patch31 = jnp.einsum("bkuw,bkvw->bkuv",
                                 strips.astype(jnp.bfloat16), C31,
                                 preferred_element_type=jnp.float32)
            m = jnp.einsum("bkuv,uvc->bkc", patch31, T["wuv2d"],
                           preferred_element_type=jnp.float32)
            ang = jnp.arctan2(m[..., 1], m[..., 0])            # (B, Kp)

            # rBRIEF: rotate pattern; sample the blurred band with one-hot
            # row-select matmul + col-select reduce at ABSOLUTE band
            # coordinates (kp sits at band position (oy+MARGIN, ox+MARGIN))
            ca = jnp.cos(ang)[:, :, None]
            sa = jnp.sin(ang)[:, :, None]
            px = T["pat_x"][None, None, :]
            py = T["pat_y"][None, None, :]
            rows = jnp.round(px * sa + py * ca).astype(jnp.int32)  # (B,Kp,512)
            cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
            prow = (iota_bh == (rows + MARGIN + oy[..., None])[..., None]
                    ).astype(jnp.bfloat16)                     # (B,Kp,512,bh)
            pcol = (iota_bw == (cols + MARGIN + ox[..., None])[..., None]
                    ).astype(jnp.bfloat16)                     # (B,Kp,512,bw)
            t_sel = jnp.einsum("bkja,bkaw->bkjw", prow, bands_blur,
                               preferred_element_type=jnp.bfloat16)
            samples = jnp.einsum("bkjw,bkjw->bkj", t_sel, pcol,
                                 preferred_element_type=jnp.float32)
            t0 = samples[..., 0::2]
            t1 = samples[..., 1::2]
            bits = (t0 < t1).astype(jnp.int32).reshape(B, Kp, 32, 8)
            weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, None, :]
            desc = jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)

        valid = kp_s > 0
        scale = T["slot_scale"][None, :]
        fx_lvl = kp_x.astype(jnp.float32)
        fy_lvl = kp_y.astype(jnp.float32)
        if self.subpixel:
            fx_lvl = fx_lvl + sub_dx
            fy_lvl = fy_lvl + sub_dy
        xs0 = fx_lvl * scale
        ys0 = fy_lvl * scale
        if self.quantize_level0_coords:  # reference copy_output int cast
            xs0 = jnp.floor(xs0)
            ys0 = jnp.floor(ys0)
        size = jnp.broadcast_to(jnp.floor(31.0 * scale), (B, Kp))
        octave = jnp.broadcast_to(T["slot_level"][None, :], (B, Kp))
        res = FrontendResult(
            xs=xs0, ys=ys0, response=kp_s,
            angle=ang * np.float32(180.0 / np.pi),
            octave=octave, size=size, valid=valid,
            desc=desc, lx=kp_x, ly=kp_y,
        )
        return res, raw_stack, bands_u8

    def _extract_impl(self, T, img_u8):
        res, _, _ = self._extract_batch_core(T, img_u8[None])
        return jax.tree_util.tree_map(lambda a: a[0], res)

    def _stereo_bands(self, T, l, r, bands_l, bands_r, mbf, min_z):
        from .stereo import stereo_match_bands
        return stereo_match_bands(
            l, r, bands_l, bands_r, T["band_y0"], T["band_x0"],
            T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
            T["widths"], T["scales"], T["inv_scales"], mbf, min_z)

    def _extract_bands_r128(self, T, rights_u8):
        """Right-eye tile bands padded to 128 lanes, for the Pallas stereo
        kernel's aligned manual DMA (ops/pallas_stereo.py).  Built with the
        constant one-hot matmuls straight from the right images — avoids
        both the (2B,...)->halves split copy and a separate pad op."""
        from .bands import extract_tile_bands_matmul
        g = self.geom
        bh, _bw = self.band_hw
        pyr_r = self._pyramid_batch(T, rights_u8)
        parts = []
        for i in range(g.n_levels):
            parts.append(extract_tile_bands_matmul(
                pyr_r[i], T["band_rsel"][i], T["band_csel128"][i],
                g.n_tiles_h[i], g.n_tiles_w[i], bh, 128))
        bands = jnp.concatenate(parts, axis=1)
        pad = self.n_slots_padded - self.n_slots
        if pad:
            bands = jnp.pad(bands, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return bands

    def _stereo_batch(self, T, L, R, bands_l, bands_r, mbf, min_z,
                      rights_u8=None):
        """Batched stereo dispatch: Pallas window-correlation kernel on TPU
        (ops/pallas_stereo.py), vmapped XLA band path otherwise.

        bands_l may be the FULL (2B, K, bh, bw) band tensor (left frames
        first) — the Pallas path reads left blocks in place, no split copy,
        and derives the 128-lane right bands by zero-padding the right half
        of the same tensor: every position the kernel can touch lies in
        cols < bw (max ox_r + STRIP_W = (tile_w-1) + MARGIN - 10 + 21 <=
        bw for all level geometries), so the pad is read-identical to a
        dedicated 128-lane extraction (_extract_bands_r128, kept for
        standalone call sites) at the cost of one copy instead of a second
        pyramid + band pass (~3 ms/16-frame batch).
        rights_u8: right-eye images (legacy fallback when bands_l only
        covers the left eyes)."""
        B_ = L.xs.shape[0]
        if self._use_pallas_stereo and (bands_l.shape[0] == 2 * B_
                                        or rights_u8 is not None):
            from .stereo import stereo_match_bands_batch_pallas
            bh, bw = self.band_hw
            # bw = tile_w + 2*MARGIN >= every window's last column
            assert (max(self.geom.tile_w) - 1 + 22 - 10 + 21) <= bw
            bw_r = -(-bw // 128) * 128
            if bands_l.shape[0] == 2 * B_:
                bands_r128 = jnp.pad(
                    bands_l[B_:], ((0, 0), (0, 0), (0, 0), (0, bw_r - bw)))
            else:
                bands_r128 = self._extract_bands_r128(T, rights_u8)
            return stereo_match_bands_batch_pallas(
                L, R, bands_l, bands_r128, T["band_y0"], T["band_x0"],
                T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
                T["widths"], T["scales"], T["inv_scales"], mbf, min_z,
                self._max_tiles_w, int(max(self.geom.tile_h)),
                int(max(self.geom.tile_w)),
                interpret=self._pallas_interpret)

        B = L.xs.shape[0]
        if bands_l.shape[0] != B:          # full tensor: split for the XLA path
            bands_l, bands_r = bands_l[:B], bands_l[B:]

        def one(l, r, bl, br):
            return self._stereo_bands(T, l, r, bl, br, mbf, min_z)

        return jax.vmap(one)(L, R, bands_l, bands_r)

    def _frame_step_impl(self, T, left_u8, right_u8, mbf, min_z):
        """ONE jitted program for the whole stereo frame: ORB on both eyes
        (batched) + dense stereo matching (Frame.cpp:107-110's two extraction
        threads + Frame::ComputeStereoMatches collapse into one dispatch)."""
        res, _raw, bands = self._extract_batch_core(
            T, jnp.stack([left_u8, right_u8]))
        take0 = jax.tree_util.tree_map(lambda a: a[0:1], res)
        take1 = jax.tree_util.tree_map(lambda a: a[1:2], res)
        u_r, depth, best_dist = self._stereo_batch(
            T, take0, take1, bands, None, mbf, min_z,
            rights_u8=right_u8[None])
        sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        return sq(take0), sq(take1), u_r[0], depth[0], best_dist[0]

    def _frame_steps_impl(self, T, lefts_u8, rights_u8, mbf, min_z):
        """Batched stereo frames: (B, H, W) each eye -> per-frame results.

        All 2B eyes ride ONE extraction program (the batch axis is the
        natural data-parallel mesh axis: shard lefts/rights with a
        NamedSharding over 'data' and XLA partitions the whole pipeline —
        per-frame work is independent); stereo matching runs batched (Pallas
        kernel on TPU, vmapped XLA path elsewhere)."""
        B = lefts_u8.shape[0]
        res, _raw, bands = self._extract_batch_core(
            T, jnp.concatenate([lefts_u8, rights_u8], axis=0))
        L = jax.tree_util.tree_map(lambda a: a[:B], res)
        R = jax.tree_util.tree_map(lambda a: a[B:], res)
        u_r, depth, dist = self._stereo_batch(
            T, L, R, bands, None, mbf, min_z, rights_u8=rights_u8)
        return L, R, u_r, depth, dist

    def extract(self, img_u8) -> FrontendResult:
        """img_u8: (H, W) uint8 array (numpy or jax)."""
        return _extract_jit(self, self._tables, jnp.asarray(img_u8))

    def frame_step(self, left_u8, right_u8, mbf: float, min_z: float):
        """Fused stereo frame: returns (left, right, u_right, depth, dist)."""
        return _frame_step_jit(self, self._tables, jnp.asarray(left_u8),
                               jnp.asarray(right_u8), jnp.float32(mbf),
                               jnp.float32(min_z))

    def frame_step_batch(self, lefts_u8, rights_u8, mbf: float, min_z: float):
        """Batched fused stereo frames (data-parallel axis = frame batch).

        Shard the inputs over a mesh ('data' axis) to scale the front-end
        across chips; on one chip the batch amortizes dispatch overhead."""
        return _frame_steps_jit(self, self._tables, jnp.asarray(lefts_u8),
                                jnp.asarray(rights_u8), jnp.float32(mbf),
                                jnp.float32(min_z))


@partial(jax.jit, static_argnums=0)
def _extract_jit(fe: "OrbFrontend", T, img_u8):
    return fe._extract_impl(T, img_u8)


@partial(jax.jit, static_argnums=0)
def _frame_step_jit(fe: "OrbFrontend", T, left_u8, right_u8, mbf, min_z):
    return fe._frame_step_impl(T, left_u8, right_u8, mbf, min_z)


@partial(jax.jit, static_argnums=0)
def _frame_steps_jit(fe: "OrbFrontend", T, lefts_u8, rights_u8, mbf, min_z):
    return fe._frame_steps_impl(T, lefts_u8, rights_u8, mbf, min_z)
