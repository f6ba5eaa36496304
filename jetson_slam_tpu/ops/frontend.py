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


def bilinear_resize(img_f32: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """out = wy @ img @ wx^T on the MXU, then uint8 truncation."""
    out = jnp.dot(wy, jnp.dot(img_f32, wx.T, preferred_element_type=jnp.float32),
                  preferred_element_type=jnp.float32)
    return jnp.floor(out).astype(jnp.uint8)


def fast_score_map(img_u8, lut, threshold: int, mask=None):
    """FAST-16 SAD score map (spec: orb_FAST_compute_score.cu:1412-1623).

    img_u8: (H, W) uint8.  Returns (H, W) int32 score map, zero outside the
    BORDER_SKIP ROI and wherever the segment test fails.
    """
    H, W = img_u8.shape
    im = img_u8.astype(jnp.int32)
    v = im
    vt = v + threshold
    v_t = v - threshold

    ring = []
    for dy, dx in np.asarray(FAST_RING):
        ring.append(jnp.roll(im, (-int(dy), -int(dx)), axis=(0, 1)))
    ring = jnp.stack(ring)  # (16, H, W)

    # early-exit opposite-pair pruning: pairs (4,12) then (0,8)
    def within(r):
        return (r <= vt) & (r >= v_t)

    pruned = (within(ring[4]) & within(ring[12])) | (within(ring[0]) & within(ring[8]))

    shifts = (1 << jnp.arange(16, dtype=jnp.int32))[:, None, None]
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

    Spec: orb_FAST_apply_NMS_G.cu:1256-1384.  Returns dense per-tile
    (x, y, s) int32 arrays of length n_tiles_h*n_tiles_w (row-major tiles).
    Tie-break is first-in-row-major order (the reference's thread-scan order
    differs only on exact integer score ties).
    """
    H, W = score.shape
    if fuse_nms_l:
        neigh = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh.append(jnp.roll(score, (-dy, -dx), axis=(0, 1)))
        nmax = jnp.max(jnp.stack(neigh), axis=0)
        score = jnp.where(score >= nmax, score, 0)

    n_th = (H - 1) // tile_h + 1
    n_tw = (W - 1) // tile_w + 1
    Hp, Wp = n_th * tile_h, n_tw * tile_w
    padded = jnp.zeros((Hp, Wp), dtype=score.dtype).at[:H, :W].set(score)
    tiles = padded.reshape(n_th, tile_h, n_tw, tile_w).transpose(0, 2, 1, 3)
    flat = tiles.reshape(n_th * n_tw, tile_h * tile_w)
    idx = jnp.argmax(flat, axis=1)
    s = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    ty = jnp.arange(n_th * n_tw, dtype=jnp.int32) // n_tw
    tx = jnp.arange(n_th * n_tw, dtype=jnp.int32) % n_tw
    y = ty * tile_h + (idx // tile_w).astype(jnp.int32)
    x = tx * tile_w + (idx % tile_w).astype(jnp.int32)
    empty = s <= 0
    return (jnp.where(empty, 0, x), jnp.where(empty, 0, y), jnp.where(empty, 0, s))


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
                 subpixel=True):
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
        self.apply_nms_ms = bool(apply_nms_ms) and n_levels > 1
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

        self._extract = jax.jit(self._extract_impl)

    # ------------------------------------------------------------------
    def compute_pyramid(self, img_u8):
        g = self.geom
        levels = [img_u8]
        f0 = img_u8.astype(jnp.float32)
        for i in range(1, g.n_levels):
            levels.append(bilinear_resize(f0, self._wy[i], self._wx[i]))
        return levels

    def _extract_impl(self, img_u8):
        g = self.geom
        pyr = self.compute_pyramid(img_u8)

        xs_l, ys_l, s_l, dx_l, dy_l = [], [], [], [], []
        for i in range(g.n_levels):
            mask_i = self.masks[i] if self.masks is not None else None
            score = fast_score_map(pyr[i], self.lut, self.threshold, mask_i)
            x, y, s = nms_lg(score, g.tile_h[i], g.tile_w[i], fuse_nms_l=True)
            xs_l.append(x); ys_l.append(y); s_l.append(s)
            if self.subpixel:
                dx, dy = subpixel_offsets(score, x, y)
                dx_l.append(dx); dy_l.append(dy)

        pad = self.n_slots_padded - self.n_slots
        kp_x = jnp.concatenate(xs_l + [jnp.zeros(pad, jnp.int32)])
        kp_y = jnp.concatenate(ys_l + [jnp.zeros(pad, jnp.int32)])
        kp_s = jnp.concatenate(s_l + [jnp.zeros(pad, jnp.int32)])

        if self.apply_nms_ms:
            kp_s = nms_ms(kp_x, kp_y, kp_s, self.slot_level, self.slot_scale,
                          g.n_levels, g.heights[0], g.widths[0])

        # per-level orientation + blur + descriptors on dense slots
        ang = jnp.zeros(self.n_slots_padded, jnp.float32)
        desc = jnp.zeros((self.n_slots_padded, 32), jnp.uint8)
        for i in range(g.n_levels):
            o = g.level_offsets[i]
            n = g.n_tiles_h[i] * g.n_tiles_w[i]
            lx = jax.lax.dynamic_slice(kp_x, (o,), (n,))
            ly = jax.lax.dynamic_slice(kp_y, (o,), (n,))
            a = ic_angles(pyr[i], lx, ly)
            blur = gaussian_blur(pyr[i], self.gauss)
            d = orb_descriptors(blur, lx, ly, a)
            ang = jax.lax.dynamic_update_slice(ang, a, (o,))
            desc = jax.lax.dynamic_update_slice(desc, d, (o, 0))

        valid = kp_s > 0
        scale = self.slot_scale
        fx_lvl = kp_x.astype(jnp.float32)
        fy_lvl = kp_y.astype(jnp.float32)
        if self.subpixel:
            padf = jnp.zeros(pad, jnp.float32)
            fx_lvl = fx_lvl + jnp.concatenate(dx_l + [padf])
            fy_lvl = fy_lvl + jnp.concatenate(dy_l + [padf])
        xs0 = fx_lvl * scale
        ys0 = fy_lvl * scale
        if self.quantize_level0_coords:  # reference copy_output int cast
            xs0 = jnp.floor(xs0)
            ys0 = jnp.floor(ys0)
        size = jnp.floor(31.0 * scale)
        return FrontendResult(
            xs=xs0, ys=ys0, response=kp_s,
            angle=ang * np.float32(180.0 / np.pi),
            octave=self.slot_level, size=size, valid=valid,
            desc=desc, lx=kp_x, ly=kp_y,
        )

    def extract(self, img_u8) -> FrontendResult:
        """img_u8: (H, W) uint8 array (numpy or jax)."""
        return self._extract(jnp.asarray(img_u8))
