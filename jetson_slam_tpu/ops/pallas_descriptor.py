"""Pallas TPU kernel: fused gaussian blur + orientation + rBRIEF over
VMEM-resident keypoint bands.

TPU-native re-design of orb_gaussian.cu + orb_FAST_orientation.cu +
orb_descriptor.cu as ONE kernel over the tile-anchored bands (ops/bands.py).
The XLA band path materializes the one-hot sample selectors and the selected
strips in HBM (measured: pred[B,Kp,512,bh] compare fusions plus an
f32[B,Kp,512,bw] t_sel intermediate -> ~0.5 GB of temps and ~14 ms/32-eye
batch); here every intermediate — the 7x7 blur, the 31x31 intensity-centroid
patch, the (512, band) one-hot sample selectors and the selected strips —
lives in VMEM, so HBM traffic collapses to one uint8 band read plus the
32-byte descriptor + two-moment write per slot.

Per slot (all batched over a block of SB slots, matmuls on the MXU via
batched `dot_general`):
1. separable 7-tap blur via two symmetric band-matrix matmuls on the MXU in
   f32 (orb_gaussian.cu:21-110), floored to integers and border-preserved
   against the true level border; the band margin (ops/bands.MARGIN = 22 =
   rBRIEF reach 19 + blur radius 3) guarantees real image pixels under every
   sampled position.
2. intensity-centroid moments from the RAW band via two one-hot matmuls
   (orb_FAST_orientation.cu:17-62); cos/sin come from m10/m01 directly
   (rsqrt), the float angle itself is recovered by the caller with a true
   arctan2 — atan2 has no Mosaic lowering.
3. rBRIEF: rotate the 512-point pattern, select samples from the blurred
   band with one-hot row matmul + column mask-reduce, compare the
   host-REORDERED pattern halves (first 256 = even pair members), and pack
   bits to bytes with one (SB, 256) @ (256, 32) power-of-two matmul
   (orb_descriptor.cu:12-68).

All selected sample values are integers 0..255 (exactly representable in
bf16, accumulated in f32 through one-hot dots), so the sampling itself is
exact; only the f32 blur accumulation order differs from other backends.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tables
from .bands import MARGIN

SB = 32          # slots per program
IC_HALF = tables.HALF_PATCH_SIZE          # 15
ICP = 2 * IC_HALF + 1                     # 31
ICP_PAD = 32
DESC_HALF = 19                            # max |rint(rotated offset)|
_HIGH = jax.lax.Precision.HIGHEST


def _consts():
    """Kernel constants: reordered pattern, IC masks, gaussian, packer."""
    pat = tables.orb_pattern().astype(np.float32)         # (512, 2) x,y
    # reorder so samples[:256] are the even pair members (t0) and
    # samples[256:] the odd ones (t1): bit j = t0[j] < t1[j]
    px = np.concatenate([pat[0::2, 0], pat[1::2, 0]])
    py = np.concatenate([pat[0::2, 1], pat[1::2, 1]])
    wu, wv = tables.ic_angle_masks()                      # (31, 31)
    wuv = np.zeros((2, ICP_PAD, ICP_PAD), np.float32)
    wuv[0, :ICP, :ICP] = wu
    wuv[1, :ICP, :ICP] = wv
    g1 = np.exp(-(np.arange(-3, 4, dtype=np.float64) ** 2) / 200.0)
    g1 = (g1 / g1.sum()).astype(np.float32)
    pack = np.zeros((256, 32), np.float32)                # bits -> bytes
    for j in range(256):
        pack[j, j // 8] = float(1 << (j % 8))
    return px.astype(np.float32), py.astype(np.float32), wuv, g1, pack


_PX, _PY, _WUV, _G7, _PACK = _consts()


def _gauss_band(n: int) -> np.ndarray:
    """Symmetric (n, n) band matrix B with B[i, j] = g7[j - i + 3]."""
    B = np.zeros((n, n), np.float32)
    for d in range(-3, 4):
        idx = np.arange(max(0, -d), min(n, n - d))
        B[idx, idx + d] = _G7[d + 3]
    return B


def _descriptor_kernel(meta_ref, raw_ref, wuv_ref, pxy_ref, pack_ref,
                       gy_ref, gx_ref, desc_ref, mom_ref, *, bh, bw):
    raw_u8 = raw_ref[...]
    raw = raw_u8.astype(jnp.int32).astype(jnp.float32)    # (SB, bh, bw)
    meta = meta_ref[...]                                  # (SB, 8) int32
    oy = meta[:, 0:1]
    ox = meta[:, 1:2]
    y0 = meta[:, 2:3]
    x0 = meta[:, 3:4]
    hl = meta[:, 4:5]
    wl = meta[:, 5:6]

    # ---- separable 7-tap blur: two band-matrix matmuls on the MXU in f32
    # (each output row/col is the 7-tap weighted sum; border columns of the
    # band matrices under-weight edge pixels, but those lie outside every
    # sampled position — the margin covers the blur support)
    rowsum = jax.lax.dot_general(                         # (SB, bw, bh)
        raw, gy_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())), precision=_HIGH)
    blur = jax.lax.dot_general(                           # (SB, bh, bw)
        rowsum, gx_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())), precision=_HIGH)
    # border-preserve: pixels within 3 of the true level border keep raw
    ir = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, bw), 1) \
        + (y0 - MARGIN)[:, :, None]                       # image row
    ic_ = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, bw), 2) \
        + (x0 - MARGIN)[:, :, None]                       # image col
    interior = ((ir >= 3) & (ir < hl[:, :, None] - 3)
                & (ic_ >= 3) & (ic_ < wl[:, :, None] - 3))
    blur = jnp.where(interior, jnp.floor(blur), raw)

    # ---- IC moments from the raw band: 31x31 one-hot window matmuls
    u_of = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, ICP_PAD), 2)
    rows31 = jnp.where(u_of < ICP, oy[:, :, None] + (MARGIN - IC_HALF) + u_of,
                       -1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, ICP_PAD), 1)
    R31 = (iota_r == rows31).astype(jnp.bfloat16)         # (SB, bh, 32)
    v_of = jax.lax.broadcasted_iota(jnp.int32, (SB, bw, ICP_PAD), 2)
    cols31 = jnp.where(v_of < ICP, ox[:, :, None] + (MARGIN - IC_HALF) + v_of,
                       -1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (SB, bw, ICP_PAD), 1)
    C31 = (iota_c == cols31).astype(jnp.bfloat16)         # (SB, bw, 32)
    strip = jax.lax.dot_general(                          # (SB, bw, 32u)
        raw.astype(jnp.bfloat16), R31,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    patch = jax.lax.dot_general(                          # (SB, 32u, 32v)
        strip.astype(jnp.bfloat16), C31,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    wuv = wuv_ref[...]                                    # (2, 32, 32)
    # keep every intermediate >= 2D (Mosaic layout requirement)
    m10 = jnp.sum(jnp.sum(patch * wuv[0][None], axis=2),
                  axis=1, keepdims=True)                  # (SB, 1)
    m01 = jnp.sum(jnp.sum(patch * wuv[1][None], axis=2),
                  axis=1, keepdims=True)
    m2 = m10 * m10 + m01 * m01
    inv = jax.lax.rsqrt(jnp.maximum(m2, 1e-18))
    # atan2(0, 0) = 0 -> (ca, sa) = (1, 0) like the reference
    ca = jnp.where(m2 > 0, m10 * inv, 1.0)
    sa = jnp.where(m2 > 0, m01 * inv, 0.0)

    # ---- rBRIEF: rotated integer offsets -> absolute band coordinates
    px = pxy_ref[0:1, :]                                  # (1, 512)
    py = pxy_ref[1:2, :]
    rows = jnp.round(px * sa + py * ca).astype(jnp.int32)
    cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
    band_r = oy + MARGIN + rows                           # (SB, 512)
    band_c = ox + MARGIN + cols
    iota_bh = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, 512), 1)
    prowT = (iota_bh == band_r[:, None, :]).astype(jnp.bfloat16)
    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (SB, bw, 512), 1)
    # the whole selection chain stays bf16: blurred values are integers
    # 0..255 (exact in bf16) and pcolT is one-hot, so the w-reduction has
    # exactly one nonzero term — bf16 halves the VMEM traffic of the two
    # (SB, bw, 512) intermediates at zero precision cost
    pcolT = (iota_bw == band_c[:, None, :]).astype(jnp.bfloat16)
    tsel = jax.lax.dot_general(                           # (SB, bw, 512)
        blur.astype(jnp.bfloat16), prowT,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # w-reduction as a ones-vector MXU dot: the VPU tree-reduce over 64
    # sublanes of a (SB, bw, 512) tensor costs ~6 full-tensor passes
    masked = tsel * pcolT                                 # one nonzero per w
    ones_w = jnp.ones((SB, 1, bw), jnp.bfloat16)
    samples = jax.lax.dot_general(                        # (SB, 1, 512)
        ones_w, masked,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
    bits = (samples[:, :256] < samples[:, 256:]).astype(jnp.bfloat16)
    desc = jnp.dot(bits, pack_ref[...],
                   preferred_element_type=jnp.float32)    # (SB, 32)
    desc_ref[...] = desc.astype(jnp.int32)
    mom_ref[:, 0:1] = m10
    mom_ref[:, 1:2] = m01
    mom_ref[:, 2:8] = jnp.zeros((SB, 6), jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def orb_descriptors_pallas(bands_raw_u8, meta, interpret: bool = False):
    """Fused blur + orientation + descriptor over keypoint bands.

    bands_raw_u8: (N, bh, bw) uint8 tile-anchored raw bands (N = eyes*slots,
    padded to a multiple of SB).  meta: (N, 8) int32 columns
    [oy, ox, band_y0, band_x0, level_h, level_w, 0, 0] where
    (oy, ox) = keypoint position minus the band's tile origin (so the
    keypoint sits at band coordinates (oy + MARGIN, ox + MARGIN)).
    Returns (desc (N, 32) int32 bytes, moments (N, 8) f32 with m10/m01 in
    columns 0/1 — angle = arctan2(m01, m10)).
    """
    N, bh, bw = bands_raw_u8.shape
    grid = (N // SB,)
    kernel = partial(_descriptor_kernel, bh=bh, bw=bw)
    pxy = jnp.asarray(np.stack([_PX, _PY]))               # (2, 512)
    desc, mom = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((SB, 8), lambda i: (i, 0)),
            pl.BlockSpec((SB, bh, bw), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, ICP_PAD, ICP_PAD), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, 512), lambda i: (0, 0)),
            pl.BlockSpec((256, 32), lambda i: (0, 0)),
            pl.BlockSpec((bh, bh), lambda i: (0, 0)),
            pl.BlockSpec((bw, bw), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((SB, 32), lambda i: (i, 0)),
            pl.BlockSpec((SB, 8), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 32), jnp.int32),
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
        ),
        interpret=interpret,
    )(meta, bands_raw_u8, jnp.asarray(_WUV), pxy,
      jnp.asarray(_PACK, jnp.bfloat16), jnp.asarray(_gauss_band(bh)),
      jnp.asarray(_gauss_band(bw)))
    return desc, mom
