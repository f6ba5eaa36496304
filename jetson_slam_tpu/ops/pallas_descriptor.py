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

Per slot (all batched over a block of `sb` slots, matmuls on the MXU via
batched `dot_general`):
1. separable 7-tap blur via two symmetric band-matrix matmuls on the MXU at
   one-pass bf16 with f32 accumulation (orb_gaussian.cu:21-110) — the same
   arithmetic the XLA band path runs at TPU default matmul precision, whose
   descriptor fuzz is measured ATE-neutral (tests/test_descriptor_fuzz.py);
   an f32-HIGHEST variant cost ~4.6 ms/32-eye batch in 6-pass MXU mode and
   a VPU shifted-add stencil was slower still — floored to integers and
   border-preserved against the true level border; the band margin
   (ops/bands.MARGIN = 22 = rBRIEF reach 19 + blur radius 3) guarantees
   real image pixels under every sampled position.
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

SB = 128         # slots per program (tuned on v5e; round-5 sweep over
                 # sb {32,64,128} x chunk {64,128,256} on production
                 # shapes: 128/256 fastest, bit-identical outputs)
CHUNK = 256      # rBRIEF pattern points per inner step (512 / CHUNK steps)
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
                       gy_ref, gx_ref, desc_ref, mom_ref, *, bh, bw, sb,
                       chunk):
    raw_u8 = raw_ref[...]
    raw = raw_u8.astype(jnp.int32).astype(jnp.float32)    # (sb, bh, bw)
    meta = meta_ref[...]                                  # (sb, 8) int32
    oy = meta[:, 0:1]
    ox = meta[:, 1:2]
    y0 = meta[:, 2:3]
    x0 = meta[:, 3:4]
    hl = meta[:, 4:5]
    wl = meta[:, 5:6]

    # ---- separable 7-tap blur: two band-matrix matmuls on the MXU at
    # one-pass bf16 (raw values 0..255 are exact in bf16; only the gaussian
    # weights round — the same arithmetic the XLA band path runs at TPU
    # default matmul precision, whose descriptor fuzz is measured
    # ATE-neutral in tests/test_descriptor_fuzz.py).  The previous
    # f32-HIGHEST formulation cost ~4.6 ms/32-eye batch in 6-pass mode; a
    # VPU shifted-add stencil was measured SLOWER (14 lane/sublane
    # realignment copies per block).
    raw16 = raw.astype(jnp.bfloat16)
    rowsum = jax.lax.dot_general(                         # (sb, bw, bh)
        raw16, gy_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    blur = jax.lax.dot_general(                           # (sb, bh, bw)
        rowsum.astype(jnp.bfloat16), gx_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # border-preserve: pixels within 3 of the true level border keep raw
    ir = jax.lax.broadcasted_iota(jnp.int32, (sb, bh, bw), 1) \
        + (y0 - MARGIN)[:, :, None]                       # image row
    ic_ = jax.lax.broadcasted_iota(jnp.int32, (sb, bh, bw), 2) \
        + (x0 - MARGIN)[:, :, None]                       # image col
    interior = ((ir >= 3) & (ir < hl[:, :, None] - 3)
                & (ic_ >= 3) & (ic_ < wl[:, :, None] - 3))
    blur = jnp.where(interior, jnp.floor(blur), raw)

    # ---- IC moments from the raw band: 31x31 one-hot window matmuls
    u_of = jax.lax.broadcasted_iota(jnp.int32, (sb, bh, ICP_PAD), 2)
    rows31 = jnp.where(u_of < ICP, oy[:, :, None] + (MARGIN - IC_HALF) + u_of,
                       -1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (sb, bh, ICP_PAD), 1)
    R31 = (iota_r == rows31).astype(jnp.bfloat16)         # (sb, bh, 32)
    v_of = jax.lax.broadcasted_iota(jnp.int32, (sb, bw, ICP_PAD), 2)
    cols31 = jnp.where(v_of < ICP, ox[:, :, None] + (MARGIN - IC_HALF) + v_of,
                       -1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (sb, bw, ICP_PAD), 1)
    C31 = (iota_c == cols31).astype(jnp.bfloat16)         # (sb, bw, 32)
    strip = jax.lax.dot_general(                          # (sb, bw, 32u)
        raw.astype(jnp.bfloat16), R31,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    patch = jax.lax.dot_general(                          # (sb, 32u, 32v)
        strip.astype(jnp.bfloat16), C31,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    wuv = wuv_ref[...]                                    # (2, 32, 32)
    # keep every intermediate >= 2D (Mosaic layout requirement)
    m10 = jnp.sum(jnp.sum(patch * wuv[0][None], axis=2),
                  axis=1, keepdims=True)                  # (sb, 1)
    m01 = jnp.sum(jnp.sum(patch * wuv[1][None], axis=2),
                  axis=1, keepdims=True)
    m2 = m10 * m10 + m01 * m01
    inv = jax.lax.rsqrt(jnp.maximum(m2, 1e-18))
    # atan2(0, 0) = 0 -> (ca, sa) = (1, 0) like the reference
    ca = jnp.where(m2 > 0, m10 * inv, 1.0)
    sa = jnp.where(m2 > 0, m01 * inv, 0.0)

    # ---- rBRIEF: rotated integer offsets -> absolute band coordinates,
    # sampled CHUNK pattern points at a time (one-hot row-select MXU dot +
    # col mask-reduce) so the (sb, bw, chunk) intermediates stay small
    # enough to run sb=64 slots per program inside ~16 MB of VMEM
    px = pxy_ref[0:1, :]                                  # (1, 512)
    py = pxy_ref[1:2, :]
    rows = jnp.round(px * sa + py * ca).astype(jnp.int32)
    cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
    band_r = oy + MARGIN + rows                           # (sb, 512)
    band_c = ox + MARGIN + cols
    blur16 = blur.astype(jnp.bfloat16)
    iota_bh = jax.lax.broadcasted_iota(jnp.int32, (sb, bh, chunk), 1)
    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (sb, bw, chunk), 1)
    ones_w = jnp.ones((sb, 1, bw), jnp.bfloat16)
    parts = []
    for c0 in range(0, 512, chunk):
        # the selection chain stays bf16: blurred values are integers
        # 0..255 (exact in bf16) and pcolT is one-hot, so the w-reduction
        # has exactly one nonzero term.  (A transposed variant putting the
        # pattern dim on the matmul M dim measured ~2x SLOWER — contracting
        # the lane dim of the one-hot forces Mosaic relayouts; this
        # orientation keeps every operand in its native layout.)
        br_c = jax.lax.slice_in_dim(band_r, c0, c0 + chunk, axis=1)
        bc_c = jax.lax.slice_in_dim(band_c, c0, c0 + chunk, axis=1)
        prowT = (iota_bh == br_c[:, None, :]
                 ).astype(jnp.bfloat16)                   # (sb, bh, chunk)
        pcolT = (iota_bw == bc_c[:, None, :]
                 ).astype(jnp.bfloat16)                   # (sb, bw, chunk)
        tsel = jax.lax.dot_general(                       # (sb, bw, chunk)
            blur16, prowT,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # w-reduction as a ones-vector MXU dot: the VPU tree-reduce over
        # bw sublanes of the masked tensor costs ~6 full-tensor passes
        masked = tsel * pcolT                             # one nonzero per w
        parts.append(jax.lax.dot_general(                 # (sb, 1, chunk)
            ones_w, masked,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :])
    samples = jnp.concatenate(parts, axis=1)              # (sb, 512)
    bits = (samples[:, :256] < samples[:, 256:]).astype(jnp.bfloat16)
    desc = jnp.dot(bits, pack_ref[...],
                   preferred_element_type=jnp.float32)    # (sb, 32)
    desc_ref[...] = desc.astype(jnp.int32)
    mom_ref[:, 0:1] = m10
    mom_ref[:, 1:2] = m01
    mom_ref[:, 2:8] = jnp.zeros((sb, 6), jnp.float32)


@partial(jax.jit, static_argnames=("interpret", "sb", "chunk"))
def orb_descriptors_pallas(bands_raw_u8, meta, interpret: bool = False,
                           sb: int = SB, chunk: int = CHUNK):
    """Fused blur + orientation + descriptor over keypoint bands.

    bands_raw_u8: (N, bh, bw) uint8 tile-anchored raw bands (N = eyes*slots,
    padded to a multiple of sb).  meta: (N, 8) int32 columns
    [oy, ox, band_y0, band_x0, level_h, level_w, 0, 0] where
    (oy, ox) = keypoint position minus the band's tile origin (so the
    keypoint sits at band coordinates (oy + MARGIN, ox + MARGIN)).
    Returns (desc (N, 32) int32 bytes, moments (N, 8) f32 with m10/m01 in
    columns 0/1 — angle = arctan2(m01, m10)).
    """
    N, bh, bw = bands_raw_u8.shape
    while N % sb:
        sb //= 2
    grid = (N // sb,)
    kernel = partial(_descriptor_kernel, bh=bh, bw=bw, sb=sb, chunk=chunk)
    pxy = jnp.asarray(np.stack([_PX, _PY]))               # (2, 512)
    desc, mom = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((sb, 8), lambda i: (i, 0)),
            pl.BlockSpec((sb, bh, bw), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, ICP_PAD, ICP_PAD), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, 512), lambda i: (0, 0)),
            pl.BlockSpec((256, 32), lambda i: (0, 0)),
            pl.BlockSpec((bh, bh), lambda i: (0, 0)),
            pl.BlockSpec((bw, bw), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((sb, 32), lambda i: (i, 0)),
            pl.BlockSpec((sb, 8), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 32), jnp.int32),
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
        ),
        # v5e has far more physical VMEM than the default 16 MB scoped
        # limit; sb=64 with chunked rBRIEF peaks around ~20 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, bands_raw_u8, jnp.asarray(_WUV), pxy,
      jnp.asarray(_PACK, jnp.bfloat16),
      jnp.asarray(_gauss_band(bh), jnp.bfloat16),
      jnp.asarray(_gauss_band(bw), jnp.bfloat16))
    return desc, mom
