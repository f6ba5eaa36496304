"""Stage ablation for the Pallas descriptor kernel: time variants with
stages progressively enabled to attribute per-program cost."""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.ops import pallas_descriptor as pd
from jetson_slam_tpu.ops.bands import MARGIN

SB = pd.SB


def make_kernel(stage, bh, bw):
    def kernel(meta_ref, raw_ref, wuv_ref, pxy_ref, pack_ref, gy_ref, gx_ref,
               desc_ref, mom_ref):
        raw_u8 = raw_ref[...]
        raw = raw_u8.astype(jnp.int32).astype(jnp.float32)
        meta = meta_ref[...]
        oy = meta[:, 0:1]; ox = meta[:, 1:2]
        y0 = meta[:, 2:3]; x0 = meta[:, 3:4]
        hl = meta[:, 4:5]; wl = meta[:, 5:6]
        if stage == "load":
            desc_ref[...] = jnp.sum(jnp.sum(raw, axis=2), axis=1,
                            keepdims=True).astype(jnp.int32) + \
                jnp.zeros((SB, 32), jnp.int32)
            mom_ref[...] = jnp.zeros((SB, 8), jnp.float32)
            return
        rowsum = jax.lax.dot_general(raw, gy_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        blur = jax.lax.dot_general(rowsum, gx_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        ir = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, bw), 1) + (y0 - MARGIN)[:, :, None]
        ic_ = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, bw), 2) + (x0 - MARGIN)[:, :, None]
        interior = ((ir >= 3) & (ir < hl[:, :, None] - 3)
                    & (ic_ >= 3) & (ic_ < wl[:, :, None] - 3))
        blur = jnp.where(interior, jnp.floor(blur), raw)
        if stage == "blur":
            desc_ref[...] = jnp.sum(jnp.sum(blur, axis=2), axis=1,
                            keepdims=True).astype(jnp.int32) + \
                jnp.zeros((SB, 32), jnp.int32)
            mom_ref[...] = jnp.zeros((SB, 8), jnp.float32)
            return
        ICP, ICP_PAD, IC_HALF = pd.ICP, pd.ICP_PAD, pd.IC_HALF
        u_of = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, ICP_PAD), 2)
        rows31 = jnp.where(u_of < ICP, oy[:, :, None] + (MARGIN - IC_HALF) + u_of, -1)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, ICP_PAD), 1)
        R31 = (iota_r == rows31).astype(jnp.bfloat16)
        v_of = jax.lax.broadcasted_iota(jnp.int32, (SB, bw, ICP_PAD), 2)
        cols31 = jnp.where(v_of < ICP, ox[:, :, None] + (MARGIN - IC_HALF) + v_of, -1)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (SB, bw, ICP_PAD), 1)
        C31 = (iota_c == cols31).astype(jnp.bfloat16)
        strip = jax.lax.dot_general(raw.astype(jnp.bfloat16), R31,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = jax.lax.dot_general(strip.astype(jnp.bfloat16), C31,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        wuv = wuv_ref[...]
        m10 = jnp.sum(jnp.sum(patch * wuv[0][None], axis=2), axis=1, keepdims=True)
        m01 = jnp.sum(jnp.sum(patch * wuv[1][None], axis=2), axis=1, keepdims=True)
        m2 = m10 * m10 + m01 * m01
        inv = jax.lax.rsqrt(jnp.maximum(m2, 1e-18))
        ca = jnp.where(m2 > 0, m10 * inv, 1.0)
        sa = jnp.where(m2 > 0, m01 * inv, 0.0)
        if stage == "ic":
            desc_ref[...] = (ca + sa).astype(jnp.int32) + jnp.zeros((SB, 32), jnp.int32)
            mom_ref[:, 0:1] = m10; mom_ref[:, 1:2] = m01
            mom_ref[:, 2:8] = jnp.zeros((SB, 6), jnp.float32)
            return
        px = pxy_ref[0:1, :]; py = pxy_ref[1:2, :]
        rows = jnp.round(px * sa + py * ca).astype(jnp.int32)
        cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
        band_r = oy + MARGIN + rows
        band_c = ox + MARGIN + cols
        iota_bh = jax.lax.broadcasted_iota(jnp.int32, (SB, bh, 512), 1)
        prowT = (iota_bh == band_r[:, None, :]).astype(jnp.bfloat16)
        if stage == "rot":
            desc_ref[...] = jnp.sum(jnp.sum(prowT, axis=2), axis=1,
                            keepdims=True).astype(jnp.int32) + \
                jnp.zeros((SB, 32), jnp.int32)
            mom_ref[...] = jnp.zeros((SB, 8), jnp.float32)
            return
        iota_bw = jax.lax.broadcasted_iota(jnp.int32, (SB, bw, 512), 1)
        pcolT = (iota_bw == band_c[:, None, :]).astype(jnp.float32)
        tsel = jax.lax.dot_general(blur.astype(jnp.bfloat16), prowT,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        samples = jnp.sum(tsel * pcolT, axis=1)
        bits = (samples[:, :256] < samples[:, 256:]).astype(jnp.bfloat16)
        desc = jnp.dot(bits, pack_ref[...], preferred_element_type=jnp.float32)
        desc_ref[...] = desc.astype(jnp.int32)
        mom_ref[:, 0:1] = m10; mom_ref[:, 1:2] = m01
        mom_ref[:, 2:8] = jnp.zeros((SB, 6), jnp.float32)
    return kernel


@partial(jax.jit, static_argnames=("stage",))
def run(bands, meta, stage):
    N, bh, bw = bands.shape
    kernel = make_kernel(stage, bh, bw)
    pxy = jnp.asarray(np.stack([pd._PX, pd._PY]))
    return pl.pallas_call(
        kernel, grid=(N // SB,),
        in_specs=[
            pl.BlockSpec((SB, 8), lambda i: (i, 0)),
            pl.BlockSpec((SB, bh, bw), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, pd.ICP_PAD, pd.ICP_PAD), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, 512), lambda i: (0, 0)),
            pl.BlockSpec((256, 32), lambda i: (0, 0)),
            pl.BlockSpec((bh, bh), lambda i: (0, 0)),
            pl.BlockSpec((bw, bw), lambda i: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((SB, 32), lambda i: (i, 0)),
                   pl.BlockSpec((SB, 8), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((N, 32), jnp.int32),
                   jax.ShapeDtypeStruct((N, 8), jnp.float32)),
    )(meta, bands, jnp.asarray(pd._WUV), pxy,
      jnp.asarray(pd._PACK, jnp.bfloat16),
      jnp.asarray(pd._gauss_band(bh)), jnp.asarray(pd._gauss_band(bw)))


def main():
    N, bh, bw = 32 * 896, 64, 64
    rng = np.random.default_rng(0)
    bands = jnp.asarray(rng.integers(0, 255, (N, bh, bw)).astype(np.uint8))
    meta = np.zeros((N, 8), np.int32)
    meta[:, 0] = rng.integers(0, 16, N)
    meta[:, 1] = rng.integers(0, 16, N)
    meta[:, 4] = 240
    meta[:, 5] = 320
    meta = jnp.asarray(meta)

    def timeit(fn, *a, iters=15):
        out = fn(*a)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    prev = 0.0
    for stage in ("load", "blur", "ic", "rot", "full"):
        ms = timeit(run, bands, meta, stage)
        print(f"{stage:5s}: {ms:7.2f} ms (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
