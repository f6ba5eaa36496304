"""Stage ablation for the Pallas stereo cost kernel: time variants with
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
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops.frontend import OrbFrontend
from jetson_slam_tpu.ops import stereo as st
from jetson_slam_tpu.ops import pallas_stereo as ps


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def make_kernel(stage, span, win, pad_l, k_slots, bw, bw_r, sb):
    PW, NB, SW = ps.PATCH_W, ps.NBRHOOD, ps.STRIP_W
    R0A = ps.ROW0A

    def kern(meta_ref, bands_l_ref, bands_r_hbm, costs_ref, win_ref, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        start = jnp.clip(((j * sb - pad_l) // 8) * 8, 0, k_slots - win)
        start = pl.multiple_of(start, 8)
        cp = pltpu.make_async_copy(
            bands_r_hbm.at[b, pl.ds(start, win),
                           pl.ds(R0A * bw_r, span * bw_r)], win_ref, sem)
        cp.start()
        meta = meta_ref[0]
        oy_l = meta[:, 0:1] - R0A
        ox_l = meta[:, 1:2]
        slot_r = meta[:, 2:3]
        oy_r = meta[:, 3:4] - R0A
        ox_r = meta[:, 4:5]
        out0 = jnp.zeros((sb, ps.COST_PAD), jnp.float32)
        if stage == "dma":
            cp.wait()
            w8 = win_ref[...]
            costs_ref[0] = out0 + jnp.sum(
                w8[:1, :128].astype(jnp.int32).astype(jnp.float32))
            return
        rawL = bands_l_ref[0][:, R0A:R0A + span, :]
        rawL = rawL.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        RL = ps._banded_onehot(oy_l, span, PW, sb)
        CL = ps._banded_onehot(ox_l, bw, PW, sb)
        stripL = jax.lax.dot_general(
            rawL, RL, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        lpatch = jax.lax.dot_general(
            stripL.astype(jnp.bfloat16), CL,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if stage == "left":
            cp.wait()
            costs_ref[0] = out0 + jnp.sum(jnp.sum(lpatch, 2), 1,
                                          keepdims=True)
            return
        cp.wait()
        io_w = jax.lax.broadcasted_iota(jnp.int32, (sb, win), 1)
        selw = (io_w == (slot_r - start)).astype(jnp.bfloat16)
        winf = win_ref[...].astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)
        rawR = jax.lax.dot_general(
            selw, winf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rawR2 = rawR.reshape(sb, span, bw_r).astype(jnp.bfloat16)
        if stage == "select":
            costs_ref[0] = out0 + jnp.sum(jnp.sum(rawR2.astype(jnp.float32),
                                                  2), 1, keepdims=True)
            return
        RR = ps._banded_onehot(oy_r, span, PW, sb)
        stripR = jax.lax.dot_general(
            rawR2, RR, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        CR = ps._banded_onehot(ox_r, bw_r, SW, sb)
        rstrip = jax.lax.dot_general(
            stripR, CR, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if stage == "strip":
            costs_ref[0] = out0 + jnp.sum(jnp.sum(rstrip, 2), 1,
                                          keepdims=True) + \
                jnp.sum(jnp.sum(lpatch, 2), 1, keepdims=True)
            return
        lrow = lpatch[:, PW // 2, :]
        ldiff = lpatch - ps._center_full(lrow, PW // 2, PW, sb)
        rrow = rstrip[:, PW // 2, :]
        cost_cols = []
        for o in range(NB):
            rsh = rstrip[:, :, o:o + PW]
            rc = ps._center_full(rrow, o + PW // 2, PW, sb)
            d = jnp.abs(ldiff - (rsh - rc))
            cost_cols.append(jnp.sum(jnp.sum(d, axis=2), axis=1,
                                     keepdims=True))
        costs_ref[0] = jnp.concatenate(
            cost_cols + [jnp.zeros((sb, ps.COST_PAD - NB), jnp.float32)], 1)
    return kern


def main():
    H, W = 240, 320
    B = 16
    seq = make_stereo_sequence(seed=1, n_frames=B, h=H, w=W, n_points=800)
    fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16)
    T = fe._tables
    lefts = jnp.asarray(np.stack(seq.lefts))
    rights = jnp.asarray(np.stack(seq.rights))
    imgs = jnp.concatenate([lefts, rights], 0)
    mbf = jnp.float32(seq.bf)
    min_z = jnp.float32(seq.baseline)

    @jax.jit
    def front(ims):
        res, _raw, bands = fe._extract_batch_core(T, ims)
        return res, bands

    res, bands = jax.block_until_ready(front(imgs))
    L = jax.tree_util.tree_map(lambda a: a[:B], res)
    R = jax.tree_util.tree_map(lambda a: a[B:], res)
    bh, bw = fe.band_hw
    bw_r = 128
    bands = jax.block_until_ready(jnp.copy(bands))
    br128 = jax.block_until_ready(
        jnp.pad(bands[B:], ((0, 0), (0, 0), (0, 0), (0, bw_r - bw))))

    # meta exactly as production builds it
    c = jax.vmap(lambda l, r: st._coarse_match(
        l, r, T["scales"], T["inv_scales"], T["widths"], mbf, min_z))(L, R)
    from jetson_slam_tpu.ops.bands import MARGIN
    xl, xr, yy, lvl = c["xl"], c["xr"], c["yy"], L.octave
    K = fe.n_slots_padded
    th = jnp.take(T["lvl_tile_h"], lvl)
    tw = jnp.take(T["lvl_tile_w"], lvl)
    tyr = yy // th
    txr = xr // tw
    slot_r = jnp.clip(jnp.take(T["lvl_off"], lvl)
                      + tyr * jnp.take(T["lvl_ntw"], lvl) + txr, 0, K - 1)
    oy_l = yy - T["band_y0"][None] + (MARGIN - st.PATCH_HALF)
    ox_l = xl - T["band_x0"][None] + (MARGIN - st.PATCH_HALF)
    oy_r = yy - tyr * th + (MARGIN - st.PATCH_HALF)
    ox_r = xr - txr * tw + (MARGIN - st.PATCH_HALF - st.NBR_HALF)
    zero = jnp.zeros_like(slot_r)
    meta = jax.block_until_ready(jnp.stack(
        [oy_l, ox_l, slot_r, oy_r, ox_r, zero, zero, zero],
        axis=-1).astype(jnp.int32))

    sb = 128
    pad_l = fe._max_tiles_w - 1
    win = min(-(-(sb + pad_l + 7) // 8) * 8, K)
    hi = ps.ROW0 + max(int(max(fe.geom.tile_h)), int(max(fe.geom.tile_w))) \
        + ps.PATCH_W - 1
    span = min(-(-(hi - ps.ROW0A) // 8) * 8, bh - ps.ROW0A)
    brf = br128.reshape(B, K, bh * bw_r)

    for stage in ("dma", "left", "select", "strip", "full"):
        kern = make_kernel(stage, span, win, pad_l, K, bw, bw_r, sb)

        @partial(jax.jit, static_argnums=())
        def run(m, bl, br):
            return pl.pallas_call(
                kern,
                grid=(B, K // sb),
                in_specs=[
                    pl.BlockSpec((1, sb, 8), lambda b, j: (b, j, 0)),
                    pl.BlockSpec((1, sb, bh, bw), lambda b, j: (b, j, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((1, sb, ps.COST_PAD),
                                       lambda b, j: (b, j, 0)),
                out_shape=jax.ShapeDtypeStruct((B, K, ps.COST_PAD),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((win, span * bw_r), jnp.uint8),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(m, bl, br)

        t = timeit(run, meta, bands, brf)
        print(f"{stage:7s}: {t:7.2f} ms")


if __name__ == "__main__":
    main()
