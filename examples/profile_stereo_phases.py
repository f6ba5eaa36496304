"""Phase attribution for the batched Pallas stereo path: coarse gate,
cost kernel, refine/prune — each timed on pre-materialized inputs."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops.frontend import OrbFrontend
from jetson_slam_tpu.ops import stereo as st
from jetson_slam_tpu.ops.pallas_stereo import stereo_costs_pallas


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
    bands = jax.block_until_ready(jnp.copy(bands))
    bands_r128 = jax.block_until_ready(
        jax.jit(lambda r: fe._extract_bands_r128(T, r))(rights))

    def coarse_meta(Lr, Rr):
        c = jax.vmap(lambda l, r: st._coarse_match(
            l, r, T["scales"], T["inv_scales"], T["widths"], mbf,
            min_z))(Lr, Rr)
        xl, xr, yy, lvl = c["xl"], c["xr"], c["yy"], Lr.octave
        K = fe.n_slots_padded
        th = jnp.take(T["lvl_tile_h"], lvl)
        tw = jnp.take(T["lvl_tile_w"], lvl)
        tyr = yy // th
        txr = xr // tw
        slot_r = jnp.take(T["lvl_off"], lvl) + tyr * jnp.take(
            T["lvl_ntw"], lvl) + txr
        slot_r = jnp.clip(slot_r, 0, K - 1)
        from jetson_slam_tpu.ops.bands import MARGIN
        oy_l = yy - T["band_y0"][None] + (MARGIN - st.PATCH_HALF)
        ox_l = xl - T["band_x0"][None] + (MARGIN - st.PATCH_HALF)
        oy_r = yy - tyr * th + (MARGIN - st.PATCH_HALF)
        ox_r = xr - txr * tw + (MARGIN - st.PATCH_HALF - st.NBR_HALF)
        zero = jnp.zeros_like(slot_r)
        meta = jnp.stack([oy_l, ox_l, slot_r, oy_r, ox_r, zero, zero, zero],
                         axis=-1).astype(jnp.int32)
        return c, meta

    print(f"coarse+meta      : {timeit(jax.jit(coarse_meta), L, R):7.2f} ms")

    c, meta = jax.block_until_ready(jax.jit(coarse_meta)(L, R))
    mt = int(fe._max_tiles_w)
    mh = int(max(fe.geom.tile_h))
    mw = int(max(fe.geom.tile_w))

    def kern(bl, br, m):
        return stereo_costs_pallas(bl, br, m, mt, mh, mw, sb=128)

    print(f"cost kernel only : {timeit(jax.jit(kern), bands, bands_r128, meta):7.2f} ms")

    costs = jax.block_until_ready(jax.jit(kern)(bands, bands_r128, meta))

    def refine(co, cc):
        return jax.vmap(lambda a, b: st._refine_and_prune(a, b, mbf))(co, cc)

    print(f"refine+prune only: {timeit(jax.jit(refine), costs, c):7.2f} ms")


if __name__ == "__main__":
    main()
