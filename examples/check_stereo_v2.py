"""Parity + sb sweep for the Pallas stereo window-correlation kernel."""
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

    def run(sb):
        @jax.jit
        def f(bl, br128, Lr, Rr):
            return st.stereo_match_bands_batch_pallas(
                Lr, Rr, bl, br128, T["band_y0"], T["band_x0"],
                T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
                T["widths"], T["scales"], T["inv_scales"], mbf, min_z,
                fe._max_tiles_w, int(max(fe.geom.tile_h)),
                int(max(fe.geom.tile_w)), sb=sb)
        return f

    # parity across sb (vs XLA band path)
    def xla_one(l, r, bl, br):
        return st.stereo_match_bands(
            l, r, bl, br, T["band_y0"], T["band_x0"],
            T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
            T["widths"], T["scales"], T["inv_scales"], mbf, min_z)

    ur_x, d_x, _ = jax.device_get(jax.jit(jax.vmap(xla_one))(
        L, R, bands[:B], bands[B:]))
    for sb in (32, 64, 128):
        ur, d, _ = jax.device_get(run(sb)(bands, bands_r128, L, R))
        m = (d_x > 0) | (d > 0)
        same = np.mean(np.abs(ur[m] - ur_x[m]) < 1e-4)
        print(f"sb={sb:4d}: u_right agreement {same:.4f} "
              f"(n={int(m.sum())}), time {timeit(run(sb), bands, bands_r128, L, R):7.2f} ms")


if __name__ == "__main__":
    main()
