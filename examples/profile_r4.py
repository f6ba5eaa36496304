"""Targeted micro-attribution of the two remaining front-end costs (round 4):
the descriptor stage (+13.8 ms in context) and the stereo stage (+11.3 ms),
each timed piecewise on pre-materialized device inputs.
"""
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
    Kp = fe.n_slots_padded
    bh, bw = fe.band_hw
    print(f"Kp={Kp} band={bh}x{bw} B2={imgs.shape[0]}")

    # ---- materialized inputs for each piece
    @jax.jit
    def front(ims):
        res, _raw, bands = fe._extract_batch_core(T, ims)
        return res, bands

    res, bands = jax.block_until_ready(front(imgs))
    L = jax.tree_util.tree_map(lambda a: a[:B], res)
    R = jax.tree_util.tree_map(lambda a: a[B:], res)
    bands = jax.block_until_ready(jnp.copy(bands))

    # pyramid alone (for the r128 double-pyramid cost)
    pyr_t = timeit(jax.jit(lambda im: [p.astype(jnp.int32).sum()
                                       for p in fe._pyramid_batch(T, im)]),
                   rights)
    print(f"pyramid(B=16 rights)           : {pyr_t:7.2f} ms")

    # bands materialized (the desc kernel's input view)
    bands_mat = timeit(jax.jit(
        lambda im: fe._extract_bands(fe._pyramid_batch(T, im))), imgs)
    print(f"bands materialized (2B)        : {bands_mat:7.2f} ms")

    # r128 right bands materialized
    r128_t = timeit(jax.jit(lambda r: fe._extract_bands_r128(T, r)), rights)
    print(f"r128 right bands (B)           : {r128_t:7.2f} ms")

    # desc kernel on pre-materialized bands
    from jetson_slam_tpu.ops.pallas_descriptor import orb_descriptors_pallas
    oy = res.ly - T["band_y0"][None, :]
    ox = res.lx - T["band_x0"][None, :]
    B2 = imgs.shape[0]
    meta = jnp.concatenate([
        oy[..., None], ox[..., None],
        jnp.broadcast_to(T["slot_meta"][None], (B2, Kp, 6)),
    ], axis=-1).astype(jnp.int32)
    meta = jax.block_until_ready(meta.reshape(B2 * Kp, 8))
    bflat = jax.block_until_ready(jnp.copy(bands.reshape(B2 * Kp, bh, bw)))
    desc_t = timeit(jax.jit(lambda b, m: orb_descriptors_pallas(b, m)),
                    bflat, meta)
    print(f"desc kernel (materialized in)  : {desc_t:7.2f} ms")

    # stereo: coarse only
    from jetson_slam_tpu.ops import stereo as st

    @jax.jit
    def coarse_only(Lr, Rr):
        c = jax.vmap(lambda l, r: st._coarse_match(
            l, r, T["scales"], T["inv_scales"], T["widths"], mbf, min_z))(
                Lr, Rr)
        return c["best_idx"].sum() + c["best_dist"].sum()

    print(f"stereo coarse (B)              : {timeit(coarse_only, L, R):7.2f} ms")

    # stereo kernel on pre-materialized bands
    bands_r128 = jax.block_until_ready(
        jax.jit(lambda r: fe._extract_bands_r128(T, r))(rights))

    @jax.jit
    def kernel_only(bl, br128, Lr, Rr):
        return st.stereo_match_bands_batch_pallas(
            Lr, Rr, bl, br128, T["band_y0"], T["band_x0"],
            T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
            T["widths"], T["scales"], T["inv_scales"], mbf, min_z,
            fe._max_tiles_w, int(max(fe.geom.tile_h)),
            int(max(fe.geom.tile_w)))[0]

    print(f"stereo coarse+kernel+refine    : "
          f"{timeit(kernel_only, bands, bands_r128, L, R):7.2f} ms")

    # full stereo stage as the production path runs it
    @jax.jit
    def stereo_stage(bl, r_u8, Lr, Rr):
        return fe._stereo_batch(T, Lr, Rr, bl, None, mbf, min_z,
                                rights_u8=r_u8)[0]

    print(f"stereo full (incl r128 build)  : "
          f"{timeit(stereo_stage, bands, rights, L, R):7.2f} ms")


if __name__ == "__main__":
    main()
