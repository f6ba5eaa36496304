"""Ablation profile of the batched stereo matcher (ops/stereo.py
stereo_match_bands): time the vmapped program cut off after each phase, on
the SAME inputs the fused front-end feeds it.  Complements
examples/profile_ablate.py (which stops at the descriptor stage).
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
from jetson_slam_tpu.ops import stereo as st
from jetson_slam_tpu.ops.bands import MARGIN, window_patches
from jetson_slam_tpu.ops.hamming import hamming_matrix


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
                     tile_h=16, tile_w=16, use_pallas_desc=False)
    T = fe._tables
    lefts = jnp.asarray(np.stack(seq.lefts))
    rights = jnp.asarray(np.stack(seq.rights))
    mbf = jnp.float32(seq.bf)
    min_z = jnp.float32(seq.baseline)

    # produce the stereo inputs once (device-resident)
    @jax.jit
    def front(l, r):
        res, _raw, bands = fe._extract_batch_core(
            T, jnp.concatenate([l, r], axis=0))
        L = jax.tree_util.tree_map(lambda a: a[:B], res)
        R = jax.tree_util.tree_map(lambda a: a[B:], res)
        return L, R, bands[:B], bands[B:]

    L, R, bl, br = jax.block_until_ready(front(lefts, rights))

    scales = T["scales"]
    inv_scales = T["inv_scales"]
    widths = T["widths"]

    def until(stage):
        def one(l, r, bands_l, bands_r):
            bands_l = bands_l.astype(jnp.bfloat16)
            bands_r = bands_r.astype(jnp.bfloat16)
            c = st._coarse_match(l, r, scales, inv_scales, widths, mbf, min_z)
            if stage == "coarse":
                return c["best_dist"].sum() + c["best_idx"].sum()
            xl, xr, yy, lvl = c["xl"], c["xr"], c["yy"], l.octave
            KR = bands_r.shape[0]
            th = jnp.take(T["lvl_tile_h"], lvl)
            tw = jnp.take(T["lvl_tile_w"], lvl)
            tyr = yy // th
            txr = xr // tw
            slot_r = jnp.take(T["lvl_off"], lvl) + \
                tyr * jnp.take(T["lvl_ntw"], lvl) + txr
            slot_r = jnp.clip(slot_r, 0, KR - 1)
            sel = (jnp.arange(KR, dtype=jnp.int32)[None, :] ==
                   slot_r[:, None]).astype(jnp.bfloat16)
            rb = jnp.einsum("kr,rhw->khw", sel, bands_r,
                            preferred_element_type=jnp.bfloat16)
            if stage == "rb":
                return rb.astype(jnp.float32).sum() + c["best_dist"].sum()
            oy_l = yy - T["band_y0"] + (MARGIN - st.PATCH_HALF)
            ox_l = xl - T["band_x0"] + (MARGIN - st.PATCH_HALF)
            lpatch = window_patches(bands_l, oy_l, ox_l,
                                    st.PATCH_W, st.PATCH_W)
            oy_r = yy - tyr * th + (MARGIN - st.PATCH_HALF)
            ox_r = xr - txr * tw + (MARGIN - st.PATCH_HALF - st.NBR_HALF)
            rstrip = window_patches(rb, oy_r, ox_r, st.PATCH_W,
                                    st.PATCH_W + st.NBRHOOD - 1)
            if stage == "patches":
                return lpatch.sum() + rstrip.sum() + c["best_dist"].sum()
            costs = st._neighborhood_costs(lpatch, rstrip)
            if stage == "costs":
                return costs.sum() + c["best_dist"].sum()
            u_right, depth = st._refine_and_prune(costs, c, mbf)
            return u_right.sum() + depth.sum()

        @jax.jit
        def run(L, R, bl, br):
            return jax.vmap(one)(L, R, bl, br)
        return run

    # also: hamming alone
    @jax.jit
    def ham(L, R):
        return jax.vmap(hamming_matrix)(L.desc, R.desc).sum()

    prev = 0.0
    for stage in ("coarse", "rb", "patches", "costs", "refine"):
        ms = timeit(until(stage), L, R, bl, br)
        print(f"through {stage:8s}: {ms:7.2f} ms  (+{ms - prev:6.2f})")
        prev = ms
    print(f"hamming alone  : {timeit(ham, L, R):7.2f} ms")
    print("(each row includes the ~24 ms tunnel RTT once; B=16 frames)")


if __name__ == "__main__":
    main()
