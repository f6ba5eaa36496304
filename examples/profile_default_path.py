"""Cut-off ablation of the PRODUCTION front-end path (Pallas FAST + Pallas
descriptor + Pallas stereo + matmul band extraction) — profile_ablate.py
covers the XLA fallback path; this one attributes the default TPU pipeline.
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
from jetson_slam_tpu.ops.frontend import OrbFrontend, nms_lg
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
    seq = make_stereo_sequence(seed=1, n_frames=16, h=H, w=W, n_points=800)
    fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16)
    T = fe._tables
    lefts = jnp.asarray(np.stack(seq.lefts))
    rights = jnp.asarray(np.stack(seq.rights))
    imgs = jnp.concatenate([lefts, rights], 0)
    g = fe.geom
    B, L = imgs.shape[0], g.n_levels
    H0, W0 = fe._h0w0
    Kp = fe.n_slots_padded
    mbf = jnp.float32(seq.bf)
    min_z = jnp.float32(seq.baseline)
    BF = B // 2

    def until(stage):
        @jax.jit
        def run(imgs_u8):
            pyr = fe._pyramid_batch(T, imgs_u8)
            if stage == "pyramid":
                return sum(p.astype(jnp.int32).sum() for p in pyr)
            raw_stack = jnp.zeros((B, L, H0, W0), jnp.uint8)
            for i in range(L):
                raw_stack = raw_stack.at[
                    :, i, :g.heights[i], :g.widths[i]].set(pyr[i])
            from jetson_slam_tpu.ops.pallas_frontend import (
                fast_score_nms_pallas)
            roi = jnp.tile(T["roi_l"], (B, 1))
            raw_s, nms_s = fast_score_nms_pallas(
                raw_stack.reshape(B * L, H0, W0), roi, fe.threshold,
                fe.fast_n_min, fe.fast_n_max,
                interpret=fe._pallas_interpret)
            if stage == "fast":
                return raw_s.sum() + nms_s.sum()
            nms_stack = nms_s.reshape(B, L, H0, W0)
            score_stack = raw_s.reshape(B, L, H0, W0)
            xs_l, ys_l, s_l = [], [], []
            for i in range(L):
                x, y, s = nms_lg(nms_stack[:, i, :g.heights[i], :g.widths[i]],
                                 g.tile_h[i], g.tile_w[i], fuse_nms_l=False)
                xs_l.append(x); ys_l.append(y); s_l.append(s)
            pad = Kp - fe.n_slots
            zpad = jnp.zeros((B, pad), jnp.int32)
            kp_x = jnp.concatenate(xs_l + [zpad], 1)
            kp_y = jnp.concatenate(ys_l + [zpad], 1)
            kp_s = jnp.concatenate(s_l + [zpad], 1)
            if stage == "nmsg":
                return kp_x.sum() + kp_y.sum()
            sl, sr, su, sd = fe._subpixel_scores(
                T, score_stack, kp_x, kp_y)
            if stage == "subpixel":
                return sl.sum() + sr.sum() + su.sum() + sd.sum()
            bands_u8 = fe._extract_bands(pyr)
            if stage == "bands":
                return bands_u8.astype(jnp.int32).sum() + kp_x.sum()
            from jetson_slam_tpu.ops.pallas_descriptor import (
                orb_descriptors_pallas)
            oy = kp_y - T["band_y0"][None, :]
            ox = kp_x - T["band_x0"][None, :]
            meta = jnp.concatenate([
                oy[..., None], ox[..., None],
                jnp.broadcast_to(T["slot_meta"][None], (B, Kp, 6)),
            ], axis=-1).astype(jnp.int32)
            bh, bw = fe.band_hw
            desc_i, mom = orb_descriptors_pallas(
                bands_u8.reshape(B * Kp, bh, bw), meta.reshape(B * Kp, 8),
                interpret=fe._pallas_interpret)
            ang = jnp.arctan2(mom.reshape(B, Kp, 8)[..., 1],
                              mom.reshape(B, Kp, 8)[..., 0])
            if stage == "desc":
                return desc_i.sum() + ang.sum()
            # full front-end results for stereo
            res, _raw, bands2 = fe._extract_batch_core(T, imgs_u8)
            Lr = jax.tree_util.tree_map(lambda a: a[:BF], res)
            Rr = jax.tree_util.tree_map(lambda a: a[BF:], res)
            if stage == "extract":
                return res.desc.astype(jnp.int32).sum()
            u_r, depth, dist = fe._stereo_batch(
                T, Lr, Rr, bands2[:BF], bands2[BF:], mbf, min_z)
            return u_r.sum() + depth.sum()
        return run

    prev = 0.0
    for stage in ("pyramid", "fast", "nmsg", "subpixel", "bands", "desc",
                  "extract", "stereo"):
        ms = timeit(until(stage), imgs)
        print(f"through {stage:9s}: {ms:7.2f} ms  (+{ms - prev:6.2f})")
        prev = ms
    print("(each row includes the ~24 ms tunnel RTT once; note the "
          "'extract' row RE-RUNS the pipeline via _extract_batch_core, so "
          "its delta vs 'desc' is the duplicated prefix cost)")


if __name__ == "__main__":
    main()
