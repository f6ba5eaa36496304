"""Ablation profile of the FUSED front-end program on the live structure:
time the pipeline cut off after each stage, so device time is attributed
WITHIN the fused program (per-stage jits over-count work XLA fuses away).

Methodology: min over 20 repetitions (the tunnel RTT has one-sided jitter),
every measurement forced by a device_get readback.  Each row includes the
~24 ms tunnel round-trip once; subtract it for device time.
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
from jetson_slam_tpu.ops.frontend import OrbFrontend, nms_lg, IC_PATCH
from jetson_slam_tpu.ops import tables
from jetson_slam_tpu.ops.bands import MARGIN


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
                     tile_h=16, tile_w=16, use_pallas_desc=False)
    T = fe._tables
    lefts = jnp.asarray(np.stack(seq.lefts))
    rights = jnp.asarray(np.stack(seq.rights))
    imgs = jnp.concatenate([lefts, rights], 0)
    g = fe.geom
    B, L = imgs.shape[0], g.n_levels
    H0, W0 = fe._h0w0
    Kp = fe.n_slots_padded
    bh, bw = fe.band_hw

    def until(stage):
        @jax.jit
        def run(imgs_u8):
            pyr = fe._pyramid_batch(T, imgs_u8)
            raw_stack = jnp.zeros((B, L, H0, W0), jnp.uint8)
            for i in range(L):
                raw_stack = raw_stack.at[
                    :, i, :g.heights[i], :g.widths[i]].set(pyr[i])
            from jetson_slam_tpu.ops.pallas_frontend import fast_score_nms_pallas
            roi = jnp.tile(T["roi_l"], (B, 1))
            raw_s, nms_s = fast_score_nms_pallas(
                raw_stack.reshape(B * L, H0, W0), roi, fe.threshold,
                fe.fast_n_min, fe.fast_n_max,
                interpret=fe._pallas_interpret)
            nms_stack = nms_s.reshape(B, L, H0, W0)
            if stage == "fast":
                return raw_s.sum() + nms_s.sum()
            xs_l, ys_l, s_l = [], [], []
            for i in range(L):
                x, y, s = nms_lg(nms_stack[:, i, :g.heights[i], :g.widths[i]],
                                 g.tile_h[i], g.tile_w[i], fuse_nms_l=False)
                xs_l.append(x); ys_l.append(y); s_l.append(s)
            pad = Kp - fe.n_slots
            zpad = jnp.zeros((B, pad), jnp.int32)
            kp_x = jnp.concatenate(xs_l + [zpad], 1)
            kp_y = jnp.concatenate(ys_l + [zpad], 1)
            if stage == "nmsg":
                return kp_x.sum() + kp_y.sum()
            bands_u8 = fe._extract_bands(pyr)
            if stage == "bands":
                return kp_x.sum() + bands_u8.astype(jnp.int32).sum()
            bf32 = bands_u8.astype(jnp.float32)
            tb = jnp.einsum("bkhw,xw->bkhx", bf32, T["band_gx"],
                            preferred_element_type=jnp.float32)
            blb = jnp.einsum("oh,bkhx->bkox", T["band_gy"], tb,
                             preferred_element_type=jnp.float32)
            bands_blur = jnp.where(T["band_interior"][None], jnp.floor(blb),
                                   bf32).astype(jnp.bfloat16)
            if stage == "blur":
                return kp_x.sum() + bands_blur.astype(jnp.float32).sum()
            oy = kp_x * 0 + (kp_y - T["band_y0"][None, :])
            ox = kp_x - T["band_x0"][None, :]
            bands_raw = bands_u8.astype(jnp.bfloat16)
            iota_bh = jnp.arange(bh, dtype=jnp.int32)
            iota_bw = jnp.arange(bw, dtype=jnp.int32)
            u31 = jnp.arange(IC_PATCH, dtype=jnp.int32)
            r31 = (oy + (MARGIN - tables.HALF_PATCH_SIZE))[..., None] + u31
            c31 = (ox + (MARGIN - tables.HALF_PATCH_SIZE))[..., None] + u31
            R31 = (iota_bh == r31[..., None]).astype(jnp.bfloat16)
            C31 = (iota_bw == c31[..., None]).astype(jnp.bfloat16)
            strips = jnp.einsum("bkua,bkaw->bkuw", R31, bands_raw,
                                preferred_element_type=jnp.float32)
            patch31 = jnp.einsum("bkuw,bkvw->bkuv",
                                 strips.astype(jnp.bfloat16), C31,
                                 preferred_element_type=jnp.float32)
            mom = jnp.einsum("bkuv,uvc->bkc", patch31, T["wuv2d"],
                             preferred_element_type=jnp.float32)
            ang = jnp.arctan2(mom[..., 1], mom[..., 0])
            if stage == "ic":
                return ang.sum() + bands_blur.astype(jnp.float32).sum()
            ca = jnp.cos(ang)[:, :, None]
            sa = jnp.sin(ang)[:, :, None]
            px = T["pat_x"][None, None, :]
            py = T["pat_y"][None, None, :]
            rows = jnp.round(px * sa + py * ca).astype(jnp.int32)
            cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
            prow = (iota_bh == (rows + MARGIN + oy[..., None])[..., None]
                    ).astype(jnp.bfloat16)
            pcol = (iota_bw == (cols + MARGIN + ox[..., None])[..., None]
                    ).astype(jnp.bfloat16)
            t_sel = jnp.einsum("bkja,bkaw->bkjw", prow, bands_blur,
                               preferred_element_type=jnp.bfloat16)
            samples = jnp.einsum("bkjw,bkjw->bkj", t_sel, pcol,
                                 preferred_element_type=jnp.float32)
            t0_ = samples[..., 0::2]
            t1_ = samples[..., 1::2]
            bits = (t0_ < t1_).astype(jnp.int32).reshape(B, Kp, 32, 8)
            weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, None, :]
            desc = jnp.sum(bits * weights, -1).astype(jnp.uint8)
            return desc.astype(jnp.int32).sum() + ang.sum()
        return run

    extract = jax.jit(lambda im: fe._extract_batch_core(T, im)[0].desc)
    full = jax.jit(lambda l, r: fe._frame_steps_impl(
        T, l, r, jnp.float32(seq.bf), jnp.float32(seq.baseline)))

    prev = 0.0
    for stage in ("fast", "nmsg", "bands", "blur", "ic", "desc"):
        ms = timeit(until(stage), imgs)
        print(f"through {stage:6s}: {ms:7.2f} ms  (+{ms - prev:6.2f})")
        prev = ms
    print(f"extract(full) : {timeit(extract, imgs):7.2f} ms")
    print(f"full w/stereo : {timeit(full, lefts, rights):7.2f} ms  (16 frames)")
    print("(each row includes the ~24 ms tunnel RTT once)")


if __name__ == "__main__":
    main()
