"""Ablation profile of the FUSED front-end program: time the whole fused
extract / frame_steps with selected stages stubbed out, to attribute device
time inside the fused program (per-stage jits over-count work XLA would have
fused away).  Every timing forces completion with a device_get readback.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops.frontend import (OrbFrontend, nms_lg, IC_PATCH,
                                          DESC_PATCH, DESC_PATCH_HALF)
from jetson_slam_tpu.ops import tables
from jetson_slam_tpu.ops.bands import window_patches


def timeit(fn, *args, iters=20):
    """Min over iters: the tunnel RTT has one-sided jitter, so the minimum
    is the stable statistic for comparing program variants."""
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
    NF = 16
    seq = make_stereo_sequence(seed=1, n_frames=16, h=H, w=W, n_points=800)
    fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16)
    T = fe._tables
    lefts = jnp.asarray(np.stack([seq.lefts[i % 16] for i in range(NF)]))
    rights = jnp.asarray(np.stack([seq.rights[i % 16] for i in range(NF)]))
    imgs = jnp.concatenate([lefts, rights], axis=0)
    g = fe.geom
    B = imgs.shape[0]
    H0, W0 = fe._h0w0
    L = g.n_levels
    Kp = fe.n_slots_padded

    def core_until(stage):
        """Re-run _extract_batch_core's stages up to `stage` and return a
        small live output, so XLA cannot dead-code-eliminate the work."""

        @jax.jit
        def run(imgs_u8):
            pyr = fe._pyramid_batch(T, imgs_u8)
            raw_stack = jnp.zeros((B, L, H0, W0), jnp.uint8)
            for i in range(L):
                raw_stack = raw_stack.at[:, i, :g.heights[i], :g.widths[i]].set(pyr[i])
            if stage == "pyramid":
                return raw_stack.astype(jnp.int32).sum()
            from jetson_slam_tpu.ops.pallas_frontend import fast_score_nms_pallas
            roi = jnp.tile(T["roi_l"], (B, 1))
            raw_s, nms_s = fast_score_nms_pallas(
                raw_stack.reshape(B * L, H0, W0), roi, fe.threshold,
                fe.fast_n_min, interpret=fe._pallas_interpret)
            score_stack = raw_s.reshape(B, L, H0, W0)
            nms_stack = nms_s.reshape(B, L, H0, W0)
            if stage == "fast":
                return score_stack.sum() + nms_stack.sum()
            xs_l, ys_l, s_l = [], [], []
            for i in range(L):
                x, y, s = nms_lg(nms_stack[:, i, :g.heights[i], :g.widths[i]],
                                 g.tile_h[i], g.tile_w[i], fuse_nms_l=False)
                xs_l.append(x); ys_l.append(y); s_l.append(s)
            pad = Kp - fe.n_slots
            zpad = jnp.zeros((B, pad), jnp.int32)
            kp_x = jnp.concatenate(xs_l + [zpad], axis=1)
            kp_y = jnp.concatenate(ys_l + [zpad], axis=1)
            kp_s = jnp.concatenate(s_l + [zpad], axis=1)
            if stage == "nmsg":
                return kp_x.sum() + kp_y.sum() + kp_s.sum()
            bands_raw = fe._extract_bands(pyr).astype(jnp.bfloat16)
            if stage == "bands":
                return kp_x.sum() + bands_raw.astype(jnp.float32).sum()
            sf = raw_stack.astype(jnp.float32)
            t = jnp.einsum("blhw,xw->blhx", sf, T["gx"],
                           preferred_element_type=jnp.float32)
            bl = jnp.einsum("oh,blhx->blox", T["gy"], t,
                            preferred_element_type=jnp.float32)
            blur_stack = jnp.where(T["blur_interior"][None], jnp.floor(bl), sf)
            blur_lvls = [blur_stack[:, i, :g.heights[i], :g.widths[i]].astype(
                jnp.bfloat16) for i in range(L)]
            bands_blur = fe._extract_bands(blur_lvls)
            if stage == "blur":
                return kp_x.sum() + bands_raw.astype(jnp.float32).sum() + \
                    bands_blur.astype(jnp.float32).sum()
            wy0 = kp_y - T["band_y0"][None, :]
            wx0 = kp_x - T["band_x0"][None, :]
            patch_raw = window_patches(bands_raw, wy0, wx0,
                                       DESC_PATCH, DESC_PATCH)
            patch_blur = window_patches(bands_blur, wy0, wx0,
                                        DESC_PATCH, DESC_PATCH)
            if stage == "patches":
                return patch_raw.sum() + patch_blur.sum()
            hp_off = DESC_PATCH_HALF - tables.HALF_PATCH_SIZE
            ic = patch_raw[:, :, hp_off:hp_off + IC_PATCH,
                           hp_off:hp_off + IC_PATCH]
            mm = jnp.einsum("bkyx,yxc->bkc", ic, T["wuv2d"],
                            preferred_element_type=jnp.float32)
            ang = jnp.arctan2(mm[..., 1], mm[..., 0])
            if stage == "ic":
                return ang.sum() + patch_blur.sum()
            ca = jnp.cos(ang)[:, :, None]
            sa = jnp.sin(ang)[:, :, None]
            px = T["pat_x"][None, None, :]
            py = T["pat_y"][None, None, :]
            rows = jnp.round(px * sa + py * ca).astype(jnp.int32)
            cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
            iota40 = jnp.arange(DESC_PATCH, dtype=jnp.int32)
            prow = (iota40 == (rows + DESC_PATCH_HALF)[..., None]).astype(jnp.bfloat16)
            pcol = (iota40 == (cols + DESC_PATCH_HALF)[..., None]).astype(jnp.bfloat16)
            t_sel = jnp.einsum("bkja,bkav->bkjv", prow,
                               patch_blur.astype(jnp.bfloat16),
                               preferred_element_type=jnp.bfloat16)
            samples = jnp.einsum("bkjv,bkjv->bkj", t_sel, pcol,
                                 preferred_element_type=jnp.float32)
            t0_ = samples[..., 0::2]
            t1_ = samples[..., 1::2]
            bits = (t0_ < t1_).astype(jnp.int32).reshape(B, Kp, 32, 8)
            weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, None, :]
            desc = jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)
            return desc.astype(jnp.int32).sum() + ang.sum()

        return run

    full = jax.jit(lambda l, r: fe._frame_steps_impl(T, l, r,
                   jnp.float32(seq.bf), jnp.float32(seq.baseline)))
    extract = jax.jit(lambda im: fe._extract_batch_core(T, im)[0].desc)

    prev = 0.0
    for stage in ("pyramid", "fast", "nmsg", "bands", "blur", "patches",
                  "ic", "desc"):
        ms = timeit(core_until(stage), imgs)
        print(f"through {stage:8s}: {ms:8.2f} ms  (+{ms - prev:6.2f})")
        prev = ms
    e = timeit(extract, imgs)
    print(f"extract(full)    : {e:8.2f} ms")
    f = timeit(full, lefts, rights)
    print(f"frame_steps(full): {f:8.2f} ms   -> stereo adds {f - e:6.2f}")
    print("(each row includes the ~24 ms tunnel RTT once)")


if __name__ == "__main__":
    main()
