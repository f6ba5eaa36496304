"""Stage-by-stage device-time profile of the stereo front-end (batched).

Times incremental pieces of the pipeline; every measurement forces
completion with a tiny device_get readback (block_until_ready is optimistic
on this platform).  The ~24 ms tunnel round-trip is included in each row.
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


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    H, W = 240, 320
    NF = 16  # frames; eyes = 2*NF
    seq = make_stereo_sequence(seed=1, n_frames=16, h=H, w=W, n_points=800)
    fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16)
    T = fe._tables
    lefts = jnp.asarray(np.stack([seq.lefts[i % 16] for i in range(NF)]))
    rights = jnp.asarray(np.stack([seq.rights[i % 16] for i in range(NF)]))
    imgs = jnp.concatenate([lefts, rights], axis=0)  # (2NF, H, W)
    g = fe.geom
    B = imgs.shape[0]
    H0, W0 = fe._h0w0
    L = g.n_levels
    Kp = fe.n_slots_padded

    @jax.jit
    def p_pyr(imgs):
        pyr = fe._pyramid_batch(T, imgs)
        raw_stack = jnp.zeros((B, L, H0, W0), jnp.uint8)
        for i in range(L):
            raw_stack = raw_stack.at[:, i, :g.heights[i], :g.widths[i]].set(pyr[i])
        return raw_stack, pyr

    raw_stack, pyr = p_pyr(imgs)

    @jax.jit
    def p_fast(raw_stack):
        from jetson_slam_tpu.ops.pallas_frontend import fast_score_nms_pallas
        roi = jnp.tile(T["roi_l"], (B, 1))
        raw_s, nms_s = fast_score_nms_pallas(
            raw_stack.reshape(B * L, H0, W0), roi, fe.threshold,
            fe.fast_n_min, interpret=fe._pallas_interpret)
        return raw_s.reshape(B, L, H0, W0), nms_s.reshape(B, L, H0, W0)

    score_stack, nms_stack = p_fast(raw_stack)

    @jax.jit
    def p_nmsg(nms_stack):
        xs_l, ys_l, s_l = [], [], []
        for i in range(L):
            x, y, s = nms_lg(nms_stack[:, i, :g.heights[i], :g.widths[i]],
                             g.tile_h[i], g.tile_w[i], fuse_nms_l=False)
            xs_l.append(x); ys_l.append(y); s_l.append(s)
        pad = Kp - fe.n_slots
        zpad = jnp.zeros((B, pad), jnp.int32)
        return (jnp.concatenate(xs_l + [zpad], axis=1),
                jnp.concatenate(ys_l + [zpad], axis=1),
                jnp.concatenate(s_l + [zpad], axis=1))

    kp_x, kp_y, kp_s = p_nmsg(nms_stack)

    p_bands = jax.jit(lambda lv: fe._extract_bands(lv).astype(jnp.bfloat16))
    bands_raw = p_bands(pyr)

    @jax.jit
    def p_sub(score_stack, kp_x, kp_y):
        base = T["lvl_base"][None, :] + kp_y * W0 + kp_x
        sc = fe._take_b(score_stack.reshape(B, -1),
                        base[:, :, None] + T["rel_sub"]).astype(jnp.float32)
        return sc

    @jax.jit
    def p_blur(raw_stack):
        sf = raw_stack.astype(jnp.float32)
        t = jnp.einsum("blhw,xw->blhx", sf, T["gx"],
                       preferred_element_type=jnp.float32)
        bl = jnp.einsum("oh,blhx->blox", T["gy"], t,
                        preferred_element_type=jnp.float32)
        return jnp.where(T["blur_interior"][None], jnp.floor(bl), sf)

    blur_stack = p_blur(raw_stack)

    @jax.jit
    def p_patches(bands_raw, kp_x, kp_y):
        wy0 = kp_y - T["band_y0"][None, :]
        wx0 = kp_x - T["band_x0"][None, :]
        return window_patches(bands_raw, wy0, wx0, DESC_PATCH, DESC_PATCH)

    patch = p_patches(bands_raw, kp_x, kp_y)

    @jax.jit
    def p_ic(patch):
        ic = patch[:, :, 4:4 + IC_PATCH, 4:4 + IC_PATCH]
        m = jnp.einsum("bkyx,yxc->bkc", ic, T["wuv2d"],
                       preferred_element_type=jnp.float32)
        return jnp.arctan2(m[..., 1], m[..., 0])

    ang = p_ic(patch)

    @jax.jit
    def p_desc(patch, ang):
        ca = jnp.cos(ang)[:, :, None]
        sa = jnp.sin(ang)[:, :, None]
        px = T["pat_x"][None, None, :]
        py = T["pat_y"][None, None, :]
        rows = jnp.round(px * sa + py * ca).astype(jnp.int32)
        cols = jnp.round(px * ca - py * sa).astype(jnp.int32)
        iota40 = jnp.arange(DESC_PATCH, dtype=jnp.int32)
        prow = (iota40 == (rows + DESC_PATCH_HALF)[..., None]).astype(jnp.bfloat16)
        pcol = (iota40 == (cols + DESC_PATCH_HALF)[..., None]).astype(jnp.bfloat16)
        t_sel = jnp.einsum("bkja,bkav->bkjv", prow, patch.astype(jnp.bfloat16),
                           preferred_element_type=jnp.bfloat16)
        samples = jnp.einsum("bkjv,bkjv->bkj", t_sel, pcol,
                             preferred_element_type=jnp.float32)
        t0 = samples[..., 0::2]
        t1 = samples[..., 1::2]
        bits = (t0 < t1).astype(jnp.int32).reshape(B, Kp, 32, 8)
        weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, None, :]
        return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)

    desc = p_desc(patch, ang)

    @jax.jit
    def p_extract(imgs):
        return fe._extract_batch_core(T, imgs)[0].desc

    full = jax.jit(lambda l, r: fe._frame_steps_impl(T, l, r,
                   jnp.float32(seq.bf), jnp.float32(seq.baseline)))

    print(f"pyramid         : {timeit(p_pyr, imgs):8.3f} ms")
    print(f"fast+nmsL pallas: {timeit(p_fast, raw_stack):8.3f} ms")
    print(f"nms-G           : {timeit(p_nmsg, nms_stack):8.3f} ms")
    print(f"bands extract   : {timeit(p_bands, pyr):8.3f} ms")
    print(f"subpixel gather : {timeit(p_sub, score_stack, kp_x, kp_y):8.3f} ms")
    print(f"gauss blur      : {timeit(p_blur, raw_stack):8.3f} ms")
    print(f"window patches  : {timeit(p_patches, bands_raw, kp_x, kp_y):8.3f} ms")
    print(f"ic angles       : {timeit(p_ic, patch):8.3f} ms")
    print(f"descriptor      : {timeit(p_desc, patch, ang):8.3f} ms")
    print(f"extract total   : {timeit(p_extract, imgs):8.3f} ms")
    print(f"FULL frame_steps: {timeit(full, lefts, rights):8.3f} ms  ({NF} frames)")
    print("(tunnel floor ~24 ms is included in each row)")


if __name__ == "__main__":
    main()
