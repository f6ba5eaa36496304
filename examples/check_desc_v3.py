"""Parity + timing check for the v3 descriptor kernel (VPU blur, chunked
rBRIEF, sb slots/program): compare against the XLA band path on the same
platform and sweep (sb, chunk) on the TPU."""
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
from jetson_slam_tpu.ops.pallas_descriptor import orb_descriptors_pallas


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
    lefts = jnp.asarray(np.stack(seq.lefts))
    rights = jnp.asarray(np.stack(seq.rights))
    imgs = jnp.concatenate([lefts, rights], 0)

    # ---- parity: pallas-desc front-end vs XLA band front-end
    fe_p = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                       tile_h=16, tile_w=16, use_pallas_desc=True)
    fe_x = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                       tile_h=16, tile_w=16, use_pallas_desc=False)
    T = fe_p._tables

    @jax.jit
    def run_p(im):
        return fe_p._extract_batch_core(T, im)[0]

    @jax.jit
    def run_x(im):
        return fe_x._extract_batch_core(fe_x._tables, im)[0]

    rp = jax.device_get(run_p(imgs))
    rx = jax.device_get(run_x(imgs))
    v = rp.valid & rx.valid
    dp = np.unpackbits(rp.desc[v], axis=-1)
    dx = np.unpackbits(rx.desc[v], axis=-1)
    ham = np.abs(dp.astype(np.int32) - dx.astype(np.int32)).sum(-1)
    ang_d = np.abs(((rp.angle - rx.angle + 180) % 360) - 180)[v]
    print(f"valid slots {int(v.sum())}; desc hamming mean "
          f"{ham.mean():.3f}/256, exact {float((ham == 0).mean()):.3f}; "
          f"angle max-abs-diff {ang_d.max():.5f} deg")

    # ---- timing sweep on materialized bands
    Kp = fe_p.n_slots_padded
    bh, bw = fe_p.band_hw

    @jax.jit
    def front(ims):
        res, _raw, bands = fe_p._extract_batch_core(T, ims)
        return res, bands

    res, bands = jax.block_until_ready(front(imgs))
    oy = res.ly - T["band_y0"][None, :]
    ox = res.lx - T["band_x0"][None, :]
    B2 = imgs.shape[0]
    meta = jnp.concatenate([
        oy[..., None], ox[..., None],
        jnp.broadcast_to(T["slot_meta"][None], (B2, Kp, 6)),
    ], axis=-1).astype(jnp.int32)
    meta = jax.block_until_ready(meta.reshape(B2 * Kp, 8))
    bflat = jax.block_until_ready(jnp.copy(bands.reshape(B2 * Kp, bh, bw)))
    for sb in (32, 64, 128):
        for chunk in (128, 256, 512):
            try:
                t = timeit(lambda b, m, s=sb, c=chunk: orb_descriptors_pallas(
                    b, m, sb=s, chunk=c), bflat, meta)
                print(f"sb={sb:4d} chunk={chunk:4d}: {t:7.2f} ms")
            except Exception as e:
                print(f"sb={sb:4d} chunk={chunk:4d}: FAIL "
                      f"{type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
