"""Micro-bench: current slice-stack band extraction vs constant one-hot
matmul extraction (MXU) for the full 4-level pyramid at B=32 eyes."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.ops import tables
from jetson_slam_tpu.ops.bands import MARGIN, band_shape, extract_tile_bands


def timeit(fn, *a, iters=20):
    out = fn(*a)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def row_selector(H, n_ty, th, bh):
    """(n_ty*bh, H) one-hot: band row (ty, u) <- image row ty*th - M + u."""
    R = np.zeros((n_ty * bh, H), np.float32)
    for ty in range(n_ty):
        for u in range(bh):
            r = ty * th - MARGIN + u
            if 0 <= r < H:
                R[ty * bh + u, r] = 1.0
    return R


def col_selector(W, n_tx, tw, bw):
    C = np.zeros((W, n_tx * bw), np.float32)
    for tx in range(n_tx):
        for v in range(bw):
            c = tx * tw - MARGIN + v
            if 0 <= c < W:
                C[c, tx * bw + v] = 1.0
    return C


def main():
    g = tables.pyramid_geometry(240, 320, 4, 1.2, 16, 16, False)
    bh, bw = band_shape(g.tile_h, g.tile_w)
    B = 32
    rng = np.random.default_rng(0)
    levels = [jnp.asarray(rng.integers(0, 255, (B, g.heights[i], g.widths[i])
                                       ).astype(np.uint8))
              for i in range(g.n_levels)]

    @jax.jit
    def current(*lv):
        parts = []
        for i in range(g.n_levels):
            parts.append(extract_tile_bands(
                lv[i], g.tile_h[i], g.tile_w[i],
                g.n_tiles_h[i], g.n_tiles_w[i], bh, bw))
        return jnp.concatenate(parts, axis=1)

    Rsel = [jnp.asarray(row_selector(g.heights[i], g.n_tiles_h[i],
                                     g.tile_h[i], bh).astype(np.float32))
            for i in range(g.n_levels)]
    Csel = [jnp.asarray(col_selector(g.widths[i], g.n_tiles_w[i],
                                     g.tile_w[i], bw).astype(np.float32))
            for i in range(g.n_levels)]

    @jax.jit
    def matmul(*lv):
        parts = []
        for i in range(g.n_levels):
            img = lv[i].astype(jnp.bfloat16)
            rows = jnp.einsum("rH,bHW->brW", Rsel[i].astype(jnp.bfloat16),
                              img, preferred_element_type=jnp.float32)
            full = jnp.einsum("brW,Wc->brc", rows.astype(jnp.bfloat16),
                              Csel[i].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            n_ty, n_tx = g.n_tiles_h[i], g.n_tiles_w[i]
            bands = full.reshape(B, n_ty, bh, n_tx, bw).transpose(
                0, 1, 3, 2, 4).reshape(B, n_ty * n_tx, bh, bw)
            parts.append(bands.astype(jnp.uint8))
        return jnp.concatenate(parts, axis=1)

    ms_cur = timeit(current, *levels)
    ms_mm = timeit(matmul, *levels)
    print(f"current slice-stack: {ms_cur:7.2f} ms (incl ~24 RTT)")
    print(f"one-hot matmul     : {ms_mm:7.2f} ms (incl ~24 RTT)")
    a = jax.device_get(current(*levels))
    b = jax.device_get(matmul(*levels))
    print("equal:", np.array_equal(a, b))


if __name__ == "__main__":
    main()
