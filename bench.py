"""Benchmark: stereo front-end frames/sec at 320x240 (the paper's headline
setting, BASELINE.md: >500 FPS on RTX-2070, >90 FPS on Jetson-NX).

Measures the full per-frame device pipeline — ORB extraction on BOTH eyes +
stereo matching — end to end including H2D image transfer, on whatever
platform JAX selects (the real TPU chip under the driver).  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} with vs_baseline relative
to the reference's 500 FPS RTX-2070 number.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.ops.frontend import OrbFrontend

    H, W = 240, 320
    seq = make_stereo_sequence(seed=1, n_frames=8, h=H, w=W, n_points=800)
    fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16)
    bf = jnp.float32(seq.bf)
    min_z = jnp.float32(seq.baseline)

    def frame_step(left, right):
        # ONE fused program: ORB both eyes + stereo match
        L, R, u_r, depth, _ = fe.frame_step(left, right, bf, min_z)
        return L, u_r, depth

    imgs = [(jnp.asarray(l), jnp.asarray(r))
            for l, r in zip(seq.lefts, seq.rights)]

    # warmup / compile
    out = frame_step(*imgs[0])
    jax.block_until_ready(out)

    n_iters = 500
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = frame_step(*imgs[i % len(imgs)])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "stereo_frontend_fps_320x240",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
