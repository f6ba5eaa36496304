"""Per-stage timing inside OrbFrontend._extract_impl on the live backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops import frontend as F
from jetson_slam_tpu.ops.frontend import OrbFrontend

H, W = 240, 320
seq = make_stereo_sequence(seed=1, n_frames=2, h=H, w=W, n_points=800)
fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                 tile_h=16, tile_w=16)
g = fe.geom
img = jnp.asarray(seq.lefts[0])


def bench(name, fn, n=50):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


pyr_j = jax.jit(fe.compute_pyramid)
pyr = jax.block_until_ready(pyr_j(img))
bench("pyramid (4 lvls)", lambda: pyr_j(img))

score_j = jax.jit(lambda im: F.fast_score_map(im, fe.lut, fe.threshold))
score = jax.block_until_ready(score_j(pyr[0]))
bench("fast_score lvl0", lambda: score_j(img))

nms_j = jax.jit(lambda s: F.nms_lg(s, g.tile_h[0], g.tile_w[0]))
x, y, s = jax.block_until_ready(nms_j(score))
bench("nms_lg lvl0", lambda: nms_j(score))

sub_j = jax.jit(F.subpixel_offsets)
bench("subpixel lvl0", lambda: sub_j(score, x, y))

ang_j = jax.jit(F.ic_angles)
a = jax.block_until_ready(ang_j(pyr[0], x, y))
bench(f"ic_angles lvl0 (K={x.shape[0]})", lambda: ang_j(pyr[0], x, y))

blur_j = jax.jit(lambda im: F.gaussian_blur(im, fe.gauss))
blur = jax.block_until_ready(blur_j(pyr[0]))
bench("gaussian lvl0", lambda: blur_j(pyr[0]))

desc_j = jax.jit(F.orb_descriptors)
bench("descriptors lvl0", lambda: desc_j(blur, x, y, a))

ext = fe._extract
bench("extract full", lambda: ext(img), n=20)
