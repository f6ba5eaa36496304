"""Bisect OrbFrontend._extract_impl: cumulative stage timings in ONE jit."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from jetson_slam_tpu.ops import frontend as F
from jetson_slam_tpu.ops.frontend import OrbFrontend

H, W = 240, 320
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                 tile_h=16, tile_w=16)
g = fe.geom


def build(upto):
    def impl(img_u8):
        pyr = fe.compute_pyramid(img_u8)
        if upto == "pyr":
            return pyr
        outs = []
        xs_l, ys_l, s_l, score_l = [], [], [], []
        for i in range(g.n_levels):
            score = F.fast_score_map(pyr[i], fe.lut, fe.threshold, None)
            score_l.append(score)
        if upto == "score":
            return score_l
        for i in range(g.n_levels):
            x, y, s = F.nms_lg(score_l[i], g.tile_h[i], g.tile_w[i])
            xs_l.append(x); ys_l.append(y); s_l.append(s)
        if upto == "nms":
            return xs_l, ys_l, s_l
        if upto == "sub":
            subs = [F.subpixel_offsets(score_l[i], xs_l[i], ys_l[i])
                    for i in range(g.n_levels)]
            return subs
        if upto == "ang":
            return [F.ic_angles(pyr[i], xs_l[i], ys_l[i]) for i in range(g.n_levels)]
        if upto == "blur":
            return [F.gaussian_blur(pyr[i], fe.gauss) for i in range(g.n_levels)]
        if upto == "desc":
            out = []
            for i in range(g.n_levels):
                a = F.ic_angles(pyr[i], xs_l[i], ys_l[i])
                blur = F.gaussian_blur(pyr[i], fe.gauss)
                out.append(F.orb_descriptors(blur, xs_l[i], ys_l[i], a))
            return out
        raise ValueError(upto)
    return jax.jit(impl)


def bench(name, fn, n=30):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


for stage in ["pyr", "score", "nms", "sub", "ang", "blur", "desc"]:
    f = build(stage)
    bench(f"upto {stage}", lambda f=f: f(img))

bench("extract full", lambda: fe._extract(img))
