"""Micro-profile of the per-frame front-end stages on the live backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops.frontend import OrbFrontend
from jetson_slam_tpu.ops.stereo import stereo_match, stack_pyramid

H, W = 240, 320
seq = make_stereo_sequence(seed=1, n_frames=4, h=H, w=W, n_points=800)
fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                 tile_h=16, tile_w=16)
geom = fe.geom
widths = np.asarray(geom.widths, np.int32)
scales = np.asarray(geom.scales, np.float32)
inv_scales = np.asarray(geom.inv_scales, np.float32)

extract = fe._extract
pyr_fn = jax.jit(lambda im: stack_pyramid(fe.compute_pyramid(im), H, W))

imgs = [(jnp.asarray(l), jnp.asarray(r)) for l, r in zip(seq.lefts, seq.rights)]
l0, r0 = imgs[0]

def bench(name, fn, n=30):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:30s} {dt:8.2f} ms")
    return dt

# noop dispatch latency
tiny = jax.jit(lambda x: x + 1)
bench("dispatch noop", lambda: tiny(jnp.float32(1.0)))

bench("extract(left)", lambda: extract(l0))
bench("pyr_fn(left)", lambda: pyr_fn(l0))

L = extract(l0); R = extract(r0)
pl = pyr_fn(l0); pr = pyr_fn(r0)
jax.block_until_ready((L, R, pl, pr))
bench("stereo_match", lambda: stereo_match(L, R, pl, pr, widths, scales,
                                           inv_scales, seq.bf, seq.baseline,
                                           geom.n_levels))

# host->device transfer of one image
bench("device_put img", lambda: jax.device_put(np.asarray(seq.lefts[0])))
