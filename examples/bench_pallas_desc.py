"""Compare the fused Pallas descriptor kernel against the XLA band path:
agreement (descriptor bits / angles) and device time on the live batch shape.
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
from jetson_slam_tpu.ops.frontend import OrbFrontend


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
    imgs = jnp.concatenate([jnp.asarray(np.stack(seq.lefts)),
                            jnp.asarray(np.stack(seq.rights))], 0)

    out = {}
    for use_pallas_desc in (False, True):
        fe = OrbFrontend(H, W, n_levels=4, scale_factor=1.2, threshold=20,
                         tile_h=16, tile_w=16,
                         use_pallas_desc=use_pallas_desc)
        T = fe._tables
        ex = jax.jit(lambda im: fe._extract_batch_core(T, im)[0])
        ms = timeit(ex, imgs)
        res = jax.device_get(ex(imgs))
        out[use_pallas_desc] = (ms, res)
        print(f"pallas_desc={use_pallas_desc}:  extract(full) {ms:7.2f} ms "
              f"(incl ~24 ms RTT)")

    (_, a), (_, b) = out[False], out[True]
    v = np.asarray(a.valid) & np.asarray(b.valid)
    da = np.asarray(a.desc)[v]
    db = np.asarray(b.desc)[v]
    ham = np.unpackbits(da ^ db, axis=-1).sum(-1)
    ang = np.abs(np.asarray(a.angle)[v] - np.asarray(b.angle)[v])
    ang = np.minimum(ang, 360 - ang)
    print(f"slots compared: {v.sum()}")
    print(f"desc exact fraction: {(ham == 0).mean():.4f}  "
          f"hamming mean {ham.mean():.3f}/256")
    print(f"angle max |diff|: {ang.max():.5f} deg")


if __name__ == "__main__":
    main()
