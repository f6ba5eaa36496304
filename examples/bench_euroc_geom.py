"""Front-end at the reference's EuRoC production geometry: 752x480,
8 pyramid levels, 30x30 NMS-G tile, FAST threshold 20
(/root/reference/Examples/Stereo/EuRoC.yaml:25-26,94-112).

All round-<=4 perf evidence was 320x240/4-level; this measures the
production path at the reference's actual operating point (VERDICT r4
item 3): batched pipelined throughput + marginal device ms/frame.
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

H, W = 480, 752
B = int(os.environ.get("GEOM_BATCH", "8"))


def main():
    seq = make_stereo_sequence(seed=1, n_frames=8, h=H, w=W, n_points=1600)
    fe = OrbFrontend(H, W, n_levels=8, scale_factor=1.2, threshold=20,
                     tile_h=30, tile_w=30)
    print(f"geometry: {W}x{H}, 8 levels, tile 30 -> {fe.n_slots} slots "
          f"(padded {fe.n_slots_padded}), band {fe.band_hw}", flush=True)
    bf = float(seq.bf)
    min_z = float(seq.baseline)
    lefts = jnp.asarray(np.stack([seq.lefts[i % 8] for i in range(B)]))
    rights = jnp.asarray(np.stack([seq.rights[i % 8] for i in range(B)]))

    out = fe.frame_step_batch(lefts, rights, bf, min_z)
    nk = int(np.asarray(out[0].valid).sum())
    print(f"keypoints/frame (left eyes): {nk / B:.0f}", flush=True)
    _ = jax.device_get(out[2])

    def pipelined_pass(n_iters=10, depth=3):
        inflight = []
        t0 = time.perf_counter()
        for _ in range(n_iters):
            inflight.append(fe.frame_step_batch(lefts, rights, bf, min_z))
            if len(inflight) >= depth:
                _ = jax.device_get(inflight.pop(0)[2])
        while inflight:
            _ = jax.device_get(inflight.pop(0)[2])
        return n_iters * B / (time.perf_counter() - t0)

    fps = max(pipelined_pass() for _ in range(4))
    # marginal device time per extra batch (serialized, min-statistic)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        _ = jax.device_get(fe.frame_step_batch(lefts, rights, bf, min_z)[2])
        best = min(best, time.perf_counter() - t0)
    print(f"pipelined throughput: {fps:.1f} frames/s (batch {B}, depth 3)")
    print(f"serialized batch: {best * 1e3:.1f} ms incl ~24 ms RTT -> "
          f"~{(best * 1e3 - 24) / B:.1f} ms/frame device")


if __name__ == "__main__":
    main()
