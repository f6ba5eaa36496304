"""Round-5 full-SLAM-loop profiler: single-stream frames/sec with async
mapping, swept over the tracker's software pipeline depth.

This is the number the reference's README reports (>500 FPS RTX-2070 /
>90 FPS Jetson-NX at 320x240 is the WHOLE system, README.md:11), so the
loop here runs everything: fused tracking, async LocalMapping + BA, and
keyframe insertion, on a long synthetic arc.  Per-frame wall times are
measured after a warmup, and the trajectory ATE is checked at each depth so
speed never silently trades accuracy.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem

N_FRAMES = int(os.environ.get("LOOP_FRAMES", "150"))
WARM = 20


def make_cfg(seq):
    cfg = SLAMConfig()
    c = cfg.camera
    c.fx, c.fy, c.cx, c.cy = seq.fx, seq.fy, seq.cx, seq.cy
    c.width = seq.lefts[0].shape[1]
    c.height = seq.lefts[0].shape[0]
    c.bf = seq.bf
    c.k1 = c.k2 = c.p1 = c.p2 = 0.0
    c.th_depth = 40.0
    cfg.orb.n_levels = 4
    cfg.orb.tile_h = 16
    cfg.orb.tile_w = 16
    return cfg


def run(seq, depth, slam=None):
    cfg = make_cfg(seq)
    if slam is None:
        slam = SlamSystem(cfg, sensor="stereo", async_mapping=True,
                          pipeline_depth=depth)
        # compile the fused program for every candidate bucket BEFORE the
        # stream starts (a real deployment warms up before the camera
        # rolls; mid-run those compiles are multi-second frame stalls)
        slam.tracker.prewarm(background=False)
        # one full warm lap: traces + compiles the mapper/BA bucket
        # programs this sequence will use, then reset to a fresh map
        for i in range(len(seq.lefts)):
            slam.track_stereo(seq.lefts[i], seq.rights[i],
                              seq.timestamps[i])
        slam.reset()
    t_frames = []
    for i in range(len(seq.lefts)):
        t0 = time.perf_counter()
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
        t_frames.append(time.perf_counter() - t0)
    est_ts, est_poses = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_poses),
                   seq.timestamps, seq.poses_twc)
    fused = slam.tracker.fused_frames
    slam.shutdown()
    arr = np.array(t_frames[WARM:]) * 1e3
    return arr, ate, fused


def main():
    seq = make_stereo_sequence(seed=9, n_frames=N_FRAMES, h=240, w=320,
                               trajectory="arc", n_points=900)
    for depth in (0, 1, 2, 3):
        arr, ate, fused = run(seq, depth)
        med = np.median(arr)
        print(f"depth {depth}: median {med:6.1f} ms  p90 "
              f"{np.percentile(arr, 90):6.1f}  p99 "
              f"{np.percentile(arr, 99):6.1f}  -> {1000.0 / med:6.1f} FPS "
              f"single-stream  ATE {ate:.4f} m  fused {fused}/{len(arr) + WARM}",
              flush=True)


if __name__ == "__main__":
    main()
