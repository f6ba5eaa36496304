"""Where does the pipelined SLAM-loop frame time go?  Wraps the tracker's
begin (input prep + dispatch), finish (blocking pull), and locked
bookkeeping stages with timers over a live async-mapping session."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.core.tracking import Tracker
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from examples.profile_loop_r5 import make_cfg
from jetson_slam_tpu.models.slam import SlamSystem

DEPTH = int(os.environ.get("LOOP_DEPTH", "1"))
N = int(os.environ.get("LOOP_FRAMES", "120"))
WARM = 20

acc = {}


def wrap(name, fn):
    def inner(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        acc.setdefault(name, []).append(time.perf_counter() - t0)
        return out
    return inner


def main():
    seq = make_stereo_sequence(seed=9, n_frames=N, h=240, w=320,
                               trajectory="arc", n_points=900)
    cfg = make_cfg(seq)
    slam = SlamSystem(cfg, sensor="stereo", async_mapping=True,
                      pipeline_depth=DEPTH)
    tr = slam.tracker
    for name in ("_begin_fused", "_finish_fused", "_track_locked",
                 "_speculate_candidates", "_update_last_frame",
                 "_consume_fused_local", "_create_new_keyframe",
                 "_need_new_keyframe", "_apply_last_matches"):
        setattr(tr, name, wrap(name, getattr(tr, name)))
    t_frames = []
    for i in range(len(seq.lefts)):
        t0 = time.perf_counter()
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
        t_frames.append(time.perf_counter() - t0)
    slam.shutdown()
    arr = np.array(t_frames[WARM:]) * 1e3
    print(f"depth {DEPTH}: median {np.median(arr):.1f} ms  "
          f"p90 {np.percentile(arr, 90):.1f}  mean {arr.mean():.1f}")
    for name, ts in sorted(acc.items(), key=lambda kv: -np.sum(kv[1])):
        a = np.array(ts[min(WARM, len(ts) - 1):]) * 1e3
        print(f"  {name:25s} n={len(a):4d} median {np.median(a):7.2f} "
              f"p90 {np.percentile(a, 90):7.2f} total {a.sum():8.1f} ms")


if __name__ == "__main__":
    main()
