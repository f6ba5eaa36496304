#!/usr/bin/env python
"""Dataset driver CLI: replacement for the reference Examples/ mains
(stereo_euroc.cpp, stereo_kitti.cpp, rgbd_tum.cpp, *_live.cpp).

Usage:
  python examples/run_slam.py stereo-euroc  <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py stereo-kitti  <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py rgbd-tum      <settings.yaml> <seq_dir> <assoc.txt> [--out traj.txt]
  python examples/run_slam.py synthetic     [--frames N] [--out traj.txt]

Prints per-frame and median/mean tracking times like the reference drivers
(stereo_euroc.cpp:186-195).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(slam, entries, loader, out_path=None, rgbd=False):
    times = []
    track = slam.track_rgbd if rgbd else slam.track_stereo
    for i, entry in enumerate(entries):
        t, imgs = loader(entry)
        t0 = time.perf_counter()
        state, _ = track(imgs[0], imgs[1], t)
        dt = time.perf_counter() - t0
        times.append(dt)
        if i % 20 == 0:
            print(f"frame {i}: {dt*1e3:.1f} ms  state={state.name}")
    times = np.array(times)
    print(f"median tracking time: {np.median(times)*1e3:.2f} ms")
    print(f"mean tracking time:   {times.mean()*1e3:.2f} ms")
    if out_path:
        slam.save_trajectory_tum(out_path)
        print(f"trajectory saved to {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["stereo-euroc", "stereo-kitti",
                                     "rgbd-tum", "synthetic"])
    ap.add_argument("args", nargs="*")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--no-ba", action="store_true")
    ns = ap.parse_args(argv)

    from jetson_slam_tpu.config import SLAMConfig, load_config
    from jetson_slam_tpu.models.slam import SlamSystem

    if ns.mode == "synthetic":
        from jetson_slam_tpu.io.synthetic import make_stereo_sequence
        seq = make_stereo_sequence(seed=0, n_frames=ns.frames, h=240, w=320)
        cfg = SLAMConfig()
        cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
        cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
        cfg.camera.width = 320; cfg.camera.height = 240
        cfg.camera.bf = seq.bf
        cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
        cfg.orb.n_levels = 4; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
        slam = SlamSystem(cfg, sensor="stereo", enable_ba=not ns.no_ba)
        entries = list(range(ns.frames))
        loader = lambda i: (seq.timestamps[i], (seq.lefts[i], seq.rights[i]))
        run(slam, entries, loader, ns.out)
        # report ATE against ground truth
        from jetson_slam_tpu.io.evaluation import ate_rmse
        est_ts, est_p = slam.camera_trajectory()
        if len(est_p) >= 3:
            print(f"ATE RMSE vs ground truth: "
                  f"{ate_rmse(np.asarray(est_ts), np.asarray(est_p), seq.timestamps, seq.poses_twc):.4f} m")
        return

    settings = ns.args[0]
    cfg = load_config(settings)
    from jetson_slam_tpu.io import datasets

    if ns.mode == "stereo-euroc":
        entries = datasets.load_euroc_stereo(ns.args[1])
        slam = SlamSystem(cfg, sensor="stereo", enable_ba=not ns.no_ba)
        loader = lambda e: (e[0], (datasets.imread_gray(e[1]),
                                   datasets.imread_gray(e[2])))
    elif ns.mode == "stereo-kitti":
        entries = datasets.load_kitti_stereo(ns.args[1])
        slam = SlamSystem(cfg, sensor="stereo", enable_ba=not ns.no_ba)
        loader = lambda e: (e[0], (datasets.imread_gray(e[1]),
                                   datasets.imread_gray(e[2])))
    else:  # rgbd-tum
        entries = datasets.load_tum_rgbd(ns.args[1], ns.args[2])
        slam = SlamSystem(cfg, sensor="rgbd", enable_ba=not ns.no_ba)

        def loader(e):
            rgb = datasets.imread_gray(e[1])
            depth = datasets.imread_gray(e[2]).astype(np.float32) / \
                cfg.camera.depth_map_factor
            return e[0], (rgb, depth)
        run(slam, entries, loader, ns.out, rgbd=True)
        return
    run(slam, entries, loader, ns.out)


if __name__ == "__main__":
    main()
