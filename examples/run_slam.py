#!/usr/bin/env python
"""Dataset driver CLI: replacement for the reference Examples/ mains
(stereo_euroc.cpp, stereo_kitti.cpp, rgbd_tum.cpp, mono_{tum,kitti,euroc}.cpp,
*_live.cpp).

Usage:
  python examples/run_slam.py stereo-euroc  <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py stereo-kitti  <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py rgbd-tum      <settings.yaml> <seq_dir> <assoc.txt> [--out traj.txt]
  python examples/run_slam.py mono-tum      <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py mono-kitti    <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py mono-euroc    <settings.yaml> <seq_dir> [--out traj.txt]
  python examples/run_slam.py stereo-live   <settings.yaml> <left_dev> <right_dev>
  python examples/run_slam.py synthetic     [--frames N] [--out traj.txt]

Flags: --async (mapping/loop-closing on a worker thread, the reference's
thread topology), --viewer DIR (PNG frame+map renders), --no-ba,
--kitti-format (KITTI trajectory export), --max-frames N.

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


def run(slam, entries, loader, ns, mode="stereo", raw_loader=None):
    from jetson_slam_tpu.viz import Viewer

    viewer = Viewer(out_dir=ns.viewer, tile_h=slam.config.orb.tile_h,
                    tile_w=slam.config.orb.tile_w) if ns.viewer else None
    live = None
    if getattr(ns, "live_viewer", 0):
        from jetson_slam_tpu.viz.live_server import LiveViewer
        live = LiveViewer(slam, port=ns.live_viewer,
                          tile_h=slam.config.orb.tile_h,
                          tile_w=slam.config.orb.tile_w)
        print(f"live viewer: http://127.0.0.1:{live.port}/")
    track = {"stereo": slam.track_stereo, "rgbd": slam.track_rgbd,
             "mono": slam.track_monocular}[mode]
    times = []
    if ns.max_frames:
        entries = entries[:ns.max_frames]
    for i, entry in enumerate(entries):
        t, imgs = loader(i, entry)
        t0 = time.perf_counter()
        state, frame = track(*imgs, t) if mode != "mono" else track(imgs[0], t)
        dt = time.perf_counter() - t0
        times.append(dt)
        if viewer is not None:
            viewer.update(slam, imgs[0], frame)
        if live is not None:
            live.update(slam, imgs[0], frame)
        if i % 20 == 0:
            print(f"frame {i}: {dt*1e3:.1f} ms  state={state.name}")
    slam.shutdown()
    if live is not None:
        live.close()
    times = np.array(times)
    print(f"median tracking time: {np.median(times)*1e3:.2f} ms")
    print(f"mean tracking time:   {times.mean()*1e3:.2f} ms")
    print(f"fused fast-path frames: {slam.tracker.fused_frames}/{len(times)}")
    if ns.out:
        if ns.kitti_format:
            slam.save_trajectory_kitti(ns.out)
        else:
            slam.save_trajectory_tum(ns.out)
        print(f"trajectory saved to {ns.out}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=[
        "stereo-euroc", "stereo-kitti", "rgbd-tum", "mono-tum", "mono-kitti",
        "mono-euroc", "stereo-live", "synthetic"])
    ap.add_argument("args", nargs="*")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--async", dest="async_mapping", action="store_true")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="fused-tracking pipeline depth (frames in flight)")
    ap.add_argument("--viewer", default="", help="PNG output directory")
    ap.add_argument("--live-viewer", type=int, default=0, metavar="PORT",
                    help="serve a live interactive browser view of the "
                         "session on this port (viz/live_server.py)")
    ap.add_argument("--kitti-format", action="store_true")
    ap.add_argument("--vocab", default="",
                    help="'small' / '10k' (bundled) or a "
                         "DBoW2-format vocabulary path enabling loop "
                         "closing; 'small' uses the bundled 512-word one")
    ns = ap.parse_args(argv)

    # honor JAX_PLATFORMS even when a sitecustomize force-registers a plugin
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jetson_slam_tpu
    jetson_slam_tpu.enable_compilation_cache()
    from jetson_slam_tpu.config import SLAMConfig, load_config
    from jetson_slam_tpu.models.slam import SlamSystem

    vocab = None
    if ns.vocab:
        from jetson_slam_tpu.bow.vocabulary import (Vocabulary,
                                                    bundled_names,
                                                    bundled_vocabulary)
        vocab = bundled_vocabulary(ns.vocab) if ns.vocab in bundled_names() \
            else Vocabulary.load_text(ns.vocab)

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
        slam = SlamSystem(cfg, sensor="stereo", enable_ba=not ns.no_ba,
                      pipeline_depth=ns.pipeline, prewarm=ns.pipeline > 0,
                          async_mapping=ns.async_mapping, vocabulary=vocab)
        entries = list(range(ns.frames))
        loader = lambda i, e: (seq.timestamps[i], (seq.lefts[i],
                                                   seq.rights[i]))
        run(slam, entries, loader, ns)
        from jetson_slam_tpu.io.evaluation import ate_rmse
        est_ts, est_p = slam.camera_trajectory()
        if len(est_p) >= 3:
            print(f"ATE RMSE vs ground truth: "
                  f"{ate_rmse(np.asarray(est_ts), np.asarray(est_p), seq.timestamps, seq.poses_twc):.4f} m")
        return

    settings = ns.args[0]
    cfg = load_config(settings)
    from jetson_slam_tpu.io import datasets
    from jetson_slam_tpu.io.rectify import StereoRectifier

    if ns.mode == "stereo-live":
        # live V4L capture (stereo_live.cpp:70-83): needs a camera stack not
        # present on TPU hosts; gate the import so the CLI stays testable
        try:
            import cv2  # noqa: F401
        except ImportError:
            print("stereo-live requires OpenCV V4L capture (unavailable "
                  "here); falling back to a synthetic stream for smoke use")
            return main(["synthetic", "--frames", "30"])
        raise SystemExit("live capture loop not wired for this build")

    if ns.mode.startswith("mono-"):
        loaders = {"mono-tum": datasets.load_tum_mono,
                   "mono-kitti": datasets.load_kitti_mono,
                   "mono-euroc": datasets.load_euroc_mono}
        entries = loaders[ns.mode](ns.args[1])
        slam = SlamSystem(cfg, sensor="mono", enable_ba=not ns.no_ba,
                      pipeline_depth=ns.pipeline, prewarm=ns.pipeline > 0,
                          async_mapping=ns.async_mapping, vocabulary=vocab)
        src = datasets.ImageSource([e[1] for e in entries])
        loader = lambda i, e: (e[0], (src.get(i),))
        run(slam, entries, loader, ns, mode="mono")
        src.close()
        return

    if ns.mode == "rgbd-tum":
        entries = datasets.load_tum_rgbd(ns.args[1], ns.args[2])
        slam = SlamSystem(cfg, sensor="rgbd", enable_ba=not ns.no_ba,
                      pipeline_depth=ns.pipeline, prewarm=ns.pipeline > 0,
                          async_mapping=ns.async_mapping, vocabulary=vocab)

        src_rgb = datasets.ImageSource([e[1] for e in entries])
        src_d = datasets.ImageSource([e[2] for e in entries])

        def loader(i, e):
            rgb = src_rgb.get(i)
            depth = src_d.get(i).astype(np.float32) / \
                cfg.camera.depth_map_factor
            return e[0], (rgb, depth)
        run(slam, entries, loader, ns, mode="rgbd")
        src_rgb.close()
        src_d.close()
        return

    # stereo datasets
    rect = StereoRectifier(cfg)
    if ns.mode == "stereo-euroc":
        entries = datasets.load_euroc_stereo(ns.args[1])
    else:
        entries = datasets.load_kitti_stereo(ns.args[1])
    slam = SlamSystem(cfg, sensor="stereo", enable_ba=not ns.no_ba,
                      pipeline_depth=ns.pipeline, prewarm=ns.pipeline > 0,
                      async_mapping=ns.async_mapping, vocabulary=vocab)

    # decode-ahead columns: native C++ ring buffer for pgm/raw, thread
    # pool otherwise — host decode overlaps the tracker (io/datasets.py)
    src_l = datasets.ImageSource([e[1] for e in entries])
    src_r = datasets.ImageSource([e[2] for e in entries])

    def loader(i, e):
        return e[0], rect.rectify(src_l.get(i), src_r.get(i))
    run(slam, entries, loader, ns)
    src_l.close()
    src_r.close()


if __name__ == "__main__":
    main()
