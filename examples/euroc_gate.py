#!/usr/bin/env python
"""Turnkey EuRoC replay-and-gate: run rectified stereo SLAM over a EuRoC
sequence, score ATE against a golden trajectory, emit ONE JSON verdict.

The reference's evidence base is EuRoC/KITTI replays against author-run
golden trajectories (/root/reference/Examples/Stereo/euroc_old/
CameraTrajectory_MH0{1-5}.txt, stereo_euroc.cpp:186-198).  This script makes
the first mounted dataset produce an ATE verdict with zero extra work:

  # the real thing (once EuRoC data is mounted):
  python examples/euroc_gate.py run examples/configs/EuRoC.yaml \
      /data/euroc/MH_01_easy \
      --golden /root/reference/Examples/Stereo/euroc_old/CameraTrajectory_MH01.txt

  # self-test on synthetic data written in the EuRoC directory layout:
  python examples/euroc_gate.py make-synthetic /tmp/fake_mh01 --frames 40
  python examples/euroc_gate.py run /tmp/fake_mh01/settings.yaml \
      /tmp/fake_mh01 --golden /tmp/fake_mh01/groundtruth_tum.txt

  # harder stand-in while real data is absent (exposure jitter + noise +
  # motion blur + occluders):
  python examples/euroc_gate.py make-synthetic /tmp/fake_hard --degrade

Verdict JSON: {"seq", "frames", "tracked_frac", "ate_rmse_m", "gate_m",
"pass", "median_track_ms"} — written to --out and printed on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_GOLDEN = ("/root/reference/Examples/Stereo/euroc_old/"
              "CameraTrajectory_MH01.txt")


# ---------------------------------------------------------------- degrade
class Degrader:
    """Photometric + occlusion degradation: per-frame exposure jitter,
    gaussian noise, horizontal motion blur, and moving dark occluders."""

    def __init__(self, seed=0, noise=6.0, blur_max=4, n_occluders=2):
        self.rng = np.random.default_rng(seed)
        self.noise = noise
        self.blur_max = blur_max
        self.n_occluders = n_occluders

    def __call__(self, img):
        rng = self.rng
        f = img.astype(np.float32)
        f = f * rng.uniform(0.7, 1.15) + rng.uniform(-15, 25)   # exposure
        k = int(rng.integers(1, self.blur_max + 1))             # motion blur
        if k > 1:
            ker = np.ones(k, np.float32) / k
            f = np.apply_along_axis(
                lambda r: np.convolve(r, ker, mode="same"), 1, f)
        f += rng.normal(0, self.noise, img.shape)               # sensor noise
        h, w = img.shape
        for _ in range(self.n_occluders):                       # occluders
            oh = int(rng.integers(h // 12, h // 5))
            ow = int(rng.integers(w // 12, w // 5))
            y = int(rng.integers(0, h - oh))
            x = int(rng.integers(0, w - ow))
            f[y:y + oh, x:x + ow] = rng.uniform(0, 30)
        return np.clip(f, 0, 255).astype(np.uint8)


# ---------------------------------------------------------- make-synthetic
def make_synthetic(out_dir, frames=40, degrade=False, seed=3):
    from PIL import Image

    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.io.trajectory import save_trajectory_tum

    seq = make_stereo_sequence(seed=seed, n_frames=frames, h=240, w=320,
                               trajectory="arc", n_points=900)
    cam0 = os.path.join(out_dir, "mav0", "cam0", "data")
    cam1 = os.path.join(out_dir, "mav0", "cam1", "data")
    os.makedirs(cam0, exist_ok=True)
    os.makedirs(cam1, exist_ok=True)
    deg = Degrader(seed=seed) if degrade else (lambda x: x)
    for i in range(frames):
        ns = int(seq.timestamps[i] * 1e9) + 1403636579763555584
        Image.fromarray(deg(seq.lefts[i])).save(
            os.path.join(cam0, f"{ns}.png"))
        Image.fromarray(deg(seq.rights[i])).save(
            os.path.join(cam1, f"{ns}.png"))
    # ground truth in the golden-trajectory format (ns timestamps)
    ts_ns = [int(t * 1e9) + 1403636579763555584 for t in seq.timestamps]
    save_trajectory_tum(os.path.join(out_dir, "groundtruth_tum.txt"),
                        ts_ns, list(seq.poses_twc))
    with open(os.path.join(out_dir, "settings.yaml"), "w") as f:
        f.write(f"""%YAML:1.0
Camera.fx: {seq.fx}
Camera.fy: {seq.fy}
Camera.cx: {seq.cx}
Camera.cy: {seq.cy}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 20.0
Camera.bf: {seq.bf}
Camera.RGB: 1
ThDepth: 40
ORBextractor.nLevels: 4
ORBextractor.scaleFactor: 1.2
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
ORBextractor.tile_h: 16
ORBextractor.tile_w: 16
""")
    print(f"synthetic EuRoC-layout sequence written to {out_dir}")
    return out_dir


# ------------------------------------------------------------------- run
def run_gate(settings, seq_dir, golden, gate_m, vocab_name, max_frames,
             out_path, async_mapping=False):
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jetson_slam_tpu
    jetson_slam_tpu.enable_compilation_cache()
    from jetson_slam_tpu.config import load_config
    from jetson_slam_tpu.core.tracking import TrackingState
    from jetson_slam_tpu.io import datasets
    from jetson_slam_tpu.io.evaluation import ate_rmse
    from jetson_slam_tpu.io.rectify import StereoRectifier
    from jetson_slam_tpu.io.trajectory import load_trajectory_tum
    from jetson_slam_tpu.models.slam import SlamSystem

    cfg = load_config(settings)
    entries = datasets.load_euroc_stereo(seq_dir)
    if max_frames:
        entries = entries[:max_frames]
    if not entries:
        raise SystemExit(f"no EuRoC stereo frames under {seq_dir}")
    vocab = None
    if vocab_name:
        from jetson_slam_tpu.bow.vocabulary import (Vocabulary, bundled_names,
                                                    bundled_vocabulary)
        vocab = bundled_vocabulary(vocab_name) \
            if vocab_name in bundled_names() \
            else Vocabulary.load_text(vocab_name)
    rect = StereoRectifier(cfg)
    slam = SlamSystem(cfg, sensor="stereo", vocabulary=vocab,
                      async_mapping=async_mapping)
    times, ok_frames = [], 0
    for i, e in enumerate(entries):
        l = datasets.imread_gray(e[1])
        r = datasets.imread_gray(e[2])
        l, r = rect.rectify(l, r)
        t0 = time.perf_counter()
        state, _ = slam.track_stereo(l, r, e[0])
        times.append(time.perf_counter() - t0)
        ok_frames += state == TrackingState.OK
        if i % 50 == 0:
            print(f"frame {i}/{len(entries)}: state={state.name}",
                  file=sys.stderr)
    slam.shutdown()
    est_ts, est_p = slam.camera_trajectory()
    gt_ts, gt_p = load_trajectory_tum(golden)
    gt_ts = np.asarray(gt_ts, np.float64)
    if gt_ts.max(initial=0) > 1e14:      # golden stores EuRoC nanoseconds
        gt_ts = gt_ts * 1e-9
    est_ts = np.asarray(est_ts, np.float64)
    if est_ts.max(initial=0) > 1e14:
        est_ts = est_ts * 1e-9
    ate = float(ate_rmse(est_ts, np.asarray(est_p), gt_ts, np.asarray(gt_p),
                         max_dt=0.05))
    verdict = {
        "seq": os.path.abspath(seq_dir),
        "frames": len(entries),
        "tracked_frac": round(ok_frames / len(entries), 4),
        "ate_rmse_m": round(ate, 5),
        "gate_m": gate_m,
        "pass": bool(ate < gate_m and ok_frames > 0.8 * len(entries)),
        "median_track_ms": round(float(np.median(times)) * 1e3, 2),
    }
    line = json.dumps(verdict)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return verdict


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("run")
    g.add_argument("settings")
    g.add_argument("seq_dir")
    g.add_argument("--golden", default=REF_GOLDEN)
    g.add_argument("--gate-m", type=float, default=0.12,
                   help="ATE RMSE pass threshold in meters (the reference's "
                        "EuRoC MH01 stereo lands well under this)")
    g.add_argument("--vocab", default="")
    g.add_argument("--max-frames", type=int, default=0)
    g.add_argument("--async", dest="async_mapping", action="store_true")
    g.add_argument("--out", default="EUROC_GATE.json")
    m = sub.add_parser("make-synthetic")
    m.add_argument("out_dir")
    m.add_argument("--frames", type=int, default=40)
    m.add_argument("--degrade", action="store_true")
    m.add_argument("--seed", type=int, default=3)
    ns = ap.parse_args(argv)
    if ns.cmd == "make-synthetic":
        make_synthetic(ns.out_dir, ns.frames, ns.degrade, ns.seed)
    else:
        run_gate(ns.settings, ns.seq_dir, ns.golden, ns.gate_m, ns.vocab,
                 ns.max_frames, ns.out, ns.async_mapping)


if __name__ == "__main__":
    main()
