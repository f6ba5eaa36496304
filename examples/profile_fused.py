"""Per-stage ablation of the fused single-frame tracking step
(core/fused_track.py): run a short synthetic SLAM session, capture the REAL
inputs of a steady-state fused dispatch, then time the program cut off after
each stage (front-end, +motion-model search+LM, +local-map search+LM).

This is the BASELINE.json "frames/sec (EuRoC MH_01)" path — the single-
stream full-SLAM-loop latency, not the batch-16 front-end number.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()
from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.core import fused_track as ft
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem


def timeit(fn, iters=20):
    out = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@partial(jax.jit, static_argnums=0,
         static_argnames=("n_levels", "mode", "undistort", "stage"))
def _fused_until(fe, T, img_a, img_b, mbf, min_z, k1, k2, p1, p2, k3,
                 Rcw, tcw, last_pw, last_has_pt, last_real, last_pid,
                 last_octave, last_angle, last_desc, last_ur,
                 cand_pos, cand_normal, cand_maxd, cand_mind, cand_desc,
                 cand_alive, cand_pid, th_mm, th_lm, scale_factors,
                 inv_level_sigma2, fx, fy, cx, cy, bf, mb,
                 min_x, max_x, min_y, max_y, log_scale,
                 n_levels: int, forward, backward, mode: str,
                 undistort: bool, stage: str):
    from jetson_slam_tpu.core.matcher import (_local_map_track_impl,
                                              _motion_model_track_impl)
    cur, _right, u_r, depth, _dist = fe._frame_step_impl(
        T, img_a, img_b, mbf, min_z)
    cur_xy = jnp.stack([cur.xs, cur.ys], axis=1)
    if stage == "frontend":
        return cur.desc.astype(jnp.int32).sum() + u_r.sum()
    m, n_match, R1, t1, inl1, n_map1 = _motion_model_track_impl(
        Rcw, tcw, last_pw, last_has_pt, last_real,
        last_octave, last_angle, last_desc, last_ur,
        cur_xy, cur.octave, cur.angle, cur.desc, cur.valid, u_r,
        th_mm, scale_factors, inv_level_sigma2, n_levels,
        fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y,
        forward, backward)
    if stage == "motion":
        return R1.sum() + t1.sum() + n_map1
    has_m = m >= 0
    midx = jnp.where(has_m, m, 0)
    exist_real = has_m & jnp.take(last_real, midx)
    exist_pts = jnp.where(exist_real[:, None],
                          jnp.take(last_pw, midx, axis=0), 0.0)
    pid_cur = jnp.where(exist_real, jnp.take(last_pid, midx), -1)
    in_frame = jnp.any(
        (cand_pid[:, None] == pid_cur[None, :]) & (pid_cur >= 0)[None, :],
        axis=1)
    cand_ok = cand_alive & ~in_frame
    ok, sel, R2, t2, inl2, n_map2 = _local_map_track_impl(
        cand_pos, cand_normal, cand_maxd, cand_mind, cand_desc, cand_ok,
        R1, t1, -R1.T @ t1,
        cur_xy, cur.octave, cur.desc, cur.valid, u_r, ~exist_real,
        exist_pts, exist_real, exist_real,
        th_lm, scale_factors, inv_level_sigma2, n_levels,
        fx, fy, cx, cy, bf, min_x, max_x, min_y, max_y, log_scale)
    return R2.sum() + t2.sum() + n_map2


def main():
    seq = make_stereo_sequence(seed=7, n_frames=25, h=240, w=320,
                               trajectory="arc", n_points=900)
    cfg = SLAMConfig()
    c = cfg.camera
    c.fx, c.fy, c.cx, c.cy = seq.fx, seq.fy, seq.cx, seq.cy
    c.width, c.height, c.bf = 320, 240, seq.bf
    c.k1 = c.k2 = c.p1 = c.p2 = 0.0
    c.th_depth = 40.0
    cfg.orb.n_levels = 4
    cfg.orb.tile_h = 16
    cfg.orb.tile_w = 16
    slam = SlamSystem(cfg, sensor="stereo")

    captured = {}
    orig = ft._fused_track_jit

    def capture(*args, **kw):
        captured["args"] = args
        captured["kw"] = kw
        return orig(*args, **kw)

    ft._fused_track_jit = capture
    t_frames = []
    for i in range(len(seq.lefts)):
        t0 = time.perf_counter()
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
        t_frames.append(time.perf_counter() - t0)
    ft._fused_track_jit = orig
    print(f"live loop median: {np.median(t_frames[5:])*1e3:.1f} ms/frame "
          f"(fused fast-path frames: {slam.tracker.fused_frames})")
    assert "args" in captured, "fused path never dispatched"
    args = captured["args"]
    kw = captured["kw"]

    for stage in ("frontend", "motion", "full"):
        ms = timeit(lambda: _fused_until(*args, **kw, stage=stage))
        print(f"through {stage:8s}: {ms:7.2f} ms (incl ~24 ms RTT)")
    print(f"candidate bucket: {args[23].shape[0]} points "
          f"(cand_pos), slots: {args[13].shape[0]}")

    # steady-state live loop with ASYNC mapping (the reference's thread
    # topology): mapping/BA overlap tracking, so this is the honest
    # single-stream frames/sec number
    seq2 = make_stereo_sequence(seed=9, n_frames=60, h=240, w=320,
                                trajectory="arc", n_points=900)
    slam2 = SlamSystem(cfg, sensor="stereo", async_mapping=True)
    t_frames = []
    for i in range(len(seq2.lefts)):
        t0 = time.perf_counter()
        slam2.track_stereo(seq2.lefts[i], seq2.rights[i], seq2.timestamps[i])
        t_frames.append(time.perf_counter() - t0)
    slam2.shutdown()
    arr = np.array(t_frames[10:]) * 1e3
    print(f"async live loop: median {np.median(arr):.1f} ms/frame, "
          f"p90 {np.percentile(arr, 90):.1f} ms "
          f"({1000.0/np.median(arr):.1f} FPS single-stream; "
          f"fused frames {slam2.tracker.fused_frames}/60)")


if __name__ == "__main__":
    main()
