"""Whole-frame fused tracking step: ONE device program, ONE host pull.

The reference's per-frame hot path is a chain of GPU kernels with host logic
between them (SURVEY.md §3.2): ORB extraction on both eyes, stereo matching,
motion-model projection search + pose optimization
(ORBmatcher.cpp:1315-1966, Optimizer.cpp:244-456), then local-map frustum
culling + projection search + pose optimization (Tracking.cpp:1117-1806).
Each host<->device hop there is cheap on an integrated GPU; on TPU a
round-trip costs transport latency, so this module fuses the ENTIRE steady
-state tracking step into a single XLA program:

    front-end -> [stereo match | RGB-D virtual-right | mono]
    -> keypoint undistortion (when the lens model is non-trivial)
    -> motion-model search + pose LM
    -> local-map frustum + search + pose LM

with exactly one `jax.device_get` per frame, for all three sensor modes
(System::TrackStereo/TrackRGBD/TrackMonocular parity).  The only
information the device step needs from the host is (a) the previous
frame's per-slot state (world points, descriptors, pids) and (b) a
*speculated* local-map candidate set, both uploaded asynchronously before
dispatch.

Speculation: the reference re-derives the local keyframe set from the
CURRENT frame's matches (Tracking::UpdateLocalKeyFrames) before searching.
Here the candidate set is voted from the PREVIOUS frame's final
associations (core/tracking.py Tracker._speculate_candidates) — between
consecutive frames the covisible set is nearly identical, and points that
ARE already matched in the current frame are excluded on-device by pid
comparison.  The per-frame reference-keyframe bookkeeping still uses the
current frame's vote (host-side, after the pull), so keyframe policy
semantics are unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .matcher import _local_map_track_impl, _motion_model_track_impl


@dataclasses.dataclass
class FusedTrackResult:
    """Host-side pull of the fused step (everything numpy after device_get)."""
    # motion-model stage
    m: np.ndarray        # (S,) per-current-slot index into last slots (-1 none)
    n_match: int
    R1: np.ndarray       # motion-model optimized pose
    t1: np.ndarray
    inl1: np.ndarray     # (S,) bool inliers of the motion-model pose LM
    n_map1: int          # inliers carrying real (non-temp) map points
    # local-map stage
    ok: np.ndarray       # (C,) frustum-visible candidates
    sel: np.ndarray      # (S,) per-current-slot index into candidates (-1)
    R2: np.ndarray       # final optimized pose
    t2: np.ndarray
    inl2: np.ndarray     # (S,) bool inliers of the final pose LM
    n_map2: int
    # pt_gen snapshots (set by Tracker._dispatch_fused) — taken when the
    # last-frame / candidate point data was captured, so the consume step
    # can detect pids culled + reallocated during the unlocked window
    last_gen: np.ndarray | None = None
    spec_gen: np.ndarray | None = None


def _undistort_device(xy, fx, fy, cx, cy, k1, k2, p1, p2, k3, iters=5):
    """Fixed-iteration undistortion, same scheme as core.frame
    .undistort_points (cv::undistortPoints semantics) but traceable —
    needed so the matchers inside the fused program see undistorted
    keypoint coordinates on distorted-lens configs (e.g. TUM RGB-D)."""
    x = (xy[:, 0] - cx) / fx
    y = (xy[:, 1] - cy) / fy
    x0, y0 = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x * fx + cx, y * fy + cy], axis=1)


@partial(jax.jit, static_argnums=0,
         static_argnames=("n_levels", "mode", "undistort"))
def _fused_track_jit(
    fe, T, img_a, img_b, mbf, min_z,
    # lens model (traced; `undistort` statically gates the iteration)
    k1, k2, p1, p2, k3,
    # velocity-predicted pose
    Rcw, tcw,
    # last-frame per-slot state
    last_pw, last_has_pt, last_real, last_pid,
    last_octave, last_angle, last_desc, last_ur,
    # speculated local-map candidates (padded to a power-of-two bucket)
    cand_pos, cand_normal, cand_maxd, cand_mind, cand_desc, cand_alive,
    cand_pid,
    # scalars / tables
    th_mm, th_lm, scale_factors, inv_level_sigma2,
    fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y, log_scale,
    n_levels: int, forward, backward, mode: str, undistort: bool,
):
    # forward/backward ride as traced booleans (jnp.where inside the octave
    # gating) so every candidate-size bucket compiles exactly ONE program
    # instead of one per motion-direction combination.

    # ---- front-end per sensor mode
    if mode == "stereo":
        # ORB both eyes + dense stereo matching, already one program
        cur, _right, u_r, depth, _dist = fe._frame_step_impl(
            T, img_a, img_b, mbf, min_z)
    else:
        res, _raw, _bands = fe._extract_batch_core(T, img_a[None])
        cur = jax.tree_util.tree_map(lambda a: a[0], res)

    cur_xy = jnp.stack([cur.xs, cur.ys], axis=1)
    if undistort:
        cur_xy = _undistort_device(cur_xy, fx, fy, cx, cy, k1, k2, p1, p2, k3)

    if mode == "rgbd":
        # depth -> virtual right coordinate (Frame.cpp:996-1017): depth is
        # sampled at the RAW keypoint, the virtual right coordinate uses
        # the UNDISTORTED x (kpU.pt.x - mbf/d), like ComputeStereoFromRGBD
        H0, W0 = img_b.shape
        xi = jnp.clip(cur.xs.astype(jnp.int32), 0, W0 - 1)
        yi = jnp.clip(cur.ys.astype(jnp.int32), 0, H0 - 1)
        z = jnp.take(img_b.reshape(-1), yi * W0 + xi)
        pos = (z > 0) & cur.valid
        depth = jnp.where(pos, z, -1.0).astype(jnp.float32)
        u_r = jnp.where(pos, cur_xy[:, 0] - mbf / jnp.maximum(z, 1e-6),
                        -1.0).astype(jnp.float32)
    elif mode == "mono":
        u_r = jnp.full_like(cur.xs, -1.0)
        depth = jnp.full_like(cur.xs, -1.0)

    # ---- motion-model stage (TrackWithMotionModel semantics)
    m, n_match, R1, t1, inl1, n_map1 = _motion_model_track_impl(
        Rcw, tcw, last_pw, last_has_pt, last_real,
        last_octave, last_angle, last_desc, last_ur,
        cur_xy, cur.octave, cur.angle, cur.desc, cur.valid, u_r,
        th_mm, scale_factors, inv_level_sigma2, n_levels,
        fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y,
        forward, backward)

    # ---- existing associations for the local-map stage: REAL map points
    # only (temp VO points are dropped at TrackLocalMap, Tracking.cpp:1130)
    has_m = m >= 0
    midx = jnp.where(has_m, m, 0)
    exist_real = has_m & jnp.take(last_real, midx)
    exist_pts = jnp.where(exist_real[:, None],
                          jnp.take(last_pw, midx, axis=0), 0.0)
    pid_cur = jnp.where(exist_real, jnp.take(last_pid, midx), -1)

    # exclude candidates already matched in this frame (the reference skips
    # points with mnTrackReferenceForFrame == current, Tracking.cpp:1360s)
    in_frame = jnp.any(
        (cand_pid[:, None] == pid_cur[None, :]) & (pid_cur >= 0)[None, :],
        axis=1)
    cand_ok = cand_alive & ~in_frame

    # ---- local-map stage (TrackLocalMap semantics) from the motion pose
    ok, sel, R2, t2, inl2, n_map2 = _local_map_track_impl(
        cand_pos, cand_normal, cand_maxd, cand_mind, cand_desc, cand_ok,
        R1, t1, -R1.T @ t1,
        cur_xy, cur.octave, cur.desc, cur.valid, u_r, ~exist_real,
        exist_pts, exist_real, exist_real,
        th_lm, scale_factors, inv_level_sigma2, n_levels,
        fx, fy, cx, cy, bf, min_x, max_x, min_y, max_y, log_scale)

    return (cur, u_r, depth,
            m, n_match, R1, t1, inl1, n_map1,
            ok, sel, R2, t2, inl2, n_map2)


def fused_track_dispatch(fe, cam, imgs, mode, mbf, min_z, pred_Tcw,
                         last_state, cand, th_mm, th_lm, scale_factors,
                         inv_level_sigma2, cam_params, forward, backward):
    """Enqueue the fused step and START the D2H copies; no blocking.

    Same inputs as fused_track.  Returns (device_arrays, dev_cache) to be
    completed by fused_track_pull — the split lets the tracker keep a
    frame in flight (software pipelining over the host<->device link)
    while it finishes host bookkeeping for the previous frame.
    """
    (fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y, log_scale,
     n_levels) = cam_params
    undistort = not (cam.k1 == 0 and cam.k2 == 0 and cam.p1 == 0
                     and cam.p2 == 0 and cam.k3 == 0)
    img_a = jnp.asarray(imgs[0])
    img_b = jnp.asarray(imgs[1]) if len(imgs) > 1 else img_a
    out = _fused_track_jit(
        fe, fe._tables, img_a, img_b,
        jnp.float32(mbf), jnp.float32(min_z),
        cam.k1, cam.k2, cam.p1, cam.p2, cam.k3,
        jnp.asarray(pred_Tcw[:3, :3]), jnp.asarray(pred_Tcw[:3, 3]),
        jnp.asarray(last_state["pw"]), jnp.asarray(last_state["has_pt"]),
        jnp.asarray(last_state["real"]), jnp.asarray(last_state["pid"]),
        last_state["octave"], last_state["angle"],
        last_state["desc"], last_state["ur"],
        cand["pos"], cand["normal"], cand["maxd"], cand["mind"],
        cand["desc"], cand["alive"], cand["pid"],
        float(th_mm), float(th_lm),
        scale_factors, inv_level_sigma2,
        fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y, log_scale,
        n_levels=int(n_levels), forward=jnp.asarray(bool(forward)),
        backward=jnp.asarray(bool(backward)), mode=mode,
        undistort=undistort)
    (cur, u_r_dev, depth_dev,
     m, n_match, R1, t1, inl1, n_map1,
     ok, sel, R2, t2, inl2, n_map2) = out

    arrays = (cur.valid, cur.xs, cur.ys, cur.octave, cur.angle,
              cur.response, cur.desc, u_r_dev, depth_dev,
              m, n_match, R1, t1, inl1, n_map1,
              ok, sel, R2, t2, inl2, n_map2)
    # start the D2H copies now so the later blocking pull only waits on
    # transport that could not be overlapped
    for a in arrays:
        try:
            a.copy_to_host_async()
        except (AttributeError, RuntimeError):
            break
    dev_cache = {"valid": cur.valid, "desc": cur.desc, "octave": cur.octave,
                 "angle": cur.angle, "u_right": u_r_dev}
    return arrays, dev_cache


def fused_track_pull(arrays, dev_cache):
    """Block on a fused_track_dispatch and assemble the host-side result.

    Returns (pulled_frontend, dev_cache, FusedTrackResult) where
    pulled_frontend = (valid, xs, ys, octave, angle, response, desc, u_r,
    depth) numpy arrays and dev_cache maps field names to the
    still-resident device arrays for reuse by later programs.
    """
    pulled = jax.device_get(arrays)
    (valid, xs, ys, octave, angle, response, desc, u_r, depth,
     m_h, n_match_h, R1_h, t1_h, inl1_h, n_map1_h,
     ok_h, sel_h, R2_h, t2_h, inl2_h, n_map2_h) = pulled
    fused = FusedTrackResult(
        m=m_h, n_match=int(n_match_h), R1=R1_h, t1=t1_h, inl1=inl1_h,
        n_map1=int(n_map1_h), ok=ok_h, sel=sel_h, R2=R2_h, t2=t2_h,
        inl2=inl2_h, n_map2=int(n_map2_h))
    return (valid, xs, ys, octave, angle, response, desc, u_r, depth), \
        dev_cache, fused


def fused_track(fe, cam, imgs, mode, mbf, min_z, pred_Tcw,
                last_state, cand, th_mm, th_lm, scale_factors,
                inv_level_sigma2, cam_params, forward, backward):
    """Dispatch the fused step and pull EVERYTHING in one device_get.

    imgs: (left, right) for stereo, (gray, depth_f32) for rgbd, (gray,)
    for mono.  last_state: dict with pw/has_pt/real/pid/octave/angle/desc/
    ur arrays (numpy or device).  cand: dict with pos/normal/maxd/mind/
    desc/alive/pid device arrays (padded).  cam_params: (fx, fy, cx, cy,
    bf, mb, min_x, max_x, min_y, max_y, log_scale, n_levels).
    """
    arrays, dev_cache = fused_track_dispatch(
        fe, cam, imgs, mode, mbf, min_z, pred_Tcw, last_state, cand,
        th_mm, th_lm, scale_factors, inv_level_sigma2, cam_params,
        forward, backward)
    return fused_track_pull(arrays, dev_cache)


def prewarm_fused(fe, cam, mode, scale_factors, inv_level_sigma2,
                  cam_params, caps=(128, 256, 512, 1024, 2048)):
    """Compile the fused step for every candidate-bucket size ahead of
    time.  The local-map candidate arrays are bucketed to powers of two
    (core/tracking.py _speculate_candidates), so a growing map triggers a
    recompile per new bucket MID-RUN — measured as multi-second p99 frame
    stalls (43 s total over a 150-frame session).  Dispatching each bucket
    once up front (normally from a daemon thread at session start) moves
    those compiles off the tracking path; with the persistent compilation
    cache they are disk hits after the first session.

    Reuses fused_track_dispatch itself so the traced arg types are exactly
    the production ones."""
    import numpy as np

    S = fe.n_slots_padded
    H, W = fe._h0w0
    imgs = (np.zeros((H, W), np.uint8),) * (1 if mode == "mono" else 2)
    if mode == "rgbd":
        imgs = (imgs[0], np.zeros((H, W), np.float32))
    last_state = {
        "pw": np.zeros((S, 3), np.float32),
        "has_pt": np.zeros(S, bool),
        "real": np.zeros(S, bool),
        "pid": np.full(S, -1, np.int32),
        "octave": jnp.zeros(S, jnp.int32),
        "angle": jnp.zeros(S, jnp.float32),
        "desc": jnp.zeros((S, 32), jnp.uint8),
        "ur": jnp.full(S, -1.0, jnp.float32),
    }
    pred = np.eye(4, dtype=np.float32)
    mb = cam.bf / cam.fx
    outs = []
    for C in caps:
        cand = {
            "pos": jnp.zeros((C, 3), jnp.float32),
            "normal": jnp.zeros((C, 3), jnp.float32),
            "maxd": jnp.ones(C, jnp.float32),
            "mind": jnp.zeros(C, jnp.float32),
            "desc": jnp.zeros((C, 32), jnp.uint8),
            "alive": jnp.zeros(C, bool),
            "pid": jnp.full(C, -1, jnp.int32),
        }
        arrays, _ = fused_track_dispatch(
            fe, cam, imgs, mode, cam.bf, mb, pred, last_state, cand,
            7.0, 1.0, scale_factors, inv_level_sigma2, cam_params,
            forward=False, backward=False)
        outs.append(arrays[10])
    for o in outs:
        jax.block_until_ready(o)
