"""Whole-frame fused tracking step: ONE device program, ONE host pull.

The reference's per-frame hot path is a chain of GPU kernels with host logic
between them (SURVEY.md §3.2): ORB extraction on both eyes, stereo matching,
motion-model projection search + pose optimization
(ORBmatcher.cpp:1315-1966, Optimizer.cpp:244-456), then local-map frustum
culling + projection search + pose optimization (Tracking.cpp:1117-1806).
Each host<->device hop there is cheap on an integrated GPU; on TPU a
round-trip costs transport latency, so this module fuses the ENTIRE steady
-state tracking step into a single XLA program:

    front-end (both eyes) -> stereo match -> motion-model search + pose LM
    -> local-map frustum + search + pose LM

with exactly one `jax.device_get` per frame.  The only information the
device step needs from the host is (a) the previous frame's per-slot state
(world points, descriptors, pids) and (b) a *speculated* local-map candidate
set, both uploaded asynchronously before dispatch.

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


@partial(jax.jit, static_argnums=0, static_argnames=("n_levels",))
def _fused_stereo_track_jit(
    fe, T, left_u8, right_u8, mbf, min_z,
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
    n_levels: int, forward, backward,
):
    # forward/backward ride as traced booleans (jnp.where inside the octave
    # gating) so every candidate-size bucket compiles exactly ONE program
    # instead of one per motion-direction combination.
    # ---- front-end: ORB both eyes + stereo matching (already one program)
    cur, _right, u_r, depth, _dist = fe._frame_step_impl(
        T, left_u8, right_u8, mbf, min_z)
    cur_xy = jnp.stack([cur.xs, cur.ys], axis=1)

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


def fused_stereo_track(fe, left_u8, right_u8, mbf, min_z, pred_Tcw,
                       last_state, cand, th_mm, th_lm, scale_factors,
                       inv_level_sigma2, cam_params, forward, backward):
    """Dispatch the fused step and pull EVERYTHING in one device_get.

    last_state: dict with pw/has_pt/real/pid/octave/angle/desc/ur arrays
    (numpy or device).  cand: dict with pos/normal/maxd/mind/desc/alive/pid
    device arrays (padded).  cam_params: (fx, fy, cx, cy, bf, mb, min_x,
    max_x, min_y, max_y, log_scale, n_levels).

    Returns (pulled_frontend, dev_cache, FusedTrackResult) where
    pulled_frontend = (valid, xs, ys, octave, angle, response, desc, u_r,
    depth) numpy arrays and dev_cache maps field names to the
    still-resident device arrays for reuse by later programs.
    """
    (fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y, log_scale,
     n_levels) = cam_params
    out = _fused_stereo_track_jit(
        fe, fe._tables, jnp.asarray(left_u8), jnp.asarray(right_u8),
        jnp.float32(mbf), jnp.float32(min_z),
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
        int(n_levels), jnp.asarray(bool(forward)), jnp.asarray(bool(backward)))
    (cur, u_r_dev, depth_dev,
     m, n_match, R1, t1, inl1, n_map1,
     ok, sel, R2, t2, inl2, n_map2) = out

    # ONE batched pull: device_get starts all D2H copies then blocks once
    pulled = jax.device_get((
        cur.valid, cur.xs, cur.ys, cur.octave, cur.angle, cur.response,
        cur.desc, u_r_dev, depth_dev,
        m, n_match, R1, t1, inl1, n_map1,
        ok, sel, R2, t2, inl2, n_map2))
    (valid, xs, ys, octave, angle, response, desc, u_r, depth,
     m_h, n_match_h, R1_h, t1_h, inl1_h, n_map1_h,
     ok_h, sel_h, R2_h, t2_h, inl2_h, n_map2_h) = pulled

    dev_cache = {"valid": cur.valid, "desc": cur.desc, "octave": cur.octave,
                 "angle": cur.angle, "u_right": u_r_dev}
    fused = FusedTrackResult(
        m=m_h, n_match=int(n_match_h), R1=R1_h, t1=t1_h, inl1=inl1_h,
        n_map1=int(n_map1_h), ok=ok_h, sel=sel_h, R2=R2_h, t2=t2_h,
        inl2=inl2_h, n_map2=int(n_map2_h))
    return (valid, xs, ys, octave, angle, response, desc, u_r, depth), \
        dev_cache, fused
