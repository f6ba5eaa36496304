"""Batched data association: projection search, frustum culling, BoW-free
brute-force matching.

TPU re-design of src/ORBmatcher.cpp + the GPU kernels it drives
(src/cuda/orb_matcher.cu batch project/Hamming,
src/cuda/tracking_isinfrustum.cu batch visibility):

- `search_by_projection_last`  <- ORBmatcher::SearchByProjection(F, LastFrame,
  th, bMono) (ORBmatcher.cpp:1315-1966): motion-model tracking.
- `frustum_check`              <- isInFrustum_GPU (tracking_isinfrustum.cu:19-110).
- `search_by_projection_points`<- ORBmatcher::SearchByProjection(F, vpMapPoints,
  th) (ORBmatcher.cpp:32-144): local-map tracking.
- `match_brute_force`          <- ORBmatcher::SearchByBoW semantics without the
  vocabulary speedup (same gates: TH_LOW, ratio test, rotation histogram).

All functions are jitted over dense padded slot arrays; candidate gating is a
(Q, S) mask, Hamming distances ride the MXU (ops/hamming.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hamming import hamming_matrix

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
BIG = jnp.int32(1 << 29)


def rotation_consistency(rot_deg, matched):
    """Keep only matches whose angle difference falls in the 3 largest of 30
    bins (ORBmatcher::ComputeThreeMaxima, ORBmatcher.cpp:2097-2141)."""
    bin_f = jnp.round(rot_deg * (HISTO_LENGTH / 360.0))
    bin_i = jnp.where(bin_f == HISTO_LENGTH, 0, bin_f).astype(jnp.int32) % HISTO_LENGTH
    counts = jnp.zeros(HISTO_LENGTH, jnp.int32).at[
        jnp.where(matched, bin_i, 0)].add(jnp.where(matched, 1, 0))
    top_vals, top_idx = jax.lax.top_k(counts, 3)
    # reference: 2nd/3rd bins dropped when below 0.1 * max count
    keep = top_vals.astype(jnp.float32) > 0.1 * top_vals[0].astype(jnp.float32)
    keep = keep.at[0].set(top_vals[0] > 0)
    keep_bin = jnp.zeros(HISTO_LENGTH, bool).at[top_idx].set(keep)
    return matched & jnp.take(keep_bin, bin_i)


def _search_by_projection_last_impl(
    Rcw, tcw,
    last_pw, last_has_pt, last_octave, last_angle, last_desc, last_is_stereo,
    cur_xy, cur_octave, cur_angle, cur_desc, cur_valid, cur_ur,
    th, scale_factors, n_levels: int,
    fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y, forward, backward,
    orb_dist=None,
):
    """Motion-model projection search (spec: ORBmatcher.cpp:1315-1966).

    Per last-frame slot carrying a map point: project its world position into
    the current frame; candidate current slots within radius
    th*scale_factor[last_octave], octave gated by the camera's forward/backward
    motion; pick min-Hamming <= TH_HIGH; then rotation-histogram filter.

    Returns per-current-slot index into last slots (-1 = unmatched), with the
    reference's iteration-order overwrite semantics (higher last slot wins).
    """
    S_last = last_pw.shape[0]
    S_cur = cur_xy.shape[0]
    sf = jnp.asarray(scale_factors, jnp.float32)

    pc = last_pw @ Rcw.T + tcw
    z = pc[:, 2]
    invz = 1.0 / jnp.maximum(z, 1e-9)
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    ur_proj = u - bf * invz

    proj_ok = last_has_pt & (z > 0) & (u >= min_x) & (u <= max_x) & \
        (v >= min_y) & (v <= max_y)

    radius = th * jnp.take(sf, last_octave)
    lo = last_octave
    oct_lo = jnp.where(forward, lo, jnp.where(backward, 0, lo - 1))
    oct_hi = jnp.where(forward, n_levels - 1, jnp.where(backward, lo, lo + 1))

    du = jnp.abs(cur_xy[None, :, 0] - u[:, None])
    dv = jnp.abs(cur_xy[None, :, 1] - v[:, None])
    in_window = (du < radius[:, None]) & (dv < radius[:, None])
    oct_ok = (cur_octave[None, :] >= oct_lo[:, None]) & \
        (cur_octave[None, :] <= oct_hi[:, None])
    stereo_ok = jnp.where(
        cur_ur[None, :] > 0,
        jnp.abs(ur_proj[:, None] - cur_ur[None, :]) < radius[:, None],
        True)
    cand = proj_ok[:, None] & cur_valid[None, :] & in_window & oct_ok & stereo_ok

    dist = jnp.where(cand, hamming_matrix(last_desc, cur_desc), BIG)
    best_cur = jnp.argmin(dist, axis=1)
    best_dist = jnp.take_along_axis(dist, best_cur[:, None], axis=1)[:, 0]
    # orb_dist: relocalization's narrow retry uses ORBdist=64 instead of
    # TH_HIGH (Tracking.cpp:2090: SearchByProjection(..., 3, 64))
    matched = best_dist <= (TH_HIGH if orb_dist is None else orb_dist)

    rot = last_angle - jnp.take(cur_angle, best_cur)
    matched = rotation_consistency(rot, matched)

    # scatter: cur slot <- last slot (later last slots overwrite, like the
    # reference's sequential loop)
    out = jnp.full(S_cur, -1, jnp.int32)
    tgt = jnp.where(matched, best_cur, S_cur)
    out = jnp.zeros(S_cur + 1, jnp.int32).at[:].set(-1).at[tgt].set(
        jnp.arange(S_last, dtype=jnp.int32), mode="drop")[:S_cur]
    return out, matched


search_by_projection_last = partial(jax.jit, static_argnames=("n_levels",))(
    _search_by_projection_last_impl)


def _frustum_check_impl(pw, pn, max_dist_raw, min_dist_raw, Rcw, tcw, Ow,
                  fx, fy, cx, cy, min_x, max_x, min_y, max_y,
                  n_levels, log_scale, view_cos_th, alive):
    """Batch MapPoint visibility (spec: tracking_isinfrustum.cu:19-110).

    max/min_dist_raw are the unscaled mfMax/MinDistance; gating uses the
    [0.8, 1.2]x invariances like MapPoint::Get{Min,Max}DistanceInvariance,
    while scale prediction uses the raw max distance (kernel line 83).
    Returns (ok, u, v, invz, predicted_level, view_cos).
    """
    pc = pw @ Rcw.T + tcw
    z = pc[:, 2]
    invz = 1.0 / jnp.maximum(z, 1e-9)
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    po = pw - Ow
    dist = jnp.linalg.norm(po, axis=1)
    view_cos = jnp.sum(po * pn, axis=1) / jnp.maximum(dist, 1e-9)
    ratio = max_dist_raw / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale).astype(jnp.int32)
    level = jnp.clip(level, 0, n_levels - 1)
    ok = (
        alive & (z > 0)
        & (u >= min_x) & (u <= max_x) & (v >= min_y) & (v <= max_y)
        & (dist >= 0.8 * min_dist_raw) & (dist <= 1.2 * max_dist_raw)
        & (view_cos >= view_cos_th)
    )
    return ok, u, v, invz, level, view_cos


frustum_check = jax.jit(_frustum_check_impl)


def _search_by_projection_points_impl(
    u, v, ur_proj, pred_level, view_cos, pt_ok, pt_desc,
    cur_xy, cur_octave, cur_desc, cur_valid, cur_ur, cur_free,
    th, scale_factors, n_levels: int, nn_ratio=0.8, fuse: bool = False,
):
    """Local-map projection search (spec: ORBmatcher.cpp:32-144).

    Inputs u/v/pred_level/view_cos come from frustum_check.  cur_free masks
    current slots that do not already hold a map point observation.
    Returns per-current-slot index into the point list (-1 = none).

    fuse=True switches to ORBmatcher::Fuse gates (ORBmatcher.cpp:812-962):
    per-candidate reprojection chi2 <= 5.99 (mono) / 7.8 (stereo, with the
    ur residual) x sigma2 of the candidate's octave, and descriptor distance
    <= TH_LOW instead of TH_HIGH.  Without the chi2 gate, fuse merges nearby
    distinct corners and the map accumulates multi-pixel-residual edges that
    local BA then erases wholesale.
    """
    sf = jnp.asarray(scale_factors, jnp.float32)
    r = jnp.where(view_cos > 0.998, 2.5, 4.0) * th
    radius = r * jnp.take(sf, pred_level)

    du = jnp.abs(cur_xy[None, :, 0] - u[:, None])
    dv = jnp.abs(cur_xy[None, :, 1] - v[:, None])
    in_window = (du < radius[:, None]) & (dv < radius[:, None])
    oct_ok = (cur_octave[None, :] >= pred_level[:, None] - 1) & \
        (cur_octave[None, :] <= pred_level[:, None])
    cand = pt_ok[:, None] & cur_valid[None, :] & cur_free[None, :] & \
        in_window & oct_ok
    if fuse:
        inv_s2 = 1.0 / (jnp.take(sf, cur_octave) ** 2)
        e2 = du * du + dv * dv
        is_st = cur_ur[None, :] >= 0
        dur = ur_proj[:, None] - cur_ur[None, :]
        chi2 = jnp.where(is_st, (e2 + dur * dur), e2) * inv_s2[None, :]
        gate = jnp.where(is_st, 7.8, 5.99)
        cand = cand & (chi2 <= gate)

    desc_th = TH_LOW if fuse else TH_HIGH
    dist = jnp.where(cand, hamming_matrix(pt_desc, cur_desc), BIG)
    # best and second best with level bookkeeping
    best_cur = jnp.argmin(dist, axis=1)
    best_dist = jnp.take_along_axis(dist, best_cur[:, None], axis=1)[:, 0]
    best_level = jnp.take(cur_octave, best_cur)
    dist2 = dist.at[jnp.arange(dist.shape[0]), best_cur].set(BIG)
    second_cur = jnp.argmin(dist2, axis=1)
    second_dist = jnp.take_along_axis(dist2, second_cur[:, None], axis=1)[:, 0]
    second_level = jnp.take(cur_octave, second_cur)

    ratio_reject = (best_level == second_level) & \
        (best_dist.astype(jnp.float32) > nn_ratio * second_dist.astype(jnp.float32))
    matched = (best_dist <= desc_th) & ~ratio_reject

    S_cur = cur_xy.shape[0]
    tgt = jnp.where(matched, best_cur, S_cur)
    out = jnp.zeros(S_cur + 1, jnp.int32).at[:].set(-1).at[tgt].set(
        jnp.arange(u.shape[0], dtype=jnp.int32), mode="drop")[:S_cur]
    return out


search_by_projection_points = partial(
    jax.jit, static_argnames=("n_levels", "fuse"))(
        _search_by_projection_points_impl)


def _motion_model_track_impl(
    Rcw, tcw,
    last_pw, last_has_pt, last_real,
    last_octave, last_angle, last_desc, last_ur,
    cur_xy, cur_octave, cur_angle, cur_desc, cur_valid, cur_ur,
    th, scale_factors, inv_level_sigma2, n_levels: int,
    fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y,
    forward: bool, backward: bool,
):
    """Fused Tracking::TrackWithMotionModel device step: projection search
    (including the reference's <20-matches retry at 2*th,
    Tracking.cpp:1060-1066) + motion-only PoseOptimization, so the whole
    motion-model track costs ONE device round-trip instead of three.

    last_real marks last slots whose point is a real alive map point (temp
    VO points count for the optimization but not for the inlier tally,
    Tracking.cpp:1098-1113 counts mvpMapPoints inliers).
    Returns (match_slot, n_match, Rcw', tcw', inlier, n_map).
    """
    from .optimizer import _pose_optimization

    last_is_stereo = last_ur >= 0

    def search(thv):
        out, _ = _search_by_projection_last_impl(
            Rcw, tcw, last_pw, last_has_pt, last_octave, last_angle,
            last_desc, last_is_stereo, cur_xy, cur_octave, cur_angle,
            cur_desc, cur_valid, cur_ur, thv, scale_factors, n_levels,
            fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y,
            forward, backward)
        return out

    m1 = search(th)
    n1 = jnp.sum(m1 >= 0)
    m = jax.lax.cond(n1 < 20, lambda: search(2.0 * th), lambda: m1)
    n_match = jnp.sum(m >= 0)

    has_m = m >= 0
    midx = jnp.where(has_m, m, 0)
    pts = jnp.take(last_pw, midx, axis=0)
    has_real = has_m & jnp.take(last_real, midx)
    inv_s2 = jnp.take(jnp.asarray(inv_level_sigma2, jnp.float32), cur_octave)
    with jax.default_matmul_precision("highest"):
        R, t, inlier, _ = _pose_optimization(
            Rcw, tcw, pts, cur_xy, cur_ur, inv_s2, has_m,
            fx, fy, cx, cy, bf)
    n_map = jnp.sum((inlier & has_real).astype(jnp.int32))
    return m, n_match, R, t, inlier, n_map


motion_model_track = partial(
    jax.jit, static_argnames=("n_levels", "forward", "backward"))(
        _motion_model_track_impl)


def _local_map_track_impl(
    cand_pos, cand_normal, cand_maxd, cand_mind, cand_desc, cand_alive,
    Rcw, tcw, Ow,
    cur_xy, cur_octave, cur_desc, cur_valid, cur_ur, cur_free,
    exist_pts, exist_has, exist_real,
    th, scale_factors, inv_level_sigma2, n_levels: int,
    fx, fy, cx, cy, bf, min_x, max_x, min_y, max_y, log_scale,
):
    """Fused Tracking::TrackLocalMap device step: batched frustum culling
    (isInFrustum_GPU semantics) + SearchByProjection(local map) + motion-only
    PoseOptimization — ONE device round-trip instead of three.

    exist_pts/exist_has/exist_real describe the frame's pre-existing
    associations (motion-model matches + temp VO points); newly selected
    candidates (all real map points) override their slots.
    Returns (ok, sel, Rcw', tcw', inlier, n_map).
    """
    from .optimizer import _pose_optimization

    ok, u, v, invz, lvl, vcos = _frustum_check_impl(
        cand_pos, cand_normal, cand_maxd, cand_mind, Rcw, tcw, Ow,
        fx, fy, cx, cy, min_x, max_x, min_y, max_y,
        n_levels, log_scale, 0.5, cand_alive)
    ur_proj = u - bf * invz
    sel = _search_by_projection_points_impl(
        u, v, ur_proj, lvl, vcos, ok, cand_desc,
        cur_xy, cur_octave, cur_desc, cur_valid, cur_ur, cur_free,
        th, scale_factors, n_levels)

    has_sel = sel >= 0
    sidx = jnp.where(has_sel, sel, 0)
    pts = jnp.where(has_sel[:, None], jnp.take(cand_pos, sidx, axis=0),
                    exist_pts)
    has_any = exist_has | has_sel
    has_real = exist_real | has_sel
    inv_s2 = jnp.take(jnp.asarray(inv_level_sigma2, jnp.float32), cur_octave)
    with jax.default_matmul_precision("highest"):
        R, t, inlier, _ = _pose_optimization(
            Rcw, tcw, pts, cur_xy, cur_ur, inv_s2, has_any,
            fx, fy, cx, cy, bf)
    n_map = jnp.sum((inlier & has_real).astype(jnp.int32))
    return ok, sel, R, t, inlier, n_map


local_map_track = partial(jax.jit, static_argnames=("n_levels",))(
    _local_map_track_impl)


def _sim3_direction(pos_w, pt_desc, pt_ok, mind_raw, maxd_raw,
                    R_own, t_own, sR_to_other, t_to_other,
                    kp_xy, kp_octave, kp_desc, kp_valid,
                    th, sf, n_levels: int,
                    min_x, max_x, min_y, max_y, fx, fy, cx, cy, log_scale):
    """One direction of SearchBySim3: project side-A map points through its
    own pose then the Sim3 into side-B's camera, window+octave-gate side-B
    keypoints, best Hamming <= TH_HIGH.  Returns per-A-slot best B slot
    (-1 = none).  Spec: ORBmatcher.cpp:1135-1211 (and the mirrored loop)."""
    pc_own = pos_w @ R_own.T + t_own
    pc = pc_own @ sR_to_other.T + t_to_other
    z = pc[:, 2]
    invz = 1.0 / jnp.maximum(z, 1e-9)
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    dist3d = jnp.linalg.norm(pc, axis=1)
    ratio = maxd_raw / jnp.maximum(dist3d, 1e-9)
    pred = jnp.clip(jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale
                             ).astype(jnp.int32), 0, n_levels - 1)
    ok = (pt_ok & (z > 0)
          & (u >= min_x) & (u <= max_x) & (v >= min_y) & (v <= max_y)
          & (dist3d >= 0.8 * mind_raw) & (dist3d <= 1.2 * maxd_raw))
    radius = th * jnp.take(sf, pred)
    du = jnp.abs(kp_xy[None, :, 0] - u[:, None])
    dv = jnp.abs(kp_xy[None, :, 1] - v[:, None])
    cand = (ok[:, None] & kp_valid[None, :]
            & (du < radius[:, None]) & (dv < radius[:, None])
            & (kp_octave[None, :] >= pred[:, None] - 1)
            & (kp_octave[None, :] <= pred[:, None]))
    dist = jnp.where(cand, hamming_matrix(pt_desc, kp_desc), BIG)
    best = jnp.argmin(dist, axis=1)
    best_dist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    return jnp.where(best_dist <= TH_HIGH, best.astype(jnp.int32), -1)


def _search_by_sim3_impl(
    xy1, oct1, kdesc1, kvalid1, pos1, pdesc1, has1, mind1, maxd1,
    xy2, oct2, kdesc2, kvalid2, pos2, pdesc2, has2, mind2, maxd2,
    R1w, t1w, R2w, t2w, s12, R12, t12,
    th, scale_factors, n_levels: int,
    min_x, max_x, min_y, max_y, fx, fy, cx, cy, log_scale,
):
    """ORBmatcher::SearchBySim3 (ORBmatcher.cpp:1089-1313) as two batched
    projections + a mutual-agreement check.

    Convention matches the reference: S12 = (s12, R12, t12) maps KF2-camera
    coords into KF1-camera coords (p1 = s12 R12 p2 + t12).  hasN marks slots
    carrying an alive, not-already-matched map point; posN/pdescN/mindN/maxdN
    are that point's world position, distinctive descriptor and raw scale
    invariance distances.  Returns per-KF1-slot best KF2 slot (-1 = none)
    where both directions agree.
    """
    sf = jnp.asarray(scale_factors, jnp.float32)
    sR21 = (1.0 / s12) * R12.T
    t21 = -(sR21 @ t12)
    sR12 = s12 * R12
    m1 = _sim3_direction(pos1, pdesc1, has1, mind1, maxd1, R1w, t1w,
                         sR21, t21, xy2, oct2, kdesc2, kvalid2, th, sf,
                         n_levels, min_x, max_x, min_y, max_y,
                         fx, fy, cx, cy, log_scale)
    m2 = _sim3_direction(pos2, pdesc2, has2, mind2, maxd2, R2w, t2w,
                         sR12, t12, xy1, oct1, kdesc1, kvalid1, th, sf,
                         n_levels, min_x, max_x, min_y, max_y,
                         fx, fy, cx, cy, log_scale)
    # agreement: m2 of my best slot must point back at me, and the target
    # slot must itself carry a map point (vpMapPoints2[idx2] non-null)
    S1 = m1.shape[0]
    idx2 = jnp.where(m1 >= 0, m1, 0)
    back = jnp.take(m2, idx2)
    tgt_has = jnp.take(has2, idx2)
    agree = (m1 >= 0) & tgt_has & (back == jnp.arange(S1, dtype=jnp.int32))
    return jnp.where(agree, m1, -1)


search_by_sim3 = partial(jax.jit, static_argnames=("n_levels",))(
    _search_by_sim3_impl)


def _search_loop_projection_impl(
    u, v, pred_level, pt_ok, pt_desc,
    cur_xy, cur_octave, cur_desc, cur_valid, cur_free,
    th, scale_factors,
):
    """Guided projection of loop-region map points into the current keyframe
    under the corrected Sim3 pose (ORBmatcher::SearchByProjection(KeyFrame*,
    Scw, ...), ORBmatcher.cpp:277-391): radius th*sf[predicted level], octave
    in [pred-1, pred], best Hamming <= TH_LOW, already-matched slots excluded
    via cur_free.  u/v/pred_level/pt_ok come from frustum_check (which owns
    the depth / distance-invariance / 60-degree view-angle gates).
    Returns per-current-slot point index (-1 = none)."""
    sf = jnp.asarray(scale_factors, jnp.float32)
    radius = th * jnp.take(sf, pred_level)
    du = jnp.abs(cur_xy[None, :, 0] - u[:, None])
    dv = jnp.abs(cur_xy[None, :, 1] - v[:, None])
    cand = (pt_ok[:, None] & cur_valid[None, :] & cur_free[None, :]
            & (du < radius[:, None]) & (dv < radius[:, None])
            & (cur_octave[None, :] >= pred_level[:, None] - 1)
            & (cur_octave[None, :] <= pred_level[:, None]))
    dist = jnp.where(cand, hamming_matrix(pt_desc, cur_desc), BIG)
    best_cur = jnp.argmin(dist, axis=1)
    best_dist = jnp.take_along_axis(dist, best_cur[:, None], axis=1)[:, 0]
    matched = best_dist <= TH_LOW
    S_cur = cur_xy.shape[0]
    tgt = jnp.where(matched, best_cur, S_cur)
    out = jnp.zeros(S_cur + 1, jnp.int32).at[:].set(-1).at[tgt].set(
        jnp.arange(u.shape[0], dtype=jnp.int32), mode="drop")[:S_cur]
    return out


search_loop_projection = jax.jit(_search_loop_projection_impl)


@jax.jit
def match_brute_force(desc_a, valid_a, angle_a, desc_b, valid_b, angle_b,
                      check_rotation=True, nn_ratio=0.7,
                      node_a=None, node_b=None):
    """All-pairs descriptor matching with ratio + rotation gates.

    ORBmatcher::SearchByBoW (ORBmatcher.cpp:146-275) as one masked MXU
    Hamming matrix.  When node_a/node_b (vocabulary node ids at `levelsup`,
    bow/vocabulary.transform) are given, candidates are restricted to pairs
    in the SAME node — the reference's FeatureVector bucketing, which both
    prunes aliased matches and matches the behavior contract; without them
    the candidate set is all valid pairs (a superset).  Gates (TH_LOW, nn
    ratio, rotation histogram) are identical either way.
    Returns per-a-slot index into b (-1 = none).
    """
    ok = valid_a[:, None] & valid_b[None, :]
    if node_a is not None:
        ok = ok & (node_a[:, None] == node_b[None, :])
    dist = jnp.where(ok, hamming_matrix(desc_a, desc_b), BIG)
    best_b = jnp.argmin(dist, axis=1)
    best_dist = jnp.take_along_axis(dist, best_b[:, None], axis=1)[:, 0]
    d2 = dist.at[jnp.arange(dist.shape[0]), best_b].set(BIG)
    second = jnp.min(d2, axis=1)
    matched = (best_dist <= TH_LOW) & \
        (best_dist.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    rot = angle_a - jnp.take(angle_b, best_b)
    matched = jnp.where(check_rotation, rotation_consistency(rot, matched), matched)
    # enforce injectivity (one a per b): keep the best a per b
    S_a, S_b = dist.shape
    a_of_b = jnp.full(S_b + 1, -1, jnp.int32)
    order = jnp.argsort(-best_dist)  # worse first, better overwrite
    tgt = jnp.where(jnp.take(matched, order), jnp.take(best_b, order), S_b)
    a_of_b = a_of_b.at[tgt].set(order.astype(jnp.int32), mode="drop")[:S_b]
    match_a = jnp.full(S_a, -1, jnp.int32)
    bidx = jnp.arange(S_b, dtype=jnp.int32)
    src = jnp.where(a_of_b >= 0, a_of_b, S_a)
    match_a = jnp.zeros(S_a + 1, jnp.int32).at[:].set(-1).at[src].set(
        bidx, mode="drop")[:S_a]
    return match_a, best_dist
