"""Decisive probe for the spin-divergence issue (run manually, not collected).

At frame 13 of a 3 deg/frame yaw sequence, measures — in ONE run —
  (a) |pi_pred(p) - kp| and |pi_gt(p) - kp| per matched pair,
  (b) the pure-geometry displacement |pi_pred(p) - pi_gt(p)| per point,
  (c) split by real map point vs temp VO point.
(b) ~ fx*dtheta ~ 14.5 px regardless of matching, so (a) cannot be small at
both poses simultaneously; whichever measurement disagrees is the buggy one.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import numpy.linalg as la
import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_slam_e2e import make_system
from jetson_slam_tpu.io import synthetic as S


def main():
    rng = np.random.default_rng(3)
    scene = S.make_scene(rng, n_points=1500, mode="ring")
    n, h, w, fx = 16, 240, 320, 300.0
    poses = []
    for k in range(n):
        yaw = np.deg2rad(3.0) * k
        T = np.eye(4)
        c, s = np.cos(yaw), np.sin(yaw)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses.append(T)
    poses = np.array(poses)
    T_rl = np.eye(4)
    T_rl[0, 3] = -0.4
    lefts = [S.render(scene, la.inv(Tw), fx, fx, 160, 120, h, w) for Tw in poses]
    rights = [S.render(scene, T_rl @ la.inv(Tw), fx, fx, 160, 120, h, w)
              for Tw in poses]

    class Seq:
        pass
    seq = Seq()
    seq.lefts, seq.rights = lefts, rights
    seq.timestamps = np.arange(n) / 20.0
    seq.poses_twc = poses
    seq.fx = seq.fy = fx
    seq.cx, seq.cy = 160.0, 120.0
    seq.baseline, seq.bf = 0.4, fx * 0.4
    slam = make_system(seq)
    tr = slam.tracker
    for i in range(13):
        slam.track_stereo(lefts[i], rights[i], seq.timestamps[i])

    i = 13
    from jetson_slam_tpu.core.frame import Frame
    fr = Frame(tr.frontend, tr.cam, seq.timestamps[i], lefts[i],
               right_img=rights[i])
    tr._update_last_frame()
    lf = tr.last_frame
    fr.set_pose(tr.velocity @ lf.Tcw)
    T_pred = fr.Tcw.copy().astype(np.float64)
    T_gt = la.inv(poses[i])

    def ang(Ta, Tb):
        Rd = Ta[:3, :3] @ Tb[:3, :3].T
        return np.rad2deg(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))

    print("pred-vs-gt: rot %.3f deg  trans %.4f m"
          % (ang(T_pred, T_gt), la.norm(T_pred[:3, 3] - T_gt[:3, 3])))
    # rotation axis of the drift
    Rd = T_pred[:3, :3] @ T_gt[:3, :3].T
    axis = np.array([Rd[2, 1] - Rd[1, 2], Rd[0, 2] - Rd[2, 0],
                     Rd[1, 0] - Rd[0, 1]])
    axis /= max(la.norm(axis), 1e-12)
    print("drift rotation axis (cam frame approx):", np.round(axis, 3))

    has_real = lf.map_points >= 0
    pw = np.zeros((lf.n_slots, 3), np.float32)
    pw[has_real] = tr.map.pt_pos[lf.map_points[has_real]]
    alive = np.zeros(lf.n_slots, bool)
    alive[has_real] = tr.map.pt_alive[lf.map_points[has_real]]
    has_pt = alive.copy()
    if tr._last_temp_flag is not None:
        has_pt |= tr._last_temp_flag
        pw[tr._last_temp_flag] = tr._last_temp_world[tr._last_temp_flag]
    ms = tr._project_last(fr, pw, has_pt, 7.0)
    tr._apply_last_matches(fr, ms)

    has = fr.map_points >= 0
    pts_real = tr.map.pt_pos[fr.map_points[has]].astype(np.float64)
    uv_real = fr.kp_xy[has].astype(np.float64)
    tmp = fr.temp_flag
    pts_tmp = fr.temp_world[tmp].astype(np.float64)
    uv_tmp = fr.kp_xy[tmp].astype(np.float64)

    def proj(T, pts):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        return np.stack([fx * pc[:, 0] / pc[:, 2] + 160,
                         fx * pc[:, 1] / pc[:, 2] + 120], 1)

    for name, pts, uv in (("REAL", pts_real, uv_real),
                          ("TEMP", pts_tmp, uv_tmp)):
        if len(pts) == 0:
            print(name, "none")
            continue
        pp = proj(T_pred, pts)
        pg = proj(T_gt, pts)
        e_pred = la.norm(pp - uv, axis=1)
        e_gt = la.norm(pg - uv, axis=1)
        disp = la.norm(pp - pg, axis=1)
        print("%s n=%d | err@pred med %.2f p90 %.2f | err@gt med %.2f "
              "p90 %.2f | pred-gt displacement med %.2f p10 %.2f p90 %.2f"
              % (name, len(pts), np.median(e_pred),
                 np.percentile(e_pred, 90), np.median(e_gt),
                 np.percentile(e_gt, 90), np.median(disp),
                 np.percentile(disp, 10), np.percentile(disp, 90)))
    # where are the REAL map points relative to GT scene? nearest-neighbour
    d = np.sqrt(((pts_real[:, None, :] -
                  scene.points[None, :, :]) ** 2).sum(-1)).min(1)
    print("REAL map-point dist to nearest GT scene point: med %.3f p90 %.3f"
          % (np.median(d), np.percentile(d, 90)))
    # last-frame pose drift
    print("last-frame est-vs-gt rot: %.3f deg"
          % ang(lf.Tcw.astype(np.float64), la.inv(poses[12])))


if __name__ == "__main__":
    main()
