"""Experiment matrix for the spin-drift issue.

Variants (select with argv[1]):
  base      — current pipeline
  notemp    — no temp VO points in UpdateLastFrame
  noba      — local BA disabled
  nosubpix  — frontend subpixel refinement off
  noerase   — local BA keeps outlier observations (no erasure)
  gtpose    — oracle: overwrite optimized pose with GT each frame
              (isolates map-construction bias from pose estimation)
  gtmap     — oracle: after each frame, snap map points to GT scene NN
Each prints per-frame rot/trans error vs GT.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
import numpy.linalg as la

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_slam_e2e import make_system
from jetson_slam_tpu.io import synthetic as S


def build_seq(n=24):
    rng = np.random.default_rng(3)
    scene = S.make_scene(rng, n_points=1500, mode="ring")
    h, w, fx = 240, 320, 300.0
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
    seq.scene = scene
    return seq


def main(variant="base", n=24):
    seq = build_seq(n)
    kw = {}
    if variant == "noba":
        kw["enable_ba"] = False
    slam = make_system(seq, **kw)
    tr = slam.tracker

    if variant == "notemp":
        orig = tr._update_last_frame
        def patched():
            orig()
            tr._last_temp_world = None
            tr._last_temp_flag = None
        tr._update_last_frame = patched
    if variant == "nosubpix":
        # rebuild the system with subpixel off
        slam = make_system(seq)
        slam.frontend.subpixel = False
        import jax
        slam.frontend._extract = jax.jit(slam.frontend._extract_impl)
        slam.tracker.frontend = slam.frontend
        tr = slam.tracker
    if variant == "noerase":
        import jetson_slam_tpu.core.local_mapping as LM
        lm = slam.local_mapper
        orig_lba = lm.local_bundle_adjustment
        import jetson_slam_tpu.core.map as MAP
        orig_erase = slam.map.erase_observation
        erased = []
        def lba(kid):
            slam.map.erase_observation = lambda k, s: erased.append((k, s))
            try:
                orig_lba(kid)
            finally:
                slam.map.erase_observation = orig_erase
        lm.local_bundle_adjustment = lba

    for i in range(n):
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        if variant == "gtpose" and frame is not None and frame.pose_set:
            frame.set_pose(la.inv(seq.poses_twc[i]).astype(np.float32))
        if frame is not None and frame.pose_set:
            T_est = frame.Tcw.astype(np.float64)
            T_gt = la.inv(seq.poses_twc[i])
            Rd = T_est[:3, :3] @ T_gt[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
            terr = la.norm(T_est[:3, 3] - T_gt[:3, 3])
            # map quality: KF pose error of newest KF + point NN distance
            m = slam.map
            kids = m.keyframe_ids()
            pid_alive = np.flatnonzero(m.pt_alive[:m.max_points])
            if len(pid_alive) > 400:
                pid_alive = pid_alive[np.linspace(0, len(pid_alive) - 1, 400).astype(int)]
            d = np.sqrt(((m.pt_pos[pid_alive][:, None, :] -
                          seq.scene.points[None]) ** 2).sum(-1)).min(1)
            print(f"f{i} {state.name} inl={tr.matches_inliers} "
                  f"rot={ang:.3f} t={terr:.4f} nKF={len(kids)} "
                  f"ptNN med={np.median(d):.3f}", flush=True)
        else:
            print(f"f{i} {state.name} (no pose)", flush=True)
    if variant == "noerase":
        print("suppressed erasures:", len(erased))


if __name__ == "__main__":
    v = sys.argv[1] if len(sys.argv) > 1 else "base"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    main(v, n)
