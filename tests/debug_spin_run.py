"""Full spin diagnostic: 3 deg/frame yaw, 30 frames, per-frame pose error."""
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


def main(n=30):
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
    slam = make_system(seq)
    tr = slam.tracker
    for i in range(n):
        state, frame = slam.track_stereo(lefts[i], rights[i],
                                         seq.timestamps[i])
        if frame is not None and frame.pose_set:
            T_est = frame.Tcw.astype(np.float64)
            T_gt = la.inv(poses[i])
            Rd = T_est[:3, :3] @ T_gt[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
            terr = la.norm(T_est[:3, 3] - T_gt[:3, 3])
            print(f"f{i} {state.name} inl={tr.matches_inliers} "
                  f"rot={ang:.3f}deg t={terr:.3f}m", flush=True)
        else:
            print(f"f{i} {state.name} (no pose)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
