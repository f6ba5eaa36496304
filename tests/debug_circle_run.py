"""Per-frame diagnostics on the loop-closing circle sequence."""
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
from jetson_slam_tpu.io.synthetic import make_stereo_sequence


def main(n=48):
    seq = make_stereo_sequence(seed=3, n_frames=n, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)
    tr = slam.tracker
    for i in range(n):
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        if frame is not None and frame.pose_set:
            T_est = frame.Tcw.astype(np.float64)
            T_gt = la.inv(seq.poses_twc[i])
            Rd = T_est[:3, :3] @ T_gt[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
            terr = la.norm(T_est[:3, 3] - T_gt[:3, 3])
            nval = int(frame.valid.sum())
            print(f"f{i} {state.name} inl={tr.matches_inliers} kp={nval} "
                  f"rot={ang:.3f} t={terr:.4f} nKF={len(slam.map.keyframe_ids())}",
                  flush=True)
        else:
            print(f"f{i} {state.name} (no pose)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 48)
