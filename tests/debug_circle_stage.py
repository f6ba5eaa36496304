"""Stage-level diagnostics around the circle-sequence tracking loss."""
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
from jetson_slam_tpu.core import tracking as TRK


def main(n=20):
    seq = make_stereo_sequence(seed=3, n_frames=48, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)
    tr = slam.tracker

    orig_mm = TRK.Tracker._track_with_motion_model
    orig_ref = TRK.Tracker._track_reference_keyframe
    orig_proj = TRK.Tracker._project_last
    orig_opt = TRK.Tracker._optimize_pose

    def mm(self, frame):
        ok = orig_mm(self, frame)
        print(f"  motion_model -> {ok}", flush=True)
        return ok

    def ref(self, frame):
        ok = orig_ref(self, frame)
        print(f"  ref_kf({self.ref_kf}) -> {ok}", flush=True)
        return ok

    def proj(self, frame, pw, has_pt, th):
        out = orig_proj(self, frame, pw, has_pt, th)
        print(f"  project_last th={th}: candidates={int(has_pt.sum())} "
              f"matched={int((out >= 0).sum())}", flush=True)
        return out

    def opt(self, frame):
        nin = orig_opt(self, frame)
        has = (frame.map_points >= 0) | getattr(frame, 'temp_flag',
                                                np.zeros(1, bool))
        print(f"  optimize_pose: assoc={int((frame.map_points >= 0).sum())} "
              f"temp={int(frame.temp_flag.sum()) if hasattr(frame, 'temp_flag') else 0} "
              f"real_inl={nin}", flush=True)
        return nin

    TRK.Tracker._track_with_motion_model = mm
    TRK.Tracker._track_reference_keyframe = ref
    TRK.Tracker._project_last = proj
    TRK.Tracker._optimize_pose = opt

    for i in range(n):
        print(f"frame {i}", flush=True)
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        if frame is not None and frame.pose_set:
            T_gt = la.inv(seq.poses_twc[i])
            Rd = frame.Tcw[:3, :3].astype(np.float64) @ T_gt[:3, :3].T
            ang = np.rad2deg(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
            print(f"  => {state.name} rot={ang:.3f} "
                  f"inl={tr.matches_inliers}", flush=True)
        else:
            print(f"  => {state.name} (no pose)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
