"""Measure motion-model prediction error vs final pose on the circle run."""
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


def main(n=24):
    seq = make_stereo_sequence(seed=3, n_frames=48, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)
    tr = slam.tracker

    pred_holder = {}
    orig_mm = TRK.Tracker._track_with_motion_model
    def mm(self, frame):
        self._update_last_frame()
        pred = (self.velocity @ self.last_frame.Tcw).astype(np.float64)
        pred_holder["T"] = pred
        return orig_mm(self, frame)
    TRK.Tracker._track_with_motion_model = mm

    for i in range(n):
        pred_holder.clear()
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        T_gt = la.inv(seq.poses_twc[i])
        line = f"f{i} {state.name}"
        if "T" in pred_holder and frame is not None and frame.pose_set:
            Tp = pred_holder["T"]
            Tf = frame.Tcw.astype(np.float64)
            def err(Ta, Tb):
                Rd = Ta[:3, :3] @ Tb[:3, :3].T
                a = np.rad2deg(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
                return a, la.norm(Ta[:3, 3] - Tb[:3, 3])
            pr, pt = err(Tp, Tf)
            gr, gt_ = err(Tf, T_gt)
            line += (f" pred-vs-final rot={pr:.2f} t={pt:.3f} | "
                     f"final-vs-gt rot={gr:.2f} t={gt_:.3f}")
        print(line, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
