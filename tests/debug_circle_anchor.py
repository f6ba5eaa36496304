"""Which map-point generations anchor tracking during the blowup?"""
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


def main(n=19):
    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)
    tr = slam.tracker
    m = slam.map
    for i in range(n):
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        if frame is None or not frame.pose_set:
            print(f"f{i} {state.name} no pose")
            continue
        T_gt = la.inv(seq.poses_twc[i]).astype(np.float64)
        has = (frame.map_points >= 0)
        pids = frame.map_points[has]
        ok = m.pt_alive[pids]
        pids = pids[ok]
        uv = frame.kp_xy[has][ok]
        pw = m.pt_pos[pids].astype(np.float64)
        # residual of matched points under GT pose
        pc = pw @ T_gt[:3, :3].T + T_gt[:3, 3]
        u = seq.fx * pc[:, 0] / pc[:, 2] + seq.cx
        v = seq.fy * pc[:, 1] / pc[:, 2] + seq.cy
        e_gt = np.sqrt((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)
        births = m.pt_first_kf[pids]
        bh = np.bincount(births, minlength=m.max_keyframes)
        nz = np.flatnonzero(bh)
        t_err = la.norm(frame.Tcw[:3, 3].astype(np.float64) - T_gt[:3, 3])
        print(f"f{i} {state.name} t={t_err:.3f} matched={len(pids)} "
              f"err@GT med={np.median(e_gt):.1f} p25={np.percentile(e_gt, 25):.1f} "
              f"births={[(int(k), int(bh[k])) for k in nz]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 19)
