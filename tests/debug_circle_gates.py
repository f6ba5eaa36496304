"""Dissect search_by_projection_last gates at the failing frames."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
import numpy.linalg as la
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_slam_e2e import make_system
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.core import tracking as TRK
from jetson_slam_tpu.ops.hamming import hamming_matrix


def main(probe_frames=(16, 19, 20, 21), n=22):
    seq = make_stereo_sequence(seed=3, n_frames=48, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)
    tr = slam.tracker

    orig_proj = TRK.Tracker._project_last
    def proj(self, frame, pw, has_pt, th):
        out = orig_proj(self, frame, pw, has_pt, th)
        if frame.frame_id in probe_frames:
            lf = self.last_frame
            Rcw, tcw = frame.Rcw, frame.tcw
            pc = pw @ Rcw.T + tcw
            z = pc[:, 2]
            u = self.cam.fx * pc[:, 0] / np.maximum(z, 1e-9) + self.cam.cx
            v = self.cam.fy * pc[:, 1] / np.maximum(z, 1e-9) + self.cam.cy
            ok = has_pt & (z > 0) & (u >= 0) & (u <= 320) & (v >= 0) & (v <= 240)
            cur = frame.kp_xy[frame.valid]
            # geometric reachability: nearest current kp to each projection
            d = np.sqrt((cur[None, :, 0] - u[ok][:, None]) ** 2 +
                        (cur[None, :, 1] - v[ok][:, None]) ** 2).min(1)
            # descriptor distance to best in-window candidate
            radius = th * self.scale_factors[lf.octave]
            du = np.abs(frame.kp_xy[None, :, 0] - u[:, None])
            dv = np.abs(frame.kp_xy[None, :, 1] - v[:, None])
            inw = (du < radius[:, None]) & (dv < radius[:, None]) & \
                frame.valid[None, :]
            hm = np.asarray(hamming_matrix(jnp.asarray(lf.desc),
                                           jnp.asarray(frame.desc)))
            hm_w = np.where(inw, hm, 9999)
            bd = hm_w.min(1)
            n_inw = inw.sum(1)
            oct_l = lf.octave
            print(f"  f{frame.frame_id} th={th}: proj_ok={int(ok.sum())} "
                  f"projNN med={np.median(d):.1f} p90={np.percentile(d, 90):.1f} | "
                  f"inwindow>0: {int((n_inw[ok] > 0).sum())} "
                  f"bestH med={np.median(bd[ok & (n_inw > 0)]):.0f} "
                  f"<=100: {int((bd[ok] <= 100).sum())} "
                  f"matched={int((out >= 0).sum())} "
                  f"oct_hist={np.bincount(oct_l[ok], minlength=3)}",
                  flush=True)
        return out
    TRK.Tracker._project_last = proj

    for i in range(n):
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        print(f"f{i} {state.name}", flush=True)


if __name__ == "__main__":
    main()
