"""Instrument local BA on the circle sequence: chi2 stats, pose deltas."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_slam_e2e import make_system
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
import jetson_slam_tpu.core.local_mapping as LMOD
from jetson_slam_tpu.core.local_ba import local_ba, CHI2_MONO, CHI2_STEREO


def main(n=18):
    seq = make_stereo_sequence(seed=3, n_frames=48, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)

    def probed_local_ba(cam_R, cam_t, fixed, pts, e_cam, e_pt, obs_arr,
                        is_stereo, inv_s2, e_valid, pt_edges,
                        fx, fy, cx, cy, bf, **kw):
        # pre-opt chi2
        def chi2(R, t, p):
            Rn = np.asarray(R)[np.asarray(e_cam)]
            tn = np.asarray(t)[np.asarray(e_cam)]
            pw = np.asarray(p)[np.asarray(e_pt)]
            pc = np.einsum("eij,ej->ei", Rn, pw) + tn
            z = np.maximum(pc[:, 2], 1e-6)
            u = fx * pc[:, 0] / z + cx
            v = fy * pc[:, 1] / z + cy
            ur = u - bf / z
            ob = np.asarray(obs_arr)
            st = np.asarray(is_stereo)
            r2 = (u - ob[:, 0]) ** 2 + (v - ob[:, 1]) ** 2 + \
                np.where(st, (ur - ob[:, 2]) ** 2, 0.0)
            return r2 * np.asarray(inv_s2)
        c_pre = chi2(cam_R, cam_t, pts)
        gate = np.where(np.asarray(is_stereo), CHI2_STEREO, CHI2_MONO)
        R2, t2, p2, outlier = local_ba(cam_R, cam_t, fixed, pts, e_cam, e_pt,
                                       obs_arr, is_stereo, inv_s2, e_valid,
                                       pt_edges, fx, fy, cx, cy, bf, **kw)
        c_post = chi2(R2, t2, p2)
        dr = np.linalg.norm(np.asarray(t2) - np.asarray(cam_t), axis=1)
        print(f"  LBA: C={cam_R.shape[0]} P={pts.shape[0]} E={e_cam.shape[0]} "
              f"| pre chi2 med={np.median(c_pre):.2f} p90={np.percentile(c_pre, 90):.2f} "
              f"out_pre={(c_pre > gate).sum()} "
              f"| post med={np.median(c_post):.2f} p90={np.percentile(c_post, 90):.2f} "
              f"out_post={int(np.asarray(outlier).sum())} "
              f"| max|dt|={dr.max():.4f}", flush=True)
        return R2, t2, p2, outlier

    LMOD.local_ba = probed_local_ba

    for i in range(n):
        print(f"frame {i}", flush=True)
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        print(f"  => {state.name}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 18)
