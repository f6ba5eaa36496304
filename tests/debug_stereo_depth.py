"""Stereo depth accuracy vs ground-truth render depth on circle frames."""
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
from jetson_slam_tpu.core.frame import Frame


def main(frames=(0, 14, 16, 17, 18, 19)):
    seq = S.make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                                 trajectory="circle", n_points=1200)
    rng = np.random.default_rng(3)
    scene = S.make_scene(rng, n_points=1200, mode="ring")
    slam = make_system(seq)
    tr = slam.tracker
    for fi in frames:
        T_cw = la.inv(seq.poses_twc[fi])
        gt_depth = S._render_depth(scene, T_cw, seq.fx, seq.fy, seq.cx,
                                   seq.cy, 240, 320)
        fr = Frame(tr.frontend, tr.cam, seq.timestamps[fi], seq.lefts[fi],
                   right_img=seq.rights[fi])
        has = (fr.depth > 0) & fr.valid
        xs = np.clip(np.round(fr.kp_xy[has, 0]).astype(int), 0, 319)
        ys = np.clip(np.round(fr.kp_xy[has, 1]).astype(int), 0, 239)
        gt = gt_depth[ys, xs]
        est = fr.depth[has]
        ok = gt > 0
        rel = np.abs(est[ok] - gt[ok]) / gt[ok]
        # disparity error in px
        disp_est = seq.bf / est[ok]
        disp_gt = seq.bf / gt[ok]
        derr = np.abs(disp_est - disp_gt)
        print(f"f{fi}: n={ok.sum()} rel_depth_err med={np.median(rel)*100:.2f}% "
              f"p90={np.percentile(rel, 90)*100:.2f}% "
              f"| disp_err px med={np.median(derr):.3f} p90="
              f"{np.percentile(derr, 90):.3f} "
              f">1px: {(derr > 1).mean()*100:.1f}%  >2px: {(derr > 2).mean()*100:.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
