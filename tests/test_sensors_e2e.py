"""RGB-D and monocular end-to-end SLAM on the synthetic scene.

Completes sensor coverage next to tests/test_slam_e2e.py's stereo runs:
- RGB-D: depth image -> virtual right coordinate (Frame.cpp:996-1017),
  otherwise the stereo pipeline; ATE gated with SE(3) alignment.
- Monocular: H/F-RANSAC initialization (Initializer.h:43) then tracking;
  scale is unobservable, so ATE is gated after Sim(3) alignment.
"""
import numpy as np
import pytest

from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem


def _cfg(seq):
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 320; cfg.camera.height = 240; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.orb.n_levels = 4; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    return cfg


@pytest.mark.slow
def test_rgbd_e2e():
    seq = make_stereo_sequence(seed=4, n_frames=12, h=240, w=320,
                               with_depth=True)
    slam = SlamSystem(_cfg(seq), sensor="rgbd")
    for i in range(len(seq.lefts)):
        state, _ = slam.track_rgbd(seq.lefts[i], seq.depths[i],
                                   seq.timestamps[i])
    assert state == TrackingState.OK
    assert slam.map.n_points() > 100
    est_ts, est_p = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc)
    assert ate < 0.05, f"RGB-D ATE {ate}"
    # steady state must ride the single-round-trip fused step (rgbd mode)
    assert slam.tracker.fused_frames >= len(seq.lefts) - 4, \
        f"fused path used on only {slam.tracker.fused_frames} frames"


@pytest.mark.slow
def test_mono_e2e():
    seq = make_stereo_sequence(seed=6, n_frames=14, h=240, w=320)
    slam = SlamSystem(_cfg(seq), sensor="mono")
    states = []
    for i in range(len(seq.lefts)):
        state, _ = slam.track_monocular(seq.lefts[i], seq.timestamps[i])
        states.append(state)
    assert states[-1] == TrackingState.OK, [s.name for s in states]
    assert slam.map.n_points() > 30
    est_ts, est_p = slam.camera_trajectory()
    assert len(est_p) >= 6
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc, with_scale=True)
    # mono: Sim(3)-aligned ATE; looser gate (no metric depth)
    assert ate < 0.15, f"mono Sim3-aligned ATE {ate}"
    # mono steady state rides the fused step too (mono mode)
    assert slam.tracker.fused_frames > 0, "fused path never engaged"
