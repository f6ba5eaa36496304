"""End-to-end relocalization: lose tracking on blank frames, recover on a
revisited view (Tracking::Relocalization, Tracking.cpp:1954-2115 — BoW/KF
candidates + PnP RANSAC + pose optimization)."""
import numpy as np
import pytest

from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem


@pytest.mark.slow
def test_lost_then_relocalize():
    seq = make_stereo_sequence(seed=2, n_frames=12, h=240, w=320)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 320; cfg.camera.height = 240; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.orb.n_levels = 4; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    slam = SlamSystem(cfg, sensor="stereo")

    est = {}
    for i in range(len(seq.lefts)):
        state, fr = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                      seq.timestamps[i])
        est[i] = fr.Tcw.copy()
    assert state == TrackingState.OK

    # blind the camera: tracking must drop to LOST, not crash
    blank = np.zeros((240, 320), np.uint8)
    for j in range(3):
        state, _ = slam.track_stereo(blank, blank, 100.0 + j)
    assert state == TrackingState.LOST

    # revisit a mapped view: relocalization should recover a nearby pose
    state, fr = slam.track_stereo(seq.lefts[5], seq.rights[5], 200.0)
    assert state == TrackingState.OK, "relocalization failed"
    dt = np.linalg.norm(fr.Tcw[:3, 3] - est[5][:3, 3])
    assert dt < 0.05, f"relocalized pose off by {dt} m"
