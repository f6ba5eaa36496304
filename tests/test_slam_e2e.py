"""End-to-end SLAM integration tests on synthetic stereo sequences.

Strategy per SURVEY.md §4: the reference validates on EuRoC with golden
trajectories; without dataset images in this environment we gate on
synthetic scenes with exact ground truth.
"""
import numpy as np
import pytest

from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem


def make_system(seq, **kw):
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx
    cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx
    cfg.camera.cy = seq.cy
    cfg.camera.width = seq.lefts[0].shape[1]
    cfg.camera.height = seq.lefts[0].shape[0]
    cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.camera.th_depth = 40.0
    cfg.orb.n_levels = 3
    cfg.orb.tile_h = 16
    cfg.orb.tile_w = 16
    cfg.orb.th_fast_max = 15
    cfg.max_map_points = 16384
    cfg.max_keyframes = 64
    return SlamSystem(cfg, sensor="stereo", **kw)


@pytest.fixture(scope="module")
def seq():
    return make_stereo_sequence(seed=7, n_frames=25, h=240, w=320,
                                trajectory="arc", n_points=900)


def run_sequence(slam, seq, n=None):
    states = []
    for i in range(n or len(seq.lefts)):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
        states.append(state)
    return states


def test_vo_tracks_and_matches_ground_truth(seq):
    slam = make_system(seq)
    states = run_sequence(slam, seq)
    ok = sum(s == TrackingState.OK for s in states)
    assert ok >= len(states) - 2, f"tracking lost: {states}"
    est_ts, est_poses = slam.camera_trajectory()
    assert len(est_poses) >= 20
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_poses),
                   seq.timestamps, seq.poses_twc)
    # trajectory length ~3.5 m; gate at 5% of it
    assert ate < 0.18, f"ATE {ate:.3f} m too large"


def test_map_grows_and_culls(seq):
    slam = make_system(seq)
    run_sequence(slam, seq, n=15)
    assert slam.map.n_keyframes() >= 2
    assert slam.map.n_points() > 100
    # observations consistent: every obs points at an alive point
    m = slam.map
    for k in m.keyframe_ids():
        obs = m.kf_obs[k]
        pids = obs[obs >= 0]
        assert m.pt_alive[pids].all()


def test_trajectory_save_roundtrip(tmp_path, seq):
    slam = make_system(seq)
    run_sequence(slam, seq, n=8)
    p = str(tmp_path / "traj.txt")
    slam.save_trajectory_tum(p)
    from jetson_slam_tpu.io.trajectory import load_trajectory_tum
    ts, poses = load_trajectory_tum(p)
    assert len(ts) >= 6
    kf_p = str(tmp_path / "kf.txt")
    slam.save_keyframe_trajectory_tum(kf_p)


def test_tracked_keypoints_and_points_api(seq):
    """System::GetTrackedMapPoints / GetTrackedKeyPointsUn equivalents
    (System.h:120-123): after tracking, the session exposes the last
    frame's associated map points and undistorted keypoints."""
    slam = make_system(seq)
    run_sequence(slam, seq, n=8)
    pts = slam.get_tracked_map_points()
    kps = slam.get_tracked_keypoints_un()
    assert len(pts) > 10
    assert kps.ndim == 2 and kps.shape[1] == 2 and len(kps) > 50
    w, h = slam.config.camera.width, slam.config.camera.height
    assert (kps[:, 0] > -50).all() and (kps[:, 0] < w + 50).all()
    assert (kps[:, 1] > -50).all() and (kps[:, 1] < h + 50).all()
    slam.shutdown()


@pytest.mark.slow
def test_vo_at_euroc_geometry():
    """End-to-end tracking at the reference's EuRoC operating point:
    752x480, 8 pyramid levels, tile 30 (EuRoC.yaml:25-26,94-112).  All
    other e2e coverage runs 320x240x4; this pins the production geometry
    (band sizing, level tables, stereo kernel block geometry) end to end."""
    seq = make_stereo_sequence(seed=5, n_frames=10, h=480, w=752,
                               trajectory="arc", n_points=1600)
    cfg = SLAMConfig()
    cfg.camera.fx, cfg.camera.fy = seq.fx, seq.fy
    cfg.camera.cx, cfg.camera.cy = seq.cx, seq.cy
    cfg.camera.width, cfg.camera.height = 752, 480
    cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.camera.th_depth = 40.0
    cfg.orb.n_levels = 8
    cfg.orb.tile_h = 30
    cfg.orb.tile_w = 30
    cfg.orb.th_fast_max = 20
    cfg.max_map_points = 32768
    cfg.max_keyframes = 64
    slam = SlamSystem(cfg, sensor="stereo")
    states = []
    for i in range(len(seq.lefts)):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
        states.append(state)
    slam.shutdown()
    ok = sum(s == TrackingState.OK for s in states)
    assert ok >= len(states) - 2, states
    est_ts, est_p = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc)
    assert ate < 0.08, f"ATE {ate:.3f} at EuRoC geometry"


def test_add_points_batch_matches_sequential(seq):
    """MapStore.add_points_batch (vectorized CreateNewKeyFrame spawn) must
    write exactly what the sequential add_point + add_observation +
    init_point_single_obs chain writes."""
    import copy

    slam = make_system(seq)
    run_sequence(slam, seq, n=6)
    tr = slam.tracker
    m = slam.map
    # a fresh frame with stereo depths, not yet a keyframe
    state, frame = slam.track_stereo(seq.lefts[6], seq.rights[6],
                                     seq.timestamps[6])
    kid = m.add_keyframe(frame)
    depth = frame.depth
    valid_d = (depth > 0) & frame.valid
    cand = np.flatnonzero(valid_d)[:50]
    pid0 = frame.map_points[cand]
    dead = (pid0 < 0) | ~m.pt_alive[np.maximum(pid0, 0)] | \
        (m.pt_nobs[np.maximum(pid0, 0)] < 1)
    slots = cand[dead]
    assert len(slots) > 5
    pos = frame.unproject_stereo_batch(slots)

    hooks, m.erase_hooks = m.erase_hooks, []   # don't deep-copy the tracker
    m2 = copy.deepcopy(m)
    m.erase_hooks = hooks
    # sequential oracle on the copy
    seq_pids = []
    for s, p in zip(slots, pos):
        pid = m2.add_point(p, frame.desc[s], kid)
        m2.add_observation(kid, int(s), pid)
        m2.kf_obs[kid, s] = pid
        m2.init_point_single_obs(pid, kid, int(s), tr.scale_factors,
                                 tr.n_levels)
        seq_pids.append(pid)
    pids = m.add_points_batch(kid, slots, pos, tr.scale_factors, tr.n_levels)
    assert np.array_equal(np.asarray(pids), np.asarray(seq_pids))
    for f in ("pt_alive", "pt_pos", "pt_desc", "pt_normal", "pt_min_dist",
              "pt_max_dist", "pt_nobs", "pt_visible", "pt_found",
              "pt_first_kf", "pt_ref_kf", "pt_gen"):
        a, b = getattr(m, f), getattr(m2, f)
        assert np.allclose(np.asarray(a, np.float64),
                           np.asarray(b, np.float64), atol=1e-5), f
    assert np.array_equal(m.kf_obs[kid], m2.kf_obs[kid])
    for pid in pids:
        assert m._pt_obs[int(pid)] == m2._pt_obs[int(pid)]
    assert m._next_pt == m2._next_pt
    slam.shutdown()
