"""Fused whole-frame tracking step (core/fused_track.py).

The steady-state stereo tracking step must run as ONE device program with
ONE host pull and produce the same trajectory quality as the classic
3-round-trip path (motion model + local map dispatched separately).
"""
import numpy as np

from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence

from tests.test_slam_e2e import make_system, run_sequence


def _run(seq, fused):
    slam = make_system(seq)
    slam.tracker.fused = fused
    states = run_sequence(slam, seq)
    est_ts, est_poses = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_poses),
                   seq.timestamps, seq.poses_twc)
    return slam, states, ate


def test_fused_path_engages_and_matches_classic():
    seq = make_stereo_sequence(seed=11, n_frames=25, h=240, w=320,
                               trajectory="arc", n_points=900)
    slam_f, states_f, ate_f = _run(seq, fused=True)
    slam_c, states_c, ate_c = _run(seq, fused=False)

    ok_f = sum(s == TrackingState.OK for s in states_f)
    assert ok_f >= len(states_f) - 2, f"fused tracking lost: {states_f}"
    # the fused fast path must actually carry the steady state: all frames
    # except init + the first post-init frame (velocity not yet set)
    assert slam_f.tracker.fused_frames >= len(states_f) - 4, \
        f"fused path used on only {slam_f.tracker.fused_frames} frames"
    assert slam_c.tracker.fused_frames == 0

    # same accuracy class as the classic path (speculated candidates are
    # one frame stale; gates/constants identical)
    assert ate_f < 0.05, f"fused ATE {ate_f}"
    assert ate_f <= max(2.0 * ate_c, 0.02), (ate_f, ate_c)


def test_pid_reuse_during_unlocked_window_is_dropped():
    """The fused dispatch/pull runs without the map lock; MapStore._alloc_pt
    recycles culled pids.  A pid culled + REALLOCATED during that window
    refers to a different physical point — the generation snapshot must
    drop the association (pt_alive alone would accept it)."""
    seq = make_stereo_sequence(seed=17, n_frames=10, h=240, w=320,
                               trajectory="arc", n_points=900)
    slam = make_system(seq)
    tr = slam.tracker
    for i in range(6):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
    out = tr._dispatch_fused((seq.lefts[6], seq.rights[6]),
                             seq.timestamps[6], "stereo")
    assert out is not None
    frame, fz = out
    # simulate the concurrent mapper culling + reallocating a matched pid
    m = slam.map
    cur = np.flatnonzero(fz.sel >= 0)
    assert len(cur) > 0
    victim = int(tr._spec_pid[fz.sel[cur[0]]])
    m.erase_point(victim)
    m._next_pt = victim  # force _alloc_pt to recycle exactly this slot
    new_pid = m.add_point(np.array([99.0, 99.0, 99.0], np.float32),
                          np.zeros(32, np.uint8), 0)
    assert new_pid == victim and m.pt_alive[victim]
    state, frame = tr._track_locked(frame, fz)
    # every slot that matched the victim dropped; no slot points at the
    # impostor's bogus geometry
    assert not np.any(frame.map_points == victim)
    assert state == TrackingState.OK
    slam.shutdown()


def test_device_undistortion_matches_host():
    """_undistort_device (fused program) vs core.frame.undistort_points
    (host) on TUM1-like coefficients."""
    import jax.numpy as jnp
    from jetson_slam_tpu.core.frame import undistort_points
    from jetson_slam_tpu.core.fused_track import _undistort_device
    rng = np.random.default_rng(0)
    xy = rng.uniform((20, 20), (620, 460), size=(256, 2)).astype(np.float32)
    fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3
    k1, k2, p1, p2, k3 = 0.2624, -0.9531, -0.0054, 0.0026, 1.1633
    host = undistort_points(xy, fx, fy, cx, cy, k1, k2, p1, p2, k3)
    dev = np.asarray(_undistort_device(jnp.asarray(xy), fx, fy, cx, cy,
                                       k1, k2, p1, p2, k3))
    np.testing.assert_allclose(dev, host, atol=2e-2)  # f32 vs f64 chain


def test_fused_falls_back_when_motion_fails():
    """A teleport (velocity model wildly wrong) must drop to the classic
    reference-KF path instead of accepting a bad fused solution."""
    seq = make_stereo_sequence(seed=13, n_frames=12, h=240, w=320,
                               trajectory="arc", n_points=900)
    slam = make_system(seq)
    states = run_sequence(slam, seq, n=8)
    assert states[-1] == TrackingState.OK
    tr = slam.tracker
    used_before = tr.fused_frames
    assert used_before > 0
    # corrupt the velocity: the fused motion stage should fail its gates and
    # the frame should be recovered by _track_reference_keyframe
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = (5.0, 5.0, 5.0)
    tr.velocity = bad
    state, frame = slam.track_stereo(seq.lefts[8], seq.rights[8],
                                     seq.timestamps[8])
    assert state == TrackingState.OK
    assert tr.fused_frames == used_before  # fused consume did not run
    slam.shutdown()


def test_pipelined_tracking_matches_blocking():
    """pipeline_depth > 0 keeps fused dispatches in flight (tracking each
    frame against the newest FINISHED frame, velocity applied once per
    in-flight step) and must land in the same accuracy class as the
    blocking fused path, with the trajectory complete and time-ordered."""
    import pytest

    seq = make_stereo_sequence(seed=11, n_frames=25, h=240, w=320,
                               trajectory="arc", n_points=900)
    _, _, ate0 = _run(seq, fused=True)
    for depth in (1, 2):
        slam = make_system(seq, pipeline_depth=depth)
        states = run_sequence(slam, seq)
        slam.shutdown()  # flushes the in-flight tail
        est_ts, est_poses = slam.camera_trajectory()
        assert len(est_poses) == len(seq.lefts), \
            f"depth={depth}: {len(est_poses)} poses"
        assert np.all(np.diff(np.asarray(est_ts)) > 0)
        ate = ate_rmse(np.asarray(est_ts), np.asarray(est_poses),
                       seq.timestamps, seq.poses_twc)
        assert ate < 0.05, f"depth={depth} ATE {ate}"
        assert ate <= max(3.0 * ate0, 0.02), (depth, ate, ate0)
        assert slam.tracker.fused_frames >= len(seq.lefts) - 5
        assert not slam.tracker._inflight

def test_pipelined_associations_are_geometrically_consistent():
    """Regression for the dispatch-time snapshot: with pipeline_depth>0,
    fz.m indexes the DISPATCH-time last frame's slots; applying it against
    the finish-time self.last_frame (one-to-depth frames newer) silently
    associates wrong pids while the pose stays device-correct.  Verify the
    associations themselves: every map point a finished frame holds must
    reproject near its own keypoint."""
    seq = make_stereo_sequence(seed=11, n_frames=25, h=240, w=320,
                               trajectory="arc", n_points=900)
    slam = make_system(seq, pipeline_depth=2)
    frames = []
    for i in range(len(seq.lefts)):
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        if frame is not None:
            frames.append(frame)
    tail = slam.tracker.flush_pipeline()
    slam.shutdown()
    m = slam.map
    errs = []
    checked = 0
    for frame in frames:
        if not frame.pose_set:
            continue
        has = (frame.map_points >= 0) & m.pt_alive[
            np.maximum(frame.map_points, 0)]
        if has.sum() == 0:
            continue
        pw = m.pt_pos[frame.map_points[has]]
        pc = (frame.Rcw @ pw.T).T + frame.tcw
        z = np.maximum(pc[:, 2], 1e-6)
        u = slam.config.camera.fx * pc[:, 0] / z + slam.config.camera.cx
        v = slam.config.camera.fy * pc[:, 1] / z + slam.config.camera.cy
        kp = frame.kp_xy[has]
        errs.append(np.hypot(u - kp[:, 0], v - kp[:, 1]))
        checked += int(has.sum())
    assert checked > 200, checked
    err = np.concatenate(errs)
    # BA refines points after the frame passed, so allow slack — but wrong-
    # frame associations put most points tens-to-hundreds of px off
    assert np.median(err) < 3.0, np.median(err)
    assert (err < 10.0).mean() > 0.9, (err < 10.0).mean()
