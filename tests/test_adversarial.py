"""Adversarial synthetic suites: exposure ramp, low texture, recovery.

These validate the rescaled tracking thresholds (inlier floors, KF-decision
constants, core/tracking.py) against conditions the friendly synthetic
scenes never exercise (VERDICT round-2 ask #9).
"""
import numpy as np
import pytest

from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from tests.test_slam_e2e import make_system


def _run(slam, lefts, rights, ts):
    states = []
    for i in range(len(lefts)):
        s, _ = slam.track_stereo(lefts[i], rights[i], ts[i])
        states.append(s)
    return states


def _ate(slam, seq):
    est_ts, est_p = slam.camera_trajectory()
    return ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                    seq.timestamps, seq.poses_twc)


@pytest.mark.slow
def test_exposure_ramp_tracks_through():
    """Global illumination ramping 0.55x -> 1.45x over the sequence: FAST
    scores and rBRIEF comparisons are contrast-sensitive per-frame but the
    pipeline must keep tracking (the reference runs auto-exposure cameras)."""
    seq = make_stereo_sequence(seed=11, n_frames=30, h=240, w=320,
                               n_points=900)
    gains = np.linspace(0.55, 1.45, len(seq.lefts))
    lefts = [np.clip(l.astype(np.float32) * g, 0, 255).astype(np.uint8)
             for l, g in zip(seq.lefts, gains)]
    rights = [np.clip(r.astype(np.float32) * g, 0, 255).astype(np.uint8)
              for r, g in zip(seq.rights, gains)]
    slam = make_system(seq)
    states = _run(slam, lefts, rights, seq.timestamps)
    ok = sum(s == TrackingState.OK for s in states)
    assert ok > 0.8 * len(states), states
    assert _ate(slam, seq) < 0.08


@pytest.mark.slow
def test_low_texture_segment_recovers():
    """A mid-sequence low-texture stretch (contrast crushed to 20%):
    tracking may degrade there, but must re-acquire afterwards and keep the
    overall trajectory sane (LOST -> relocalization path)."""
    from jetson_slam_tpu.bow.vocabulary import small_vocabulary
    seq = make_stereo_sequence(seed=12, n_frames=36, h=240, w=320,
                               n_points=900)

    def crush(img):
        f = img.astype(np.float32)
        return np.clip(f.mean() + 0.2 * (f - f.mean()), 0, 255).astype(
            np.uint8)

    lefts = list(seq.lefts)
    rights = list(seq.rights)
    for i in range(15, 21):
        lefts[i] = crush(lefts[i])
        rights[i] = crush(rights[i])
    slam = make_system(seq, vocabulary=small_vocabulary())
    states = _run(slam, lefts, rights, seq.timestamps)
    # after the stretch the tracker must be OK again
    assert states[-1] == TrackingState.OK, states
    tail_ok = sum(s == TrackingState.OK for s in states[24:])
    assert tail_ok == len(states[24:]), states[24:]


@pytest.mark.slow
def test_static_camera_no_drift():
    """Degenerate zero-parallax input: a static camera must not fabricate
    motion (keyframe decision + zero-velocity motion model edge case)."""
    seq = make_stereo_sequence(seed=13, n_frames=2, h=240, w=320,
                               n_points=800)
    slam = make_system(seq)
    n = 15
    for i in range(n):
        state, _ = slam.track_stereo(seq.lefts[0], seq.rights[0], i / 20.0)
    assert state == TrackingState.OK
    _, est_p = slam.camera_trajectory()
    est_p = np.asarray(est_p)
    drift = np.linalg.norm(est_p[:, :3, 3] - est_p[0, :3, 3], axis=1).max()
    assert drift < 0.01, drift


@pytest.mark.slow
def test_motion_jump_falls_back_to_reference_kf():
    """A velocity glitch larger than the fused motion-model search window
    (its on-device 2x-window retry included) but small enough for the
    brute-force reference-KF matcher: the tracker must recover through the
    reference-KF fallback (Tracking.cpp:1104-1112 semantics) instead of
    going LOST."""
    seq = make_stereo_sequence(seed=14, n_frames=30, h=240, w=320,
                               n_points=900)
    slam = make_system(seq)
    # skip 6 frames mid-stream: ~27 px of unpredicted optical flow, beyond
    # the 2*th=14 px projection window of the motion model
    order = list(range(10)) + list(range(16, 26))
    states = []
    for j, i in enumerate(order):
        s, _ = slam.track_stereo(seq.lefts[i], seq.rights[i], j / 20.0)
        states.append(s)
    # the glitch frame may drop, but tracking must re-establish quickly
    assert states[-1] == TrackingState.OK, states
    tail = states[-6:]
    assert all(s == TrackingState.OK for s in tail), states
