"""Loop-closing integration test on a circular synthetic trajectory."""
import numpy as np
import pytest

from jetson_slam_tpu.bow.vocabulary import Vocabulary
from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem
from tests.test_slam_e2e import make_system


@pytest.mark.slow
def test_loop_detected_on_circular_trajectory():
    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    # train a small vocabulary on descriptors from a few frames
    probe = make_system(seq)
    descs = []
    for i in (0, len(seq.lefts) // 3, 2 * len(seq.lefts) // 3):
        r = probe.frontend.extract(seq.lefts[i])
        v = np.asarray(r.valid)
        descs.append(np.asarray(r.desc)[v])
    vocab = Vocabulary.train(np.concatenate(descs), k=6, L=3, seed=0)

    slam = make_system(seq, vocabulary=vocab)
    states = []
    for i in range(len(seq.lefts)):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
        states.append(state)
    ok_frames = sum(s == TrackingState.OK for s in states)
    assert ok_frames > 0.75 * len(states), states
    # the loop closer must have fired at least once on a full circle
    assert slam.loop_closer is not None
    assert slam.loop_closer.n_loops_closed >= 1
    est_ts, est_p = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc)
    # measured 0.011 m with the correctly-oriented Sim3 correction (an
    # inverted correction roughly doubles the drift instead) — 0.05 keeps
    # headroom for noise while still catching direction/propagation bugs
    assert ate < 0.05, f"ATE after loop closing {ate:.3f}"


@pytest.mark.slow
def test_loop_with_async_mapping_and_async_gba():
    """Loop closure under the async mapping pipeline: the post-loop global
    BA runs on the reference-style transient thread (catch-up correction)
    while tracking continues; the trajectory still meets the ATE gate."""
    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    probe = make_system(seq)
    descs = []
    for i in (0, len(seq.lefts) // 3, 2 * len(seq.lefts) // 3):
        r = probe.frontend.extract(seq.lefts[i])
        v = np.asarray(r.valid)
        descs.append(np.asarray(r.desc)[v])
    vocab = Vocabulary.train(np.concatenate(descs), k=6, L=3, seed=0)

    slam = make_system(seq, vocabulary=vocab, async_mapping=True)
    assert slam.loop_closer.async_gba
    for i in range(len(seq.lefts)):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
    slam.shutdown()  # waits for the mapper AND any transient GBA thread
    assert slam.loop_closer.n_loops_closed >= 1
    assert slam.loop_closer._gba_thread is not None  # async GBA actually ran
    est_ts, est_p = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc)
    assert ate < 0.06, f"ATE with async GBA {ate:.3f}"


@pytest.mark.slow
def test_async_pipeline_slow_worker_stress():
    """Maximize the round-3 race window: the mapping worker is artificially
    slowed so the tracker routinely inserts NEW covisible keyframes while the
    worker is still mid-`process_keyframe` — exactly the state where
    `detect_loop` used to call `db.score` on a keyframe with no BoW entry yet
    (KeyError at bow/database.py).  The pipeline must survive and still close
    the loop."""
    import time

    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    probe = make_system(seq)
    descs = []
    for i in (0, len(seq.lefts) // 3, 2 * len(seq.lefts) // 3):
        r = probe.frontend.extract(seq.lefts[i])
        v = np.asarray(r.valid)
        descs.append(np.asarray(r.desc)[v])
    vocab = Vocabulary.train(np.concatenate(descs), k=6, L=3, seed=0)

    slam = make_system(seq, vocabulary=vocab, async_mapping=True)
    # slow every worker stage: each keyframe spends >=60 ms in processing
    # while the tracker (not slowed) keeps inserting
    orig = slam.local_mapper.create_new_map_points

    def slow_create(kid):
        time.sleep(0.06)
        return orig(kid)

    slam.local_mapper.create_new_map_points = slow_create
    for i in range(len(seq.lefts)):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
    slam.shutdown()
    assert slam.loop_closer.n_loops_closed >= 1
    est_ts, est_p = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(est_ts), np.asarray(est_p),
                   seq.timestamps, seq.poses_twc)
    assert ate < 0.08, f"ATE under slow-worker stress {ate:.3f}"
