"""Diagnose the loop-fuzz failure: which loop-detection gate dies under
3.4/256 descriptor bit flips on the circle scene?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from jetson_slam_tpu.bow.vocabulary import Vocabulary
from jetson_slam_tpu.io.synthetic import make_stereo_sequence

from tests.test_descriptor_fuzz import FuzzFrontend
from tests.test_slam_e2e import make_system


def run(fuzz):
    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    probe = make_system(seq)
    descs = []
    for i in (0, 64 // 3, 2 * 64 // 3):
        r = probe.frontend.extract(seq.lefts[i])
        v = np.asarray(r.valid)
        descs.append(np.asarray(r.desc)[v])
    vocab = Vocabulary.train(np.concatenate(descs), k=6, L=3, seed=0)
    slam = make_system(seq, vocabulary=vocab)
    if fuzz:
        fe = FuzzFrontend(240, 320, n_levels=3, scale_factor=1.2,
                          threshold=20, fast_n_max=15, tile_h=16, tile_w=16)
        slam.frontend = fe
        slam.tracker.frontend = fe
    lc = slam.loop_closer
    events = []
    orig_detect = lc.detect_loop
    orig_sim3 = lc.compute_sim3

    def detect(kid):
        neigh = [int(x) for x in slam.map.covisible_keyframes(kid, n=None,
                                                              min_weight=1)[0]]
        scores = [lc.db.score(kid, nk) for nk in neigh
                  if nk in getattr(lc.db, '_kf_vec', {}) or True]
        cand = orig_detect(kid)
        events.append(("detect", kid, min(scores) if scores else None,
                       len(cand)))
        return cand

    def sim3(kid, candidates):
        out = orig_sim3(kid, candidates)
        events.append(("sim3", kid, len(candidates), out[0]))
        return out

    lc.detect_loop = detect
    lc.compute_sim3 = sim3
    for i in range(len(seq.lefts)):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
    print(f"fuzz={fuzz}: loops closed {lc.n_loops_closed}")
    for ev in events:
        print("  ", ev)
    return lc.n_loops_closed


if __name__ == "__main__":
    run(False)
    run(True)
