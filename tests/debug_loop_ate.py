"""Loop-closing ATE breakdown: raw vs corrected vs extra-GBA."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_slam_e2e import make_system
from jetson_slam_tpu.bow.vocabulary import Vocabulary
from jetson_slam_tpu.io.evaluation import ate_rmse
from jetson_slam_tpu.io.synthetic import make_stereo_sequence


def main():
    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    probe = make_system(seq)
    descs = []
    for i in (0, len(seq.lefts) // 3, 2 * len(seq.lefts) // 3):
        r = probe.frontend.extract(seq.lefts[i])
        v = np.asarray(r.valid)
        descs.append(np.asarray(r.desc)[v])
    vocab = Vocabulary.train(np.concatenate(descs), k=6, L=3, seed=0)
    slam = make_system(seq, vocabulary=vocab)
    for i in range(len(seq.lefts)):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])

    def ate_now(tag):
        ts, ps = slam.camera_trajectory()
        a = ate_rmse(np.asarray(ts), np.asarray(ps), seq.timestamps,
                     seq.poses_twc)
        print(f"{tag}: ATE={a:.3f} loops={slam.loop_closer.n_loops_closed}",
              flush=True)
        return a

    ate_now("after run")
    slam.loop_closer.global_bundle_adjustment(its=30)
    ate_now("after extra GBA(30)")
    slam.loop_closer.global_bundle_adjustment(its=30)
    ate_now("after 2nd GBA(30)")


if __name__ == "__main__":
    main()
