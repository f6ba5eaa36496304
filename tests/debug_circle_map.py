"""Map-churn diagnostics on the circle sequence: births, deaths, depth coverage."""
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
from jetson_slam_tpu.io.synthetic import make_stereo_sequence


def main(n=20):
    seq = make_stereo_sequence(seed=3, n_frames=64, h=240, w=320,
                               trajectory="circle", n_points=1200)
    slam = make_system(seq)
    tr = slam.tracker
    m = slam.map

    import traceback
    from collections import Counter
    erased = [0]
    reasons = Counter()
    orig_erase = m.erase_point
    def erase_point(pid):
        erased[0] += 1
        stack = [f.name for f in traceback.extract_stack()]
        for key in ("cull_map_points", "erase_keyframe", "cull_keyframes",
                    "replace_point", "erase_observation", "local_bundle_adjustment"):
            if key in stack:
                reasons[key] += 1
                break
        else:
            reasons[stack[-3]] += 1
        return orig_erase(pid)
    m.erase_point = erase_point

    orig_ekf = m.erase_keyframe
    def erase_keyframe(kid):
        print(f"   !! erase_keyframe({kid})  frame_id={m.kf_frame_id[kid]}",
              flush=True)
        return orig_ekf(kid)
    m.erase_keyframe = erase_keyframe

    prev_alive = 0
    for i in range(n):
        erased[0] = 0
        state, frame = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                         seq.timestamps[i])
        alive = int(m.pt_alive.sum())
        if frame is not None:
            nd = int(((frame.depth > 0) & frame.valid).sum())
            nassoc = int(((frame.map_points >= 0)).sum())
            alive_assoc = int(m.pt_alive[frame.map_points[
                frame.map_points >= 0]].sum())
            print(f"f{i} {state.name} kp={int(frame.valid.sum())} depth+={nd} "
                  f"assoc={nassoc} assoc_alive={alive_assoc} "
                  f"pts={alive} (d{alive-prev_alive:+d}, erased {erased[0]}) "
                  f"nKF={len(m.keyframe_ids())} reasons={dict(reasons)}",
                  flush=True)
        reasons.clear()
        prev_alive = alive


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
