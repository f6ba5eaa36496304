#!/usr/bin/env python
"""Train a bundled BoW vocabulary from synthetic ORB descriptors.

The reference loads a pre-trained ~1M-word DBoW2 ORBvoc.txt at startup
(System.cpp:72-79); that file is absent from the snapshot, so this
framework bundles vocabularies trained on descriptors extracted by its own
front-end from diverse synthetic scenes.  The default settings produce a
k=10, L=4 tree (10,000 leaf words) — small enough to ship in-repo, deep
enough for loop-closure discrimination on the synthetic and small-dataset
scales this environment can evaluate.  For dataset-grade place recognition
load a real ORBvoc.txt via Vocabulary.load_text / --vocab.

Usage:
  python examples/train_vocabulary.py --out jetson_slam_tpu/data/vocab_10k.txt.gz
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def collect_descriptors(n_scenes=40, frames_per_scene=6, h=240, w=320):
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.ops.frontend import OrbFrontend

    fe = OrbFrontend(h, w, n_levels=4, scale_factor=1.2, threshold=15,
                     tile_h=12, tile_w=12)
    descs = []
    # cycle every scene GEOMETRY the generator has (wall / ring / cloud):
    # a corpus of wall-mode scenes alone leaves ring/cloud textures
    # unrepresented and place-recognition recall on those scenes collapses
    # (measured: the wall-trained 10k vocab detects zero loops on the
    # circular-trajectory suite that the scene-trained vocab closes)
    trajectories = ("arc", "line", "circle", "orbit")
    for s in range(n_scenes):
        seq = make_stereo_sequence(seed=100 + s, n_frames=frames_per_scene,
                                   h=h, w=w, n_points=1200,
                                   trajectory=trajectories[s % 4])
        for i in range(frames_per_scene):
            for img in (seq.lefts[i], seq.rights[i]):
                r = fe.extract(img)
                valid = np.asarray(r.valid)
                descs.append(np.asarray(r.desc)[valid])
        print(f"scene {s + 1}/{n_scenes}: {sum(len(d) for d in descs)} "
              "descriptors", flush=True)
    return np.concatenate(descs)


def main(argv=None):
    # honor JAX_PLATFORMS even when a sitecustomize force-registers the
    # TPU tunnel plugin (training must not contend with a live session)
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="jetson_slam_tpu/data/vocab_10k.txt.gz")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--frames", type=int, default=6)
    ns = ap.parse_args(argv)

    from jetson_slam_tpu.bow.vocabulary import Vocabulary

    t0 = time.time()
    descs = collect_descriptors(ns.scenes, ns.frames)
    print(f"collected {len(descs)} descriptors in {time.time() - t0:.0f}s")

    t0 = time.time()
    voc = Vocabulary.train(descs, k=ns.k, L=ns.L, seed=0)
    print(f"trained k={ns.k} L={ns.L}: {voc.n_words} words "
          f"in {time.time() - t0:.0f}s")
    voc.save_text(ns.out)
    print(f"saved to {ns.out}")


if __name__ == "__main__":
    main()
