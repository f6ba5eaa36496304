"""Dataset drivers: EuRoC / KITTI / TUM RGB-D image-list loaders.

Replaces the reference's Examples/ mains (stereo_euroc.cpp LoadImages
:216-254, stereo_kitti.cpp, rgbd_tum.cpp) with Python loaders that yield
(timestamp, left, right/depth) tuples.  Image decoding uses PIL when
available; otherwise raw .npy/.npz sequences are supported so tests and
benches never require external data.
"""
from __future__ import annotations

import glob
import os

import numpy as np

try:  # pragma: no cover - environment dependent
    from PIL import Image

    def _imread_gray(path):
        return np.asarray(Image.open(path).convert("L"), dtype=np.uint8)
except Exception:  # pragma: no cover
    def _imread_gray(path):
        if path.endswith(".npy"):
            return np.load(path)
        raise RuntimeError("PIL unavailable; only .npy images supported")


def load_euroc_stereo(seq_dir: str, timestamp_file: str | None = None):
    """EuRoC MAV layout: mav0/cam{0,1}/data/<ns>.png (stereo_euroc.cpp:216-254).

    Yields (t_seconds, left_path, right_path); images must be rectified by the
    caller (the reference reads LEFT.*/RIGHT.* rectification maps from YAML).
    """
    cam0 = os.path.join(seq_dir, "mav0", "cam0", "data")
    cam1 = os.path.join(seq_dir, "mav0", "cam1", "data")
    lefts = sorted(glob.glob(os.path.join(cam0, "*.png")))
    entries = []
    for lp in lefts:
        ns = os.path.splitext(os.path.basename(lp))[0]
        rp = os.path.join(cam1, ns + ".png")
        if os.path.exists(rp):
            entries.append((int(ns) * 1e-9, lp, rp))
    return entries


def load_kitti_stereo(seq_dir: str):
    """KITTI odometry layout: image_0/ image_1/ + times.txt (stereo_kitti.cpp)."""
    times_path = os.path.join(seq_dir, "times.txt")
    with open(times_path) as f:
        times = [float(x) for x in f.read().split()]
    entries = []
    for i, t in enumerate(times):
        lp = os.path.join(seq_dir, "image_0", f"{i:06d}.png")
        rp = os.path.join(seq_dir, "image_1", f"{i:06d}.png")
        entries.append((t, lp, rp))
    return entries


def load_tum_rgbd(seq_dir: str, association_file: str):
    """TUM RGB-D with an association file: `t rgb t depth` (rgbd_tum.cpp)."""
    entries = []
    with open(association_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            entries.append((float(vals[0]),
                            os.path.join(seq_dir, vals[1]),
                            os.path.join(seq_dir, vals[3])))
    return entries


def load_tum_mono(seq_dir: str):
    """TUM monocular: rgb.txt listing `t filename` (mono_tum.cpp LoadImages)."""
    entries = []
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, name = line.split()[:2]
            entries.append((float(t), os.path.join(seq_dir, name)))
    return entries


def load_kitti_mono(seq_dir: str):
    """KITTI monocular: image_0/ + times.txt (mono_kitti.cpp)."""
    with open(os.path.join(seq_dir, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    return [(t, os.path.join(seq_dir, "image_0", f"{i:06d}.png"))
            for i, t in enumerate(times)]


def load_euroc_mono(seq_dir: str):
    """EuRoC monocular: cam0 only (mono_euroc.cpp)."""
    cam0 = os.path.join(seq_dir, "mav0", "cam0", "data")
    entries = []
    for lp in sorted(glob.glob(os.path.join(cam0, "*.png"))):
        ns = os.path.splitext(os.path.basename(lp))[0]
        entries.append((int(ns) * 1e-9, lp))
    return entries


def imread_gray(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    return _imread_gray(path)


class ImageSource:
    """Decode-ahead image column for dataset replay.

    The reference decodes each frame synchronously on the tracking thread
    (stereo_euroc.cc main loop); here decoding runs ahead of the tracker:
    .pgm/.raw columns ride the native C++ ring buffer (native/loader.cpp
    pthread pool via io/native_loader.py), every other format a Python
    thread pool with a sliding lookahead window.  Sequential access hits a
    decoded frame; random access degrades to synchronous decode."""

    def __init__(self, paths, height=0, width=0, ahead=6, workers=2):
        self.paths = list(paths)
        self._native = None
        self._ex = None
        try:
            from .native_loader import PrefetchLoader
            pl = PrefetchLoader(self.paths, height, width,
                                n_threads=workers, capacity=max(ahead, 2))
            if pl._handle is not None:
                self._native = pl
        except Exception:  # pragma: no cover - missing .so etc.
            pass
        if self._native is None:
            from concurrent.futures import ThreadPoolExecutor
            self._ex = ThreadPoolExecutor(max_workers=workers)
            self._futs = {}
            self._ahead = int(ahead)

    def __len__(self):
        return len(self.paths)

    def get(self, i: int) -> np.ndarray:
        if self._native is not None:
            return self._native.get(i)
        for j in range(i, min(i + self._ahead, len(self.paths))):
            if j not in self._futs:
                self._futs[j] = self._ex.submit(imread_gray, self.paths[j])
        fut = self._futs.pop(i, None)
        arr = fut.result() if fut is not None else imread_gray(self.paths[i])
        for j in [j for j in self._futs if j < i]:
            self._futs.pop(j).cancel()
        return arr

    def close(self):
        if self._ex is not None:
            self._ex.shutdown(wait=False, cancel_futures=True)
            self._ex = None
        self._native = None
