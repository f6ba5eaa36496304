"""Tests for the native (C++) prefetch loader and LUT builder."""
import os
import subprocess

import numpy as np
import pytest

from jetson_slam_tpu.io.native_loader import (PrefetchLoader, fast_lut_native,
                                              native_available)
from jetson_slam_tpu.ops.tables import fast_lut

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built():
    so = os.path.join(REPO, "native", "libjetson_slam_native.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)


def test_native_lut_matches_python():
    _ensure_built()
    if not native_available():
        pytest.skip("native lib unavailable")
    got = fast_lut_native(9, 16)
    want = fast_lut(9, 16)
    np.testing.assert_array_equal(got, want)


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n# test\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def test_prefetch_loader_pgm(tmp_path, rng):
    _ensure_built()
    if not native_available():
        pytest.skip("native lib unavailable")
    imgs = [rng.integers(0, 255, (48, 64)).astype(np.uint8) for _ in range(6)]
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"f{i}.pgm")
        _write_pgm(p, im)
        paths.append(p)
    loader = PrefetchLoader(paths, n_threads=2, capacity=3)
    try:
        for i in range(6):
            got = loader.get(i)
            np.testing.assert_array_equal(got, imgs[i])
    finally:
        loader.close()


def test_prefetch_loader_python_fallback(tmp_path, rng):
    img = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    p = str(tmp_path / "x.npy")
    np.save(p, img)
    loader = PrefetchLoader([p])
    got = loader.get(0)
    np.testing.assert_array_equal(got, img)
