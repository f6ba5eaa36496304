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


def test_image_source_native_and_fallback(tmp_path, rng):
    """io.datasets.ImageSource: the replay decode-ahead wrapper rides the
    native ring buffer for .pgm columns and the thread-pool fallback for
    .npy — both must return the exact frames in order."""
    from jetson_slam_tpu.io.datasets import ImageSource

    frames = [rng.integers(0, 255, (24, 32), np.uint8) for _ in range(6)]
    pgm_paths, npy_paths = [], []
    for i, f in enumerate(frames):
        p = tmp_path / f"f{i}.pgm"
        with open(p, "wb") as fh:
            fh.write(b"P5\n32 24\n255\n" + f.tobytes())
        pgm_paths.append(str(p))
        q = tmp_path / f"f{i}.npy"
        np.save(q, f)
        npy_paths.append(str(q))

    src = ImageSource(pgm_paths, height=24, width=32)
    if native_available():
        assert src._native is not None
    for i, f in enumerate(frames):
        assert np.array_equal(src.get(i), f)
    src.close()

    src = ImageSource(npy_paths)
    assert src._native is None  # .npy -> python thread-pool path
    for i, f in enumerate(frames):
        assert np.array_equal(src.get(i), f)
    src.close()
