"""Stereo rectification maps + remap (io/rectify.py) and the LEFT./RIGHT.
config blocks — the reference mains' cv::initUndistortRectifyMap path
(stereo_euroc.cpp:80-107)."""
import numpy as np

from jetson_slam_tpu.config import load_config
from jetson_slam_tpu.io.rectify import (StereoRectifier,
                                        init_undistort_rectify_map,
                                        remap_bilinear)

K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])


def test_identity_map():
    """R=I, D=0, P=K: every rectified pixel maps to itself."""
    mx, my = init_undistort_rectify_map(K, None, np.eye(3), K, (120, 160))
    u, v = np.meshgrid(np.arange(160), np.arange(120))
    assert np.allclose(mx, u, atol=1e-4)
    assert np.allclose(my, v, atol=1e-4)


def test_principal_point_shift():
    """P with cx' shifted by +10 => source x = rectified x - ... i.e. map
    shifts by -10 (content moves right)."""
    P = K.copy()
    P[0, 2] += 10
    mx, my = init_undistort_rectify_map(K, None, np.eye(3), P, (120, 160))
    u, _ = np.meshgrid(np.arange(160), np.arange(120))
    assert np.allclose(mx, u - 10, atol=1e-4)


def test_remap_identity_and_shift():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160), np.uint8)
    u, v = np.meshgrid(np.arange(160, dtype=np.float32),
                       np.arange(120, dtype=np.float32))
    out = remap_bilinear(img, u, v)
    assert np.array_equal(out, img)
    out2 = remap_bilinear(img, u + 1, v)  # integer shift: exact column shift
    assert np.array_equal(out2[:, :-1], img[:, 1:])
    assert (out2[:, -1] == 0).all()  # border constant 0


def test_undistort_roundtrip():
    """Distorted map then sampling a radially-distorted image recovers the
    undistorted pattern near the center (self-consistency check)."""
    D = np.array([-0.28, 0.07, 1e-4, 1e-5, 0.0])
    mx, my = init_undistort_rectify_map(K, D, np.eye(3), K, (120, 160))
    # the map must be smooth and central pixel exactly fixed:
    assert abs(mx[60, 80] - 80) < 1e-3 and abs(my[60, 80] - 60) < 1e-3
    assert np.isfinite(mx).all() and np.isfinite(my).all()


def test_euroc_yaml_rect_blocks_and_rectifier():
    cfg = load_config("/root/reference/Examples/Stereo/EuRoC.yaml")
    assert cfg.left_rect is not None and cfg.right_rect is not None
    assert cfg.left_rect["K"].shape == (3, 3)
    assert cfg.left_rect["P"].shape[0] == 3
    assert cfg.left_rect["height"] == 480 and cfg.left_rect["width"] == 752
    rect = StereoRectifier(cfg)
    assert rect.enabled
    rng = np.random.default_rng(1)
    l = rng.integers(0, 255, (480, 752), np.uint8)
    r = rng.integers(0, 255, (480, 752), np.uint8)
    lo, ro = rect.rectify(l, r)
    assert lo.shape == (480, 752) and ro.shape == (480, 752)
    assert lo.dtype == np.uint8 and lo.any()


def test_mono_loaders(tmp_path):
    from jetson_slam_tpu.io import datasets

    # TUM mono layout
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    (d / "rgb.txt").write_text("# comment\n1.0 rgb/a.png\n2.0 rgb/b.png\n")
    e = datasets.load_tum_mono(str(d))
    assert len(e) == 2 and e[0][0] == 1.0 and e[1][1].endswith("b.png")

    # KITTI mono layout
    k = tmp_path / "kitti"
    (k / "image_0").mkdir(parents=True)
    (k / "times.txt").write_text("0.0\n0.1\n0.2\n")
    e = datasets.load_kitti_mono(str(k))
    assert len(e) == 3 and e[2][1].endswith("000002.png")

    # EuRoC mono layout
    m = tmp_path / "euroc" / "mav0" / "cam0" / "data"
    m.mkdir(parents=True)
    (m / "1000000000.png").write_bytes(b"")
    e = datasets.load_euroc_mono(str(tmp_path / "euroc"))
    assert len(e) == 1 and abs(e[0][0] - 1.0) < 1e-9
