"""Tests for trajectory IO, ATE evaluation, synthetic scenes, config parsing."""
import os

import numpy as np

from jetson_slam_tpu.config import config_from_dict, load_config
from jetson_slam_tpu.io.evaluation import ate_rmse, umeyama_alignment
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.io.trajectory import (
    load_trajectory_tum,
    quaternion_to_rotation,
    rotation_to_quaternion,
    save_trajectory_kitti,
    save_trajectory_tum,
)


def _random_pose(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = Q
    T[:3, 3] = rng.normal(size=3)
    return T


def test_quaternion_roundtrip(rng):
    for _ in range(20):
        T = _random_pose(rng)
        q = rotation_to_quaternion(T[:3, :3])
        R = quaternion_to_rotation(q)
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-9)


def test_tum_save_load_roundtrip(tmp_path, rng):
    poses = [_random_pose(rng) for _ in range(10)]
    ts = np.arange(10) * 0.05
    p = str(tmp_path / "traj.txt")
    save_trajectory_tum(p, ts, poses)
    ts2, poses2 = load_trajectory_tum(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-9)
    for a, b in zip(poses, poses2):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_kitti_format(tmp_path, rng):
    poses = [_random_pose(rng) for _ in range(3)]
    p = str(tmp_path / "kitti.txt")
    save_trajectory_kitti(p, poses)
    rows = np.loadtxt(p)
    assert rows.shape == (3, 12)
    np.testing.assert_allclose(rows[0], poses[0][:3].reshape(-1), atol=1e-7)


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(50, 3))
    R_true = _random_pose(rng)[:3, :3]
    s_true, t_true = 1.7, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_true, atol=1e-9)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_zero_for_identical(rng):
    poses = np.stack([_random_pose(rng) for _ in range(20)])
    ts = np.arange(20) * 0.05
    assert ate_rmse(ts, poses, ts, poses) < 1e-9


def test_synthetic_sequence_shapes():
    seq = make_stereo_sequence(seed=1, n_frames=4, h=120, w=160)
    assert len(seq.lefts) == 4 and len(seq.rights) == 4
    assert seq.lefts[0].shape == (120, 160)
    assert seq.poses_twc.shape == (4, 4, 4)
    # stereo pair should actually differ (parallax)
    assert (seq.lefts[0] != seq.rights[0]).mean() > 0.01


def test_config_parses_reference_yaml():
    cfg = load_config("/root/reference/Examples/Stereo/EuRoC.yaml")
    assert cfg.camera.fx == 435.2046959714599
    assert cfg.camera.width == 752
    assert cfg.orb.n_levels == 8
    assert cfg.orb.tile_h == 30
    assert cfg.orb.th_fast_max == 20
    assert cfg.use_gpu


def test_config_from_dict_defaults():
    cfg = config_from_dict({"ORBextractor.nLevels": 4})
    assert cfg.orb.n_levels == 4
    assert cfg.camera.fps == 20.0


def test_shipped_dataset_configs_parse():
    """Every config under examples/configs/ loads and matches the reference
    per-dataset tuning (BASELINE.md 'Per-dataset reference configuration')."""
    import glob
    import os
    base = os.path.join(os.path.dirname(__file__), "..", "examples", "configs")
    files = sorted(glob.glob(os.path.join(base, "*.yaml")))
    assert len(files) >= 9
    cfgs = {os.path.basename(f): load_config(f) for f in files}

    eu = cfgs["EuRoC_stereo.yaml"]
    assert (eu.camera.width, eu.camera.height) == (752, 480)
    assert eu.orb.n_levels == 8 and eu.orb.tile_h == 30
    assert not eu.orb.apply_nms_ms
    assert eu.left_rect is not None and eu.right_rect is not None
    assert eu.left_rect["K"].shape == (3, 3)
    assert eu.right_rect["P"][0, 3] == -47.90639384423901

    ki = cfgs["KITTI00-02_stereo.yaml"]
    assert ki.orb.n_levels == 1 and ki.orb.tile_h == 25
    assert ki.orb.th_fast_max == 60 and ki.orb.apply_nms_ms

    tu = cfgs["TUM1_rgbd.yaml"]
    assert tu.camera.depth_map_factor == 5000.0
    assert tu.orb.tile_h == 15 and tu.camera.k3 == 1.163314

    ka = cfgs["KAIST-VIO_stereo.yaml"]
    assert ka.orb.n_levels == 4 and ka.orb.tile_h == 20
    assert ka.camera.fps == 40.0

    mono = cfgs["EuRoC_mono.yaml"]
    assert mono.camera.k1 == -0.28340811  # raw cam0 distortion kept
    assert mono.orb.tile_h == 30          # GPU keys present (unlike reference)
