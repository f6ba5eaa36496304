"""Trajectory save/load in TUM and KITTI formats.

Mirrors System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM /
SaveTrajectoryKITTI (reference src/System.cpp:334-484) and the TUM-format
golden files under Examples/Stereo/euroc_old/.
"""
from __future__ import annotations

import numpy as np


def rotation_to_quaternion(R: np.ndarray) -> np.ndarray:
    """3x3 -> (qx, qy, qz, qw), TUM ordering."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        qw = (R[2, 1] - R[1, 2]) / s
        qx = 0.25 * s
        qy = (R[0, 1] + R[1, 0]) / s
        qz = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        qw = (R[0, 2] - R[2, 0]) / s
        qx = (R[0, 1] + R[1, 0]) / s
        qy = 0.25 * s
        qz = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        qw = (R[1, 0] - R[0, 1]) / s
        qx = (R[0, 2] + R[2, 0]) / s
        qy = (R[1, 2] + R[2, 1]) / s
        qz = 0.25 * s
    return np.array([qx, qy, qz, qw])


def quaternion_to_rotation(q: np.ndarray) -> np.ndarray:
    """(qx, qy, qz, qw) -> 3x3."""
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def save_trajectory_tum(path: str, timestamps, poses_twc):
    """poses_twc: iterable of 4x4 camera-to-world matrices.

    Format per System.cpp:380-385: `t tx ty tz qx qy qz qw` with 9/7 digits.
    """
    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses_twc):
            R = T[:3, :3]
            t = T[:3, 3]
            q = rotation_to_quaternion(R)
            f.write(f"{ts:.9f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


def save_trajectory_kitti(path: str, poses_twc):
    """KITTI format: 12 numbers per line, row-major 3x4 (System.cpp:431-484)."""
    with open(path, "w") as f:
        for T in poses_twc:
            vals = T[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in vals) + "\n")


def load_trajectory_tum(path: str):
    """Returns (timestamps (N,), poses (N, 4, 4) camera-to-world)."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) < 8:
                continue
            ts.append(vals[0])
            T = np.eye(4)
            T[:3, 3] = vals[1:4]
            T[:3, :3] = quaternion_to_rotation(np.array(vals[4:8]))
            poses.append(T)
    return np.array(ts), np.array(poses)
