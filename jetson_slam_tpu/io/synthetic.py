"""Synthetic stereo/mono/RGB-D sequence generator with ground truth.

The reference validates end-to-end on public datasets (EuRoC/KITTI, SURVEY.md
§4); those images are not available in this environment, so integration tests
and benchmarks run on rendered synthetic scenes: a 3D cloud of textured
squares projected with a pinhole stereo rig.  Squares have sharp edges, which
FAST detects reliably, and genuine parallax, which exercises triangulation,
stereo depth, and pose estimation.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticScene:
    points: np.ndarray       # (P, 3) world coordinates
    intensities: np.ndarray  # (P,) uint8
    sizes: np.ndarray        # (P,) world size of each square


def make_scene(rng, n_points=600, extent=12.0, depth_range=(4.0, 14.0)):
    pts = np.stack([
        rng.uniform(-extent, extent, n_points),
        rng.uniform(-extent * 0.6, extent * 0.6, n_points),
        rng.uniform(depth_range[0], depth_range[1] + 12.0, n_points),
    ], axis=1)
    inten = rng.integers(60, 255, n_points).astype(np.uint8)
    sizes = rng.uniform(0.08, 0.35, n_points)
    return SyntheticScene(pts, inten, sizes)


def render(scene: SyntheticScene, T_cw: np.ndarray, fx, fy, cx, cy, h, w,
           background=25):
    """Render the scene from camera pose T_cw (world->camera), painter's order."""
    img = np.full((h, w), background, dtype=np.uint8)
    pc = (T_cw[:3, :3] @ scene.points.T).T + T_cw[:3, 3]
    z = pc[:, 2]
    vis = z > 0.5
    order = np.argsort(-z)  # far to near
    for i in order:
        if not vis[i]:
            continue
        u = fx * pc[i, 0] / z[i] + cx
        v = fy * pc[i, 1] / z[i] + cy
        s = max(1, int(round(fx * scene.sizes[i] / z[i])))
        u0, v0 = int(round(u - s)), int(round(v - s))
        u1, v1 = u0 + 2 * s, v0 + 2 * s
        if u1 < 0 or v1 < 0 or u0 >= w or v0 >= h:
            continue
        img[max(v0, 0):min(v1, h), max(u0, 0):min(u1, w)] = scene.intensities[i]
    return img


@dataclasses.dataclass
class StereoSequence:
    lefts: list
    rights: list
    depths: list            # (H, W) float32 per frame (RGB-D style) or None
    timestamps: np.ndarray
    poses_twc: np.ndarray   # (N, 4, 4) ground truth camera-to-world (left cam)
    fx: float
    fy: float
    cx: float
    cy: float
    baseline: float

    @property
    def bf(self):
        return self.fx * self.baseline


def make_stereo_sequence(seed=0, n_frames=30, h=240, w=320, fx=260.0,
                         baseline=0.2, trajectory="arc", with_depth=False,
                         n_points=700):
    """Camera translates + yaws through the scene; returns images + ground truth."""
    rng = np.random.default_rng(seed)
    scene = make_scene(rng, n_points=n_points)
    fy, cx, cy = fx, w / 2.0, h / 2.0
    poses = []
    for k in range(n_frames):
        a = k / max(n_frames - 1, 1)
        T = np.eye(4)
        if trajectory == "arc":
            yaw = 0.25 * np.sin(a * np.pi)
            cy_, sy_ = np.cos(yaw), np.sin(yaw)
            T[:3, :3] = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
            T[:3, 3] = [2.2 * a, 0.25 * np.sin(2 * np.pi * a), 1.5 * a]
        elif trajectory == "forward":
            T[:3, 3] = [0, 0, 3.0 * a]
        else:  # lateral
            T[:3, 3] = [3.0 * a, 0, 0]
        poses.append(T)  # camera-to-world
    poses = np.array(poses)

    lefts, rights, depths = [], [], []
    T_rl = np.eye(4)
    T_rl[0, 3] = -baseline  # right camera: x_right = x_left - b
    for T_wc in poses:
        T_cw = np.linalg.inv(T_wc)
        lefts.append(render(scene, T_cw, fx, fy, cx, cy, h, w))
        rights.append(render(scene, T_rl @ T_cw, fx, fy, cx, cy, h, w))
        if with_depth:
            depths.append(_render_depth(scene, T_cw, fx, fy, cx, cy, h, w))
    ts = np.arange(n_frames) / 20.0
    return StereoSequence(lefts, rights, depths if with_depth else None,
                          ts, poses, fx, fy, cx, cy, baseline)


def _render_depth(scene, T_cw, fx, fy, cx, cy, h, w):
    depth = np.zeros((h, w), dtype=np.float32)
    pc = (T_cw[:3, :3] @ scene.points.T).T + T_cw[:3, 3]
    z = pc[:, 2]
    order = np.argsort(-z)
    for i in order:
        if z[i] <= 0.5:
            continue
        u = fx * pc[i, 0] / z[i] + cx
        v = fy * pc[i, 1] / z[i] + cy
        s = max(1, int(round(fx * scene.sizes[i] / z[i])))
        u0, v0 = int(round(u - s)), int(round(v - s))
        u1, v1 = u0 + 2 * s, v0 + 2 * s
        if u1 < 0 or v1 < 0 or u0 >= w or v0 >= h:
            continue
        depth[max(v0, 0):min(v1, h), max(u0, 0):min(u1, w)] = z[i]
    return depth
