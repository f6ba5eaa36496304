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


def make_scene(rng, n_points=600, extent=10.0, depth_range=(3.0, 12.0),
               mode="wall"):
    if mode == "cloud":
        # compact central cluster (for orbit/turntable trajectories): points
        # fill a box around the origin so an inward-looking camera keeps a
        # large, depth-diverse anchor set in view for a long arc
        pts = np.stack([
            rng.uniform(-extent * 0.35, extent * 0.35, n_points),
            rng.uniform(-extent * 0.25, extent * 0.25, n_points),
            rng.uniform(-extent * 0.35, extent * 0.35, n_points),
        ], axis=1)
    elif mode == "ring":
        # panoramic annulus around the origin (for loop trajectories)
        # two shells with strong depth diversity: a single-depth annulus makes
        # yaw indistinguishable from lateral translation (and far shells make
        # forward drift invisible: 1/Z edge shift, 1/Z^2 disparity) — the
        # pose basin then has a flat valley that the velocity model walks
        # along, compounding drift exponentially
        ang = rng.uniform(0, 2 * np.pi, n_points)
        near = rng.random(n_points) < 0.5
        rad = np.where(
            near,
            rng.uniform(depth_range[0], depth_range[0] + 2.0, n_points),
            rng.uniform(depth_range[0] + 4.0, depth_range[0] + 10.0, n_points))
        pts = np.stack([
            rad * np.sin(ang),
            rng.uniform(-extent * 0.4, extent * 0.4, n_points),
            rad * np.cos(ang),
        ], axis=1)
    else:
        pts = np.stack([
            rng.uniform(-extent, extent, n_points),
            rng.uniform(-extent * 0.6, extent * 0.6, n_points),
            rng.uniform(depth_range[0], depth_range[1], n_points),
        ], axis=1)
    inten = rng.integers(60, 255, n_points).astype(np.uint8)
    # small squares: the renderer draws camera-facing billboards, whose
    # implied 3D corner points wobble by ~size*d_yaw under rotation — keep
    # that violation sub-pixel
    sizes = rng.uniform(0.05, 0.18, n_points)
    return SyntheticScene(pts, inten, sizes)


def render(scene: SyntheticScene, T_cw: np.ndarray, fx, fy, cx, cy, h, w,
           background=25):
    """Render the scene from camera pose T_cw (world->camera).

    Squares are drawn with analytic pixel-coverage anti-aliasing (separable
    overlap of the square with each pixel) in painter's order, so corner
    positions are sub-pixel accurate — integer-snapped edges would inject
    correlated keypoint quantization noise into VO tests.
    """
    img = np.full((h, w), float(background), dtype=np.float32)
    pc = (T_cw[:3, :3] @ scene.points.T).T + T_cw[:3, 3]
    z = pc[:, 2]
    vis = z > 0.5
    order = np.argsort(-z)  # far to near
    for i in order:
        if not vis[i]:
            continue
        u = fx * pc[i, 0] / z[i] + cx
        v = fy * pc[i, 1] / z[i] + cy
        s = max(0.75, fx * scene.sizes[i] / z[i])
        u0f, u1f = u - s, u + s
        v0f, v1f = v - s, v + s
        x0, x1 = int(np.floor(u0f)), int(np.ceil(u1f))
        y0, y1 = int(np.floor(v0f)), int(np.ceil(v1f))
        if x1 < 0 or y1 < 0 or x0 >= w or y0 >= h:
            continue
        xs = np.arange(max(x0, 0), min(x1, w))
        ys = np.arange(max(y0, 0), min(y1, h))
        if len(xs) == 0 or len(ys) == 0:
            continue
        cov_x = np.clip(np.minimum(u1f, xs + 1.0) - np.maximum(u0f, xs), 0, 1)
        cov_y = np.clip(np.minimum(v1f, ys + 1.0) - np.maximum(v0f, ys), 0, 1)
        cov = cov_y[:, None] * cov_x[None, :]
        region = img[ys[0]:ys[-1] + 1, xs[0]:xs[-1] + 1]
        img[ys[0]:ys[-1] + 1, xs[0]:xs[-1] + 1] = (
            region * (1.0 - cov) + float(scene.intensities[i]) * cov)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


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


def make_stereo_sequence(seed=0, n_frames=30, h=240, w=320, fx=300.0,
                         baseline=0.4, trajectory="arc", with_depth=False,
                         n_points=700):
    """Camera translates + yaws through the scene; returns images + ground truth."""
    rng = np.random.default_rng(seed)
    mode = {"circle": "ring", "orbit": "cloud"}.get(trajectory, "wall")
    scene = make_scene(rng, n_points=n_points, mode=mode)
    fy, cx, cy = fx, w / 2.0, h / 2.0
    poses = []
    for k in range(n_frames):
        a = k / max(n_frames - 1, 1)
        T = np.eye(4)
        if trajectory == "arc":
            yaw = 0.12 * np.sin(a * np.pi)
            cy_, sy_ = np.cos(yaw), np.sin(yaw)
            T[:3, :3] = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
            T[:3, 3] = [2.2 * a, 0.25 * np.sin(2 * np.pi * a), 1.5 * a]
        elif trajectory == "circle":
            # full revolution on a small circle, camera looking outward at
            # the ring scene; returns to the start pose (loop closure)
            yaw = 2 * np.pi * a
            cy_, sy_ = np.cos(yaw), np.sin(yaw)
            T[:3, :3] = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
            r = 1.0
            T[:3, 3] = [r * np.sin(yaw), 0.0, r * (1.0 - np.cos(yaw))]
        elif trajectory == "orbit":
            # turntable: camera on a circle of radius R looking inward at the
            # central cloud.  Anchor map points stay in view for a long arc
            # (well-conditioned), yet a full revolution still requires loop
            # closure: early keyframes' points leave the frustum (viewing-
            # angle gate) long before the orbit returns.
            yaw = 2 * np.pi * a
            cy_, sy_ = np.cos(yaw), np.sin(yaw)
            R_orbit = 9.0
            # camera at angle yaw on the circle, optical axis toward origin
            T[:3, :3] = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
            T[:3, 3] = [-R_orbit * np.sin(yaw), 0.0, -R_orbit * np.cos(yaw)]
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
