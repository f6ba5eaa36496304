"""Sim(3) estimation: Horn closed form + vmapped RANSAC.

Replacement for src/Sim3Solver.cpp: closed-form similarity from 3-point
samples (Horn 1987, as in Sim3Solver::ComputeSim3), hypothesis batches
evaluated with `vmap` instead of the reference's sequential RANSAC loop
(Sim3Solver::iterate), optional fixed scale for stereo (Sim3Solver.h:39-61).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def horn_sim3(p1, p2, fix_scale=False):
    """Closed-form S21 aligning p1 -> p2 (both (N, 3)).

    Returns (s, R, t) with p2 ~= s * R @ p1 + t.  Same least-squares
    similarity as Sim3Solver::ComputeSim3 (Horn 1987) computed via the SVD
    (Umeyama) form, which is numerically identical on exact data and more
    robust on minimal samples.
    """
    c1 = p1.mean(axis=0)
    c2 = p2.mean(axis=0)
    x1 = p1 - c1
    x2 = p2 - c2
    cov = x2.T @ x1
    U, D, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, 0.0], p1.dtype)) + \
        jnp.diag(jnp.array([0.0, 0.0, 1.0], p1.dtype)) * d
    R = U @ S @ Vt
    rot1 = (R @ x1.T).T
    if fix_scale:
        s = jnp.asarray(1.0, p1.dtype)
    else:
        s = jnp.sum(x2 * rot1) / jnp.maximum(jnp.sum(rot1 * rot1), 1e-12)
    t = c2 - s * (R @ c1)
    return s, R, t


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(p1, p2, valid, cam1_proj, cam2_proj, th1, th2, key,
                n_hyp: int = 64, fix_scale: bool = False):
    """Batched Sim3 RANSAC.

    p1/p2: (N, 3) matched 3D points in KF1/KF2 camera coords; valid mask.
    cam*_proj = (fx, fy, cx, cy).  th* = per-point chi2 thresholds
    (9.21 * sigma2, Sim3Solver.cpp mvnMaxError).
    Returns (s, R, t, inliers, best_count): best S12... note direction:
    computes S12 with p2 -> p1 like the reference's (T12) convention —
    here we return S21 aligning p1 into p2's frame.
    """
    N = p1.shape[0]
    n_valid = jnp.sum(valid)

    def project(p, cam):
        fx, fy, cx, cy = cam
        z = jnp.maximum(p[:, 2], 1e-9)
        return jnp.stack([fx * p[:, 0] / z + cx, fy * p[:, 1] / z + cy], axis=1)

    obs1 = project(p1, cam1_proj)
    obs2 = project(p2, cam2_proj)

    idx_pool = jnp.flatnonzero(valid, size=N, fill_value=0)

    def one(k):
        sel = jax.random.randint(k, (3,), 0, jnp.maximum(n_valid, 1))
        sel = jnp.take(idx_pool, sel)
        s, R, t = horn_sim3(p1[sel], p2[sel], fix_scale)
        # transform all p1 into frame 2 and check reprojection both ways
        p1_in2 = s * (p1 @ R.T) + t
        si, Ri, ti = 1.0 / s, R.T, -(R.T @ t) / s
        p2_in1 = si * (p2 @ Ri.T) + ti
        e2 = jnp.sum((project(p1_in2, cam2_proj) - obs2) ** 2, axis=1)
        e1 = jnp.sum((project(p2_in1, cam1_proj) - obs1) ** 2, axis=1)
        inl = valid & (e1 < th1) & (e2 < th2)
        return jnp.sum(inl), s, R, t

    keys = jax.random.split(key, n_hyp)
    counts, ss, Rs, ts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    s, R, t = ss[best], Rs[best], ts[best]
    p1_in2 = s * (p1 @ R.T) + t
    si, Ri, ti = 1.0 / s, R.T, -(R.T @ t) / s
    p2_in1 = si * (p2 @ Ri.T) + ti
    e2 = jnp.sum((project(p1_in2, cam2_proj) - obs2) ** 2, axis=1)
    e1 = jnp.sum((project(p2_in1, cam1_proj) - obs1) ** 2, axis=1)
    inliers = valid & (e1 < th1) & (e2 < th2)
    return s, R, t, inliers, counts[best]
