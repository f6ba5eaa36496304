"""Batched two-view triangulation + epipolar matching (JAX).

TPU analog of LocalMapping::CreateNewMapPoints' inner math
(reference src/LocalMapping.cpp:213-458) and
ORBmatcher::SearchForTriangulation's epipolar gate (ORBmatcher.cpp:644-810):
dense candidate masks + MXU Hamming instead of BoW-bucketed loops, vmapped
SVD triangulation instead of per-pair cv::SVD.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hamming import hamming_matrix
from .matcher import BIG, TH_LOW, rotation_consistency


@jax.jit
def epipolar_match(desc1, valid1, angle1, xy1, ur1,
                   desc2, valid2, angle2, xy2,
                   F12, sigma2_levels, oct2, ex, ey, sf2_of_oct):
    """Match unassociated features across two keyframes with the epipolar gate.

    F12: fundamental matrix mapping kf1 points to epipolar lines in kf2.
    (ex, ey): epipole of kf1's camera center in kf2.
    Spec: ORBmatcher::SearchForTriangulation (ORBmatcher.cpp:644-810) —
    bestDist < TH_LOW, epipolar distance chi2 < 3.84*sigma2, epipole
    proximity rejection for non-stereo kp1, rotation histogram.
    """
    S1 = desc1.shape[0]
    dist = jnp.where(valid1[:, None] & valid2[None, :],
                     hamming_matrix(desc1, desc2), BIG)

    # epipolar line of each kp1 in image 2: l = F12^T? reference uses
    # a,b,c from kp1^T F12 (ORBmatcher.cpp CheckDistEpipolarLine)
    ones = jnp.ones((S1, 1), xy1.dtype)
    p1h = jnp.concatenate([xy1, ones], axis=1)          # (S1, 3)
    lines = p1h @ F12                                   # (S1, 3): a, b, c
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * xy2[None, :, 0] + b * xy2[None, :, 1] + c  # (S1, S2)
    den = a * a + b * b
    dsqr = num * num / jnp.maximum(den, 1e-12)
    epi_ok = dsqr < 3.84 * jnp.take(sigma2_levels, oct2)[None, :]

    # epipole proximity: skip kp2 too close to the epipole (mono kp1 only;
    # we apply it uniformly — stereo kp1 rarely matters here)
    de2 = (xy2[:, 0] - ex) ** 2 + (xy2[:, 1] - ey) ** 2
    far = de2 >= 100.0 * jnp.take(sf2_of_oct, oct2)
    cand = epi_ok & far[None, :]
    dist = jnp.where(cand, dist, BIG)

    best2 = jnp.argmin(dist, axis=1)
    bestd = jnp.take_along_axis(dist, best2[:, None], axis=1)[:, 0]
    matched = bestd < TH_LOW
    rot = angle1 - jnp.take(angle2, best2)
    matched = rotation_consistency(rot, matched)
    return jnp.where(matched, best2, -1)


@jax.jit
def triangulate_pairs(R1, t1, R2, t2, xy1n, xy2n, ur1, ur2, z1, z2,
                      kp_xy1, kp_xy2, oct1, oct2,
                      sigma2_1, sigma2_2, fx, fy, cx, cy, bf,
                      ratio_factor):
    """Parallax-arbitrated triangulation of matched feature pairs.

    xy*n: normalized camera rays ((u-cx)/fx, (v-cy)/fy, 1).  z*: stereo depth
    (<=0 if mono).  Returns (points (N,3), ok (N,)).
    Spec: LocalMapping.cpp:284-437 (SVD triangulation vs stereo unprojection
    by parallax, two-view reprojection chi2 gates, scale consistency).
    """
    N = xy1n.shape[0]

    def one(r1c, t1c, r2c, t2c, x1, x2, uur1, uur2, zz1, zz2,
            k1, k2, o1, o2, s1, s2):
        ray1 = r1c.T @ x1
        ray2 = r2c.T @ x2
        cosp = jnp.dot(ray1, ray2) / jnp.maximum(
            jnp.linalg.norm(ray1) * jnp.linalg.norm(ray2), 1e-12)
        cos_s1 = jnp.where(zz1 > 0, jnp.cos(2.0 * jnp.arctan2(bf / fx / 2.0, zz1)), 2.0)
        cos_s2 = jnp.where(zz2 > 0, jnp.cos(2.0 * jnp.arctan2(bf / fx / 2.0, zz2)), 2.0)
        cos_stereo = jnp.minimum(cos_s1, cos_s2)

        # SVD path
        P1 = jnp.concatenate([r1c, t1c[:, None]], axis=1)
        P2 = jnp.concatenate([r2c, t2c[:, None]], axis=1)
        A = jnp.stack([
            x1[0] * P1[2] - P1[0],
            x1[1] * P1[2] - P1[1],
            x2[0] * P2[2] - P2[0],
            x2[1] * P2[2] - P2[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        hp = vt[3]
        svd_ok = jnp.abs(hp[3]) > 1e-12
        p_svd = hp[:3] / jnp.where(svd_ok, hp[3], 1.0)

        # stereo fallback: camera coords = ray * z; world = R^T (pc - t)
        c1 = -r1c.T @ t1c
        c2 = -r2c.T @ t2c
        p_st1 = r1c.T @ (x1 * zz1 - t1c)
        p_st2 = r2c.T @ (x2 * zz2 - t2c)

        use_svd = (cosp < cos_stereo) & (cosp > 0) & svd_ok
        use_s1 = ~use_svd & (zz1 > 0) & (cos_s1 < cos_s2)
        use_s2 = ~use_svd & ~use_s1 & (zz2 > 0)
        p = jnp.where(use_svd, p_svd, jnp.where(use_s1, p_st1, p_st2))
        any_path = use_svd | use_s1 | use_s2

        # reprojection gates in both views
        def reproj_ok(rc, tc, kp, uur, sig2, pw):
            pc = rc @ pw + tc
            ok_z = pc[2] > 0
            invz = 1.0 / jnp.maximum(pc[2], 1e-9)
            u = fx * pc[0] * invz + cx
            v = fy * pc[1] * invz + cy
            du = u - kp[0]
            dv = v - kp[1]
            mono_ok = (du * du + dv * dv) < 5.991 * sig2
            dur = u - bf * invz - uur
            st_ok = (du * du + dv * dv + dur * dur) < 7.815 * sig2
            return ok_z & jnp.where(uur >= 0, st_ok, mono_ok)

        ok1 = reproj_ok(r1c, t1c, k1, uur1, s1, p)
        ok2 = reproj_ok(r2c, t2c, k2, uur2, s2, p)

        # scale consistency
        d1 = jnp.linalg.norm(p - c1)
        d2 = jnp.linalg.norm(p - c2)
        ratio_dist = d2 / jnp.maximum(d1, 1e-12)
        ratio_oct = jnp.sqrt(s1) / jnp.maximum(jnp.sqrt(s2), 1e-12)
        scale_ok = (ratio_dist * ratio_factor >= ratio_oct) & \
            (ratio_dist <= ratio_oct * ratio_factor)
        ok = any_path & ok1 & ok2 & scale_ok & (d1 > 0) & (d2 > 0)
        return p, ok

    return jax.vmap(one)(R1, t1, R2, t2, xy1n, xy2n, ur1, ur2, z1, z2,
                         kp_xy1, kp_xy2, oct1, oct2, sigma2_1, sigma2_2)


def fundamental_matrix(R1w, t1w, R2w, t2w, K):
    """F12 = K^-T [t12]_x R12 K^-1 (ORBmatcher/LocalMapping ComputeF12)."""
    R12 = R1w @ R2w.T
    t12 = -R12 @ t2w + t1w
    tx = np.array([[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]],
                   [-t12[1], t12[0], 0]], np.float32)
    Kinv = np.linalg.inv(K)
    return (Kinv.T @ tx @ R12 @ Kinv).astype(np.float32)
