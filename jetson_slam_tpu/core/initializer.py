"""Monocular map initialization: parallel homography/fundamental RANSAC.

Replacement for src/Initializer.cpp: the reference scores H and F models
over 200 sequential RANSAC iterations (Initializer.h:43) and picks by
RH = SH/(SH+SF) > 0.40, then reconstructs R|t (Faugeras decomposition for H,
essential decomposition for F) and triangulates with cheirality/parallax
checks.  Here each model's hypotheses are a `vmap` batch, scores use the
reference's chi2 thresholds (5.991 H / 3.841 F, thScore 5.991), and the
R|t candidates are checked in one batched pass.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(pts):
    mean = pts.mean(axis=0)
    d = jnp.abs(pts - mean).mean(axis=0)
    s = 1.0 / jnp.maximum(d, 1e-9)
    T = jnp.array([[s[0], 0, -mean[0] * s[0]],
                   [0, s[1], -mean[1] * s[1]],
                   [0, 0, 1.0]])
    return (pts - mean) * s, T


def _dlt_h(p1, p2):
    """Homography from 8 correspondences (DLT)."""
    N = p1.shape[0]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros(N)
    o = jnp.ones(N)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], 1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], 1)
    A = jnp.concatenate([r1, r2], 0)
    _, _, vt = jnp.linalg.svd(A)
    return vt[-1].reshape(3, 3)


def _dlt_f(p1, p2):
    """Fundamental matrix, normalized 8-point."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], 1)
    _, _, vt = jnp.linalg.svd(A)
    F = vt[-1].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _score_h(H21, p1, p2, valid, sigma2):
    H12 = jnp.linalg.inv(H21)

    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], 1)
        proj = ah @ H.T
        proj = proj[:, :2] / jnp.maximum(jnp.abs(proj[:, 2:3]), 1e-12) * jnp.sign(proj[:, 2:3] + 1e-30)
        return jnp.sum((proj - b) ** 2, 1)

    chi1 = transfer(H12, p2, p1) / sigma2
    chi2 = transfer(H21, p1, p2) / sigma2
    th = 5.991
    ok = (chi1 < th) & (chi2 < th) & valid
    score = jnp.sum(jnp.where(ok, (th - chi1) + (th - chi2), 0.0))
    return score, ok


def _score_f(F21, p1, p2, valid, sigma2):
    ah1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], 1)
    ah2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], 1)
    l2 = ah1 @ F21.T  # epipolar lines in image 2
    l1 = ah2 @ F21
    d2 = jnp.sum(l2 * ah2, 1) ** 2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = jnp.sum(l1 * ah1, 1) ** 2 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    th, th_score = 3.841, 5.991
    c1 = d1 / sigma2
    c2 = d2 / sigma2
    ok = (c1 < th) & (c2 < th) & valid
    score = jnp.sum(jnp.where(ok, (th_score - c1) + (th_score - c2), 0.0))
    return score, ok


def _triangulate_and_check(R, t, p1n, p2n, valid, fx, sigma2_px, K):
    """CheckRT (Initializer.cpp): triangulate with P1=[I|0], P2=[R|t];
    count points with positive depth both views, parallax, reproj < 4*sigma2."""
    N = p1n.shape[0]
    P2 = jnp.concatenate([R, t[:, None]], 1)

    def tri(a, b):
        A = jnp.stack([
            a[0] * jnp.array([0., 0., 1., 0.]) - jnp.array([1., 0., 0., 0.]),
            a[1] * jnp.array([0., 0., 1., 0.]) - jnp.array([0., 1., 0., 0.]),
            b[0] * P2[2] - P2[0],
            b[1] * P2[2] - P2[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        h = vt[-1]
        return h[:3] / jnp.where(jnp.abs(h[3]) > 1e-12, h[3], 1.0)

    X = jax.vmap(tri)(p1n, p2n)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    # parallax
    n1 = X
    n2 = X - (-R.T @ t)
    cosp = jnp.sum(n1 * n2, 1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=1) * jnp.linalg.norm(n2, axis=1), 1e-12)
    # reprojection in normalized coords scaled by fx
    e1 = jnp.sum((X[:, :2] / jnp.maximum(z1[:, None], 1e-12) - p1n) ** 2, 1) * fx * fx
    e2 = jnp.sum((Xc2[:, :2] / jnp.maximum(z2[:, None], 1e-12) - p2n) ** 2, 1) * fx * fx
    good = valid & (z1 > 0) & (z2 > 0) & (cosp < 0.99998) & \
        (e1 < 4.0 * sigma2_px) & (e2 < 4.0 * sigma2_px)
    return X, good, cosp


class MonoInitializer:
    """Two-view initializer.  sigma = 1.0 like the reference default."""

    def __init__(self, fx, fy, cx, cy, sigma=1.0, n_hyp=200):
        self.K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.sigma2 = sigma * sigma
        self.n_hyp = n_hyp
        self._key = jax.random.PRNGKey(42)

    def initialize(self, kp1, kp2, valid):
        """kp1/kp2 (N, 2) matched pixel coords; returns
        (ok, R21, t21, points3d (N,3), good_mask)."""
        N = len(kp1)
        if valid.sum() < 20:
            return False, None, None, None, None
        p1 = jnp.asarray(kp1, jnp.float32)
        p2 = jnp.asarray(kp2, jnp.float32)
        vmask = jnp.asarray(valid)
        self._key, k1 = jax.random.split(self._key)

        idx_pool = jnp.flatnonzero(vmask, size=N, fill_value=0)
        n_valid = jnp.sum(vmask)

        p1n_, T1 = _normalize(p1)
        p2n_, T2 = _normalize(p2)

        def hyp(key):
            sel = jax.random.randint(key, (8,), 0, jnp.maximum(n_valid, 1))
            sel = jnp.take(idx_pool, sel)
            Hn = _dlt_h(p1n_[sel], p2n_[sel])
            H21 = jnp.linalg.inv(T2) @ Hn @ T1
            H21 = H21 / jnp.where(jnp.abs(H21[2, 2]) > 1e-12, H21[2, 2], 1.0)
            Fn = _dlt_f(p1n_[sel], p2n_[sel])
            F21 = T2.T @ Fn @ T1
            sh, _ = _score_h(H21, p1, p2, vmask, self.sigma2)
            sf, _ = _score_f(F21, p1, p2, vmask, self.sigma2)
            return sh, H21, sf, F21

        keys = jax.random.split(k1, self.n_hyp)
        sh, Hs, sf, Fs = jax.vmap(hyp)(keys)
        bh = jnp.argmax(sh)
        bf = jnp.argmax(sf)
        SH, SF = float(sh[bh]), float(sf[bf])
        if SH + SF <= 0:
            return False, None, None, None, None
        use_h = SH / (SH + SF) > 0.40

        Kj = jnp.asarray(self.K)
        Kinv = jnp.linalg.inv(Kj)
        p1n = (jnp.concatenate([p1, jnp.ones((N, 1))], 1) @ Kinv.T)[:, :2]
        p2n = (jnp.concatenate([p2, jnp.ones((N, 1))], 1) @ Kinv.T)[:, :2]

        # refit the winning model on all its inliers before decomposition —
        # a minimal-sample F is too noisy for a clean essential decomposition
        if use_h:
            _, inl = _score_h(Hs[bh], p1, p2, vmask, self.sigma2)
            sel = np.flatnonzero(np.asarray(inl))
            Hn = _dlt_h(p1n_[sel], p2n_[sel])
            H21 = jnp.linalg.inv(T2) @ Hn @ T1
            H21 = H21 / H21[2, 2]
            _, inl = _score_h(H21, p1, p2, vmask, self.sigma2)
            cands = self._decompose_h(np.asarray(H21))
        else:
            _, inl = _score_f(Fs[bf], p1, p2, vmask, self.sigma2)
            sel = np.flatnonzero(np.asarray(inl))
            Fn = _dlt_f(p1n_[sel], p2n_[sel])
            F21 = T2.T @ Fn @ T1
            _, inl = _score_f(F21, p1, p2, vmask, self.sigma2)
            cands = self._decompose_f(np.asarray(F21))

        best = None
        for R, t in cands:
            X, good, cosp = _triangulate_and_check(
                jnp.asarray(R.astype(np.float32)),
                jnp.asarray(t.astype(np.float32)),
                p1n, p2n, inl, self.fx, self.sigma2, Kj)
            n_good = int(np.asarray(good).sum())
            if best is None or n_good > best[0]:
                best = (n_good, R, t, np.asarray(X), np.asarray(good))
        n_good, R, t, X, good = best
        n_inl = int(np.asarray(inl).sum())
        # reference acceptance: enough good points and clear winner
        if n_good < 30 or n_good < 0.7 * n_inl:
            return False, None, None, None, None
        return True, R.astype(np.float32), t.astype(np.float32), X, good

    # ---------------------------------------------------------------- R|t
    def _decompose_f(self, F21):
        """Essential decomposition: 4 (R, t) candidates."""
        E = self.K.T @ F21 @ self.K
        U, _, Vt = np.linalg.svd(E)
        if np.linalg.det(U) < 0:
            U = -U
        if np.linalg.det(Vt) < 0:
            Vt = -Vt
        W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
        R1 = U @ W @ Vt
        R2 = U @ W.T @ Vt
        t = U[:, 2]
        t = t / max(np.linalg.norm(t), 1e-12)
        return [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    def _decompose_h(self, H21):
        """Faugeras SVD decomposition: 8 (R, t) candidates
        (Initializer::ReconstructH reference)."""
        A = np.linalg.inv(self.K) @ H21 @ self.K
        U, w, Vt = np.linalg.svd(A)
        s = np.linalg.det(U) * np.linalg.det(Vt)
        d1, d2, d3 = w
        if d1 / d2 < 1.00001 or d2 / d3 < 1.00001:
            return [(np.eye(3), np.array([0, 0, 1.0]))]
        out = []
        aux1 = np.sqrt(max((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0))
        aux3 = np.sqrt(max((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0))
        x1s = [aux1, aux1, -aux1, -aux1]
        x3s = [aux3, -aux3, aux3, -aux3]
        # d' = d2 case
        aux_st = np.sqrt(max((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0)) / ((d1 + d3) * d2)
        ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
        sts = [aux_st, -aux_st, -aux_st, aux_st]
        for i in range(4):
            Rp = np.array([[ct, 0, -sts[i]], [0, 1, 0], [sts[i], 0, ct]])
            tp = (d1 - d3) * np.array([x1s[i], 0, -x3s[i]])
            R = s * U @ Rp @ Vt
            t = U @ tp
            t = t / max(np.linalg.norm(t), 1e-12)
            out.append((R, t))
        # d' = -d2 case
        aux_sp = np.sqrt(max((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0)) / ((d1 - d3) * d2)
        cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
        sps = [aux_sp, -aux_sp, -aux_sp, aux_sp]
        for i in range(4):
            Rp = np.array([[cp, 0, sps[i]], [0, -1, 0], [sps[i], 0, -cp]])
            tp = (d1 + d3) * np.array([x1s[i], 0, x3s[i]])
            R = s * U @ Rp @ Vt
            t = U @ tp
            t = t / max(np.linalg.norm(t), 1e-12)
            out.append((R, t))
        return out
