"""JAX Levenberg-Marquardt optimizers replacing g2o.

TPU-native replacement for src/Optimizer.cpp + Thirdparty/g2o:
- `pose_optimization`  <- Optimizer::PoseOptimization (Optimizer.cpp:244-456):
  motion-only BA, 4 rounds x 10 LM iterations, chi2 gates 5.991 (mono) /
  7.815 (stereo), Huber kernel on rounds 0-2, outlier re-classification
  between rounds, each round restarting from the input pose.
- `local_bundle_adjustment` <- Optimizer::LocalBundleAdjustment
  (Optimizer.cpp:458-784): cameras + landmarks with Schur complement on the
  3x3 landmark blocks (see local_ba.py).

Design differences from g2o (documented, intentional):
- Jacobians come from `jax.jacfwd` of the residual at the identity
  retraction — no hand-derived 2x6 blocks.
- LM uses Nielsen damping with one trial step per iteration (g2o retries
  failed steps inside one iteration); both drive rho-based lambda updates
  and converge to the same optimum on these small problems.
- Edges live in fixed-size padded arrays with weight masks instead of a
  dynamic graph; "removing" an outlier edge is zeroing its weight.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.lie import exp_se3, exp_sim3, se3_compose, sim3_compose

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_SIM3 = 10.0   # Optimizer::OptimizeSim3 deltaHuber^2 (Optimizer.cpp:1100)
LM_TAU = 1e-5


def _project_stereo(Rcw, tcw, pw, fx, fy, cx, cy, bf):
    """Returns (u, v, u_right) for a world point; z clamped to avoid NaNs."""
    pc = Rcw @ pw + tcw
    z = jnp.maximum(pc[2], 1e-6)
    invz = 1.0 / z
    u = fx * pc[0] * invz + cx
    v = fy * pc[1] * invz + cy
    ur = u - bf * invz
    return jnp.stack([u, v, ur]), pc[2]


def _residuals(xi, Rcw, tcw, points, obs, fx, fy, cx, cy, bf):
    """Per-edge 3-residual (u, v, ur); mono edges mask the ur component.

    xi is the local update: pose = exp(xi) * (Rcw, tcw) (g2o vertex oplus).
    """
    dR, dt = exp_se3(xi)
    R, t = se3_compose(dR, dt, Rcw, tcw)

    def one(pw, ob):
        pred, _ = _project_stereo(R, t, pw, fx, fy, cx, cy, bf)
        return pred - ob

    return jax.vmap(one)(points, obs)


@partial(jax.jit, static_argnames=())
def pose_optimization(Rcw, tcw, points, obs_uv, obs_ur, inv_sigma2, valid,
                      fx, fy, cx, cy, bf):
    # TPU matmuls default to bf16 passes; the normal equations need full f32
    with jax.default_matmul_precision("highest"):
        return _pose_optimization(Rcw, tcw, points, obs_uv, obs_ur,
                                  inv_sigma2, valid, fx, fy, cx, cy, bf)


def _pose_optimization(Rcw, tcw, points, obs_uv, obs_ur, inv_sigma2, valid,
                       fx, fy, cx, cy, bf):
    """Motion-only bundle adjustment.

    Args (all padded to fixed N):
      Rcw, tcw: initial world->camera pose.
      points: (N, 3) world positions of matched map points.
      obs_uv: (N, 2) undistorted keypoint coords.
      obs_ur: (N,) right-image u coord, < 0 for monocular observations.
      inv_sigma2: (N,) per-octave information weight.
      valid: (N,) bool mask of real (non-padded) correspondences.

    Returns (Rcw', tcw', inlier (N,) bool, n_inliers int32).

    Runs inside the fused per-frame program (core/fused_track.py) twice per
    frame, so the 4x10 LM iteration chain is the device hot loop: residuals
    are one batched projection, Jacobians the closed-form
    J = dproj/dpc @ [I | -hat(q)] (parity with jacfwd through the
    exp/compose chain is covered by the local-BA jacobian test — same
    formula), and the accepted cost is carried between iterations instead
    of recomputed.
    """
    N = points.shape[0]
    dtype = tcw.dtype
    is_stereo = obs_ur >= 0
    obs = jnp.concatenate([obs_uv, jnp.where(is_stereo, obs_ur, 0.0)[:, None]], axis=1)
    # residual component mask: mono edges use (u, v) only
    comp_mask = jnp.stack(
        [jnp.ones(N), jnp.ones(N), is_stereo.astype(jnp.float32)], axis=1)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    def project(R, t):
        """(N, 3) residuals + camera-frame points q."""
        q = points @ R.T + t
        z = jnp.maximum(q[:, 2], 1e-6)
        invz = 1.0 / z
        u = fx * q[:, 0] * invz + cx
        v = fy * q[:, 1] * invz + cy
        ur = u - bf * invz
        return jnp.stack([u, v, ur], axis=1) - obs, q

    def jac(q):
        """(N, 3, 6) closed-form Jacobian at the linearization point."""
        x, y, zraw = q[:, 0], q[:, 1], q[:, 2]
        z = jnp.maximum(zraw, 1e-6)
        zslope = (zraw >= 1e-6).astype(dtype)
        invz = 1.0 / z
        invz2 = invz * invz * zslope
        zero = jnp.zeros(N, dtype)
        Pj = jnp.stack([
            jnp.stack([fx * invz, zero, -fx * x * invz2], axis=1),
            jnp.stack([zero, fy * invz, -fy * y * invz2], axis=1),
            jnp.stack([fx * invz, zero, (bf - fx * x) * invz2], axis=1),
        ], axis=1)
        hatq = jnp.zeros((N, 3, 3), dtype)
        hatq = hatq.at[:, 0, 1].set(-q[:, 2]).at[:, 0, 2].set(q[:, 1])
        hatq = hatq.at[:, 1, 0].set(q[:, 2]).at[:, 1, 2].set(-q[:, 0])
        hatq = hatq.at[:, 2, 0].set(-q[:, 1]).at[:, 2, 1].set(q[:, 0])
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 3, 3))
        dpc_dxi = jnp.concatenate([I3, -hatq], axis=2)
        return jnp.einsum("nij,njk->nik", Pj, dpc_dxi)

    def chi2_of(r):
        return jnp.sum(r * r * comp_mask, axis=1) * inv_sigma2

    def lm_solve(R0, t0, active, use_huber):
        """10 LM iterations over the active edge set, from (R0, t0)."""

        def cost_of(r):
            chi2 = chi2_of(r)
            # robust cost (g2o rho[0]) for the acceptance test
            d = jnp.sqrt(delta2)
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            huber = jnp.where(chi2 <= delta2, chi2, 2.0 * d * e - delta2)
            cost = jnp.where(use_huber, huber, chi2)
            return jnp.sum(jnp.where(active, cost, 0.0))

        def build(r, q):
            J = jac(q)                     # (N, 3, 6)
            chi2 = chi2_of(r)
            w_huber = jnp.where(
                chi2 <= delta2, 1.0,
                jnp.sqrt(delta2) / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
            w = jnp.where(use_huber, w_huber, 1.0) * inv_sigma2
            w = jnp.where(active, w, 0.0)
            Jm = J * comp_mask[:, :, None]
            H = jnp.einsum("nij,nik,n->jk", Jm, Jm, w)
            g = jnp.einsum("nij,ni,n->j", Jm, r * comp_mask, w)
            return H, g

        r0, q0 = project(R0, t0)
        f_init = cost_of(r0)
        H0, _ = build(r0, q0)
        lam0 = LM_TAU * jnp.max(jnp.diag(H0))

        def body(_, state):
            R, t, r, q, f0, lam, nu = state
            H, g = build(r, q)
            dx = jnp.linalg.solve(H + lam * jnp.eye(6, dtype=H.dtype), -g)
            dR, dt = exp_se3(dx)
            Rn, tn = se3_compose(dR, dt, R, t)
            r1, q1 = project(Rn, tn)
            f1 = cost_of(r1)
            pred = 0.5 * jnp.dot(dx, lam * dx - g)
            rho = (f0 - f1) / jnp.maximum(pred, 1e-12)
            ok = (rho > 0) & jnp.all(jnp.isfinite(dx))
            R = jnp.where(ok, Rn, R)
            t = jnp.where(ok, tn, t)
            r = jnp.where(ok, r1, r)
            q = jnp.where(ok, q1, q)
            f0 = jnp.where(ok, f1, f0)
            lam = jnp.where(
                ok, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                lam * nu)
            nu = jnp.where(ok, 2.0, nu * 2.0)
            return R, t, r, q, f0, lam, nu

        R, t, _, _, _, _, _ = jax.lax.fori_loop(
            0, 10, body, (R0, t0, r0, q0, f_init, lam0, 2.0))
        return R, t

    inlier = valid
    R_out, t_out = Rcw, tcw
    for rnd in range(4):
        use_huber = jnp.asarray(rnd < 3)
        R_out, t_out = lm_solve(Rcw, tcw, inlier, use_huber)
        r, _ = project(R_out, t_out)
        chi2 = chi2_of(r)
        inlier = valid & (chi2 <= delta2)

    n_inliers = jnp.sum(inlier.astype(jnp.int32))
    return R_out, t_out, inlier, n_inliers


@partial(jax.jit, static_argnames=("fix_scale",))
def sim3_optimization(P1, P2, obs1, obs2, inv_s2_1, inv_s2_2, valid,
                      s0, R0, t0, fx, fy, cx, cy, fix_scale: bool = True):
    """Sim3 refinement between two keyframes (Optimizer::OptimizeSim3,
    Optimizer.cpp:1051-1248).

    P1/P2: (N, 3) matched point positions in KF1/KF2 camera frames.
    obs1/obs2: (N, 2) their pixel observations in KF1/KF2.
    (s0, R0, t0): initial Sim3 S12 mapping KF2 camera coords into KF1's.
    Bidirectional reprojection residuals with Huber(sqrt(10)); after the
    first solve, edges with chi2 > 10 in either direction are dropped and
    the remainder re-solved (the reference's nBad loop + 10 extra its).
    Returns (s, R, t, inlier, n_inliers).
    """
    with jax.default_matmul_precision("highest"):
        def params_of(xi, s, R, t):
            ds, dR, dt = exp_sim3(xi)
            return sim3_compose(ds, dR, dt, s, R, t)

        def residuals(xi, s, R, t):
            sn, Rn, tn = params_of(xi, s, R, t)

            def proj(p):
                z = jnp.maximum(p[2], 1e-6)
                return jnp.stack([fx * p[0] / z + cx, fy * p[1] / z + cy])

            def one(p1, p2, o1, o2):
                q1 = sn * (Rn @ p2) + tn                  # KF2 -> KF1 cam
                q2 = (Rn.T @ (p1 - tn)) / sn              # KF1 -> KF2 cam
                return jnp.concatenate([proj(q1) - o1, proj(q2) - o2])

            return jax.vmap(one)(P1, P2, obs1, obs2)      # (N, 4)

        jacfn = jax.jacfwd(residuals)
        zero = jnp.zeros(7, jnp.float32)

        def chi2_dir(r):
            e1 = jnp.sum(r[:, :2] ** 2, axis=1) * inv_s2_1
            e2 = jnp.sum(r[:, 2:] ** 2, axis=1) * inv_s2_2
            return e1, e2

        def lm(s, R, t, active, n_iters):
            w4 = jnp.stack([inv_s2_1, inv_s2_1, inv_s2_2, inv_s2_2], axis=1)

            def cost(sa, Ra, ta):
                r = residuals(zero, sa, Ra, ta)
                e1, e2 = chi2_dir(r)

                def huber(c):
                    rt = jnp.sqrt(jnp.maximum(c, 1e-12))
                    d = jnp.sqrt(CHI2_SIM3)
                    return jnp.where(c <= CHI2_SIM3, c, 2 * d * rt - CHI2_SIM3)

                return jnp.sum(jnp.where(active, huber(e1) + huber(e2), 0.0))

            def build(sa, Ra, ta):
                r = residuals(zero, sa, Ra, ta)
                J = jacfn(zero, sa, Ra, ta)               # (N, 4, 7)
                e1, e2 = chi2_dir(r)

                def wgt(c):
                    return jnp.where(
                        c <= CHI2_SIM3, 1.0,
                        jnp.sqrt(CHI2_SIM3) / jnp.sqrt(jnp.maximum(c, 1e-12)))

                wh = jnp.stack([wgt(e1), wgt(e1), wgt(e2), wgt(e2)], axis=1)
                w = w4 * wh * active[:, None]
                H = jnp.einsum("nij,nik->jk", J * w[:, :, None], J)
                g = jnp.einsum("nij,ni->j", J * w[:, :, None], r)
                if fix_scale:  # lock the log-scale coordinate
                    H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                    g = g.at[6].set(0.0)
                return H, g

            def body(_, st):
                sa, Ra, ta, lam, nu = st
                H, g = build(sa, Ra, ta)
                dx = jnp.linalg.solve(
                    H + lam * jnp.eye(7, dtype=H.dtype), -g)
                sn, Rn, tn = params_of(dx, sa, Ra, ta)
                f0 = cost(sa, Ra, ta)
                f1 = cost(sn, Rn, tn)
                ok = (f1 < f0) & jnp.all(jnp.isfinite(dx))
                sa = jnp.where(ok, sn, sa)
                Ra = jnp.where(ok, Rn, Ra)
                ta = jnp.where(ok, tn, ta)
                lam = jnp.where(ok, lam / 3.0, lam * nu)
                nu = jnp.where(ok, 2.0, nu * 2.0)
                return sa, Ra, ta, lam, nu

            H0, _ = build(s, R, t)
            lam0 = LM_TAU * jnp.max(jnp.diag(H0))
            sa, Ra, ta, _, _ = jax.lax.fori_loop(
                0, n_iters, body, (s, R, t, lam0, 2.0))
            return sa, Ra, ta

        s, R, t = lm(s0, R0, t0, valid, 5)
        r = residuals(zero, s, R, t)
        e1, e2 = chi2_dir(r)
        inlier = valid & (e1 <= CHI2_SIM3) & (e2 <= CHI2_SIM3)
        s, R, t = lm(s, R, t, inlier, 10)
        r = residuals(zero, s, R, t)
        e1, e2 = chi2_dir(r)
        inlier = valid & (e1 <= CHI2_SIM3) & (e2 <= CHI2_SIM3)
        return s, R, t, inlier, jnp.sum(inlier.astype(jnp.int32))
