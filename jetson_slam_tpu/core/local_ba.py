"""Bundle adjustment with Schur complement on landmark blocks (JAX LM).

TPU-native replacement for Optimizer::LocalBundleAdjustment /
BundleAdjustment (reference src/Optimizer.cpp:46-242, 458-784 on g2o):
cameras and landmarks in fixed-size padded arrays, per-point edge lists with
a bounded degree D, and the reduced camera system assembled with
segment-sums — the structure that later shards across a device mesh (edges
and landmarks partitioned, `psum` on the reduced system; parallel/dist_ba.py).

Reference semantics preserved:
- Huber deltas sqrt(5.991) mono / sqrt(7.815) stereo (Optimizer.cpp:550-556).
- Phase 1: 5 iterations with Huber; drop edges with chi2 > gate or negative
  depth; phase 2: 10 iterations without robust kernel (Optimizer.cpp:669-713).
- Fixed cameras anchor the gauge: their Jacobians are zeroed, identity
  blocks keep the reduced system SPD.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.lie import exp_se3, se3_compose

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
LM_TAU = 1e-5


def _edge_residual(xi_c, dp, R, t, pw, ob, fx, fy, cx, cy, bf):
    """Residual of one edge under camera update xi_c and point update dp."""
    dR, dt = exp_se3(xi_c)
    Rn, tn = se3_compose(dR, dt, R, t)
    p = pw + dp
    pc = Rn @ p + tn
    z = jnp.maximum(pc[2], 1e-6)
    invz = 1.0 / z
    u = fx * pc[0] * invz + cx
    v = fy * pc[1] * invz + cy
    ur = u - bf * invz
    return jnp.stack([u, v, ur]) - ob, pc[2]


@partial(jax.jit, static_argnames=("its1", "its2"))
def local_ba(cam_R, cam_t, cam_fixed, pts,
             e_cam, e_pt, obs, is_stereo, inv_sigma2, e_valid,
             pt_edges,
             fx, fy, cx, cy, bf, its1: int = 5, its2: int = 10):
    # TPU matmuls default to bf16 passes; the normal equations need full f32
    with jax.default_matmul_precision("highest"):
        return _local_ba(cam_R, cam_t, cam_fixed, pts, e_cam, e_pt, obs,
                         is_stereo, inv_sigma2, e_valid, pt_edges,
                         fx, fy, cx, cy, bf, its1, its2)


def _local_ba(cam_R, cam_t, cam_fixed, pts,
              e_cam, e_pt, obs, is_stereo, inv_sigma2, e_valid,
              pt_edges,
              fx, fy, cx, cy, bf, its1: int = 5, its2: int = 10):
    """Sparse LM with landmark Schur complement.

    Shapes: cam_* (C, ...), pts (P, 3), edges (E, ...), pt_edges (P, D)
    indices into the edge list (-1 = pad).  Returns
    (cam_R', cam_t', pts', outlier (E,) bool).
    """
    C = cam_R.shape[0]
    P = pts.shape[0]
    E = e_cam.shape[0]
    D = pt_edges.shape[1]
    dtype = pts.dtype

    comp = jnp.stack([jnp.ones(E), jnp.ones(E),
                      is_stereo.astype(dtype)], axis=1)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    zero6 = jnp.zeros(6, dtype)
    zero3 = jnp.zeros(3, dtype)

    def edge_res(R_all, t_all, p_all):
        def one(c, p, ob):
            r, z = _edge_residual(zero6, zero3, R_all[c], t_all[c], p_all[p],
                                  ob, fx, fy, cx, cy, bf)
            return r, z
        return jax.vmap(one)(e_cam, e_pt, obs)

    def edge_jacobians(R_all, t_all, p_all):
        def one(c, p, ob):
            fc = lambda xi: _edge_residual(xi, zero3, R_all[c], t_all[c],
                                           p_all[p], ob, fx, fy, cx, cy, bf)[0]
            fp = lambda dp: _edge_residual(zero6, dp, R_all[c], t_all[c],
                                           p_all[p], ob, fx, fy, cx, cy, bf)[0]
            return jax.jacfwd(fc)(zero6), jax.jacfwd(fp)(zero3)
        return jax.vmap(one)(e_cam, e_pt, obs)

    def chi2_of(r):
        return jnp.sum(r * r * comp, axis=1) * inv_sigma2

    def robust_cost(chi2, use_huber):
        d = jnp.sqrt(delta2)
        e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        hub = jnp.where(chi2 <= delta2, chi2, 2.0 * d * e - delta2)
        return jnp.where(use_huber, hub, chi2)

    fixed_f = cam_fixed.astype(dtype)

    def lm_phase(R0, t0, p0, active, use_huber, n_iters):
        def total_cost(R, t, p):
            r, _ = edge_res(R, t, p)
            return jnp.sum(jnp.where(active, robust_cost(chi2_of(r), use_huber), 0.0))

        def build_and_solve(R, t, p, lam):
            r, _ = edge_res(R, t, p)
            Jc, Jp = edge_jacobians(R, t, p)       # (E,3,6), (E,3,3)
            chi2 = chi2_of(r)
            w_h = jnp.where(chi2 <= delta2, 1.0,
                            jnp.sqrt(delta2) / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
            w = jnp.where(use_huber, w_h, 1.0) * inv_sigma2
            w = jnp.where(active, w, 0.0)
            Jc = Jc * comp[:, :, None] * (1.0 - fixed_f[e_cam])[:, None, None]
            Jp = Jp * comp[:, :, None]
            rm = r * comp

            Hcc_e = jnp.einsum("eij,eik,e->ejk", Jc, Jc, w)   # (E,6,6)
            Hpp_e = jnp.einsum("eij,eik,e->ejk", Jp, Jp, w)   # (E,3,3)
            G_e = jnp.einsum("eij,eik,e->ejk", Jc, Jp, w)      # (E,6,3)
            gc_e = jnp.einsum("eij,ei,e->ej", Jc, rm, w)       # (E,6)
            gp_e = jnp.einsum("eij,ei,e->ej", Jp, rm, w)       # (E,3)

            Hcc = jnp.zeros((C, 6, 6), dtype).at[e_cam].add(Hcc_e)
            gc = jnp.zeros((C, 6), dtype).at[e_cam].add(gc_e)
            Hpp = jnp.zeros((P, 3, 3), dtype).at[e_pt].add(Hpp_e)
            gp = jnp.zeros((P, 3), dtype).at[e_pt].add(gp_e)

            I6 = jnp.eye(6, dtype=dtype)
            I3 = jnp.eye(3, dtype=dtype)
            Hcc = Hcc + lam * I6[None]
            Hpp = Hpp + lam * I3[None]
            Hpp_inv = jnp.linalg.inv(Hpp)

            K_e = jnp.einsum("eij,ejk->eik", G_e, Hpp_inv[e_pt])  # (E,6,3)

            # Schur pairs via per-point bounded edge lists
            pe = pt_edges  # (P, D)
            pe_ok = pe >= 0
            pe_safe = jnp.where(pe_ok, pe, 0)
            Kp = K_e[pe_safe] * pe_ok[..., None, None]            # (P,D,6,3)
            Gp = G_e[pe_safe] * pe_ok[..., None, None]            # (P,D,6,3)
            camp = jnp.where(pe_ok, e_cam[pe_safe], C)            # (P,D)
            pair_blocks = jnp.einsum("pdij,pekj->pdeik", Kp, Gp)  # (P,D,D,6,6)
            pair_idx = camp[:, :, None] * (C + 1) + camp[:, None, :]
            S = jnp.zeros(((C + 1) * (C + 1), 6, 6), dtype).at[
                pair_idx.reshape(-1)].add(pair_blocks.reshape(-1, 6, 6))
            S = S.reshape(C + 1, C + 1, 6, 6)[:C, :C]
            S = -S
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)

            rhs = -gc + jnp.zeros((C, 6), dtype).at[e_cam].add(
                jnp.einsum("eij,ej->ei", K_e, gp[e_pt]))

            # fixed cameras: identity rows/cols, zero rhs
            free = (1.0 - fixed_f)
            S = S * free[:, None, None, None] * free[None, :, None, None]
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                fixed_f[:, None, None] * I6[None])
            rhs = rhs * free[:, None]

            Sd = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
            dxc = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(C, 6)
            dxc = dxc * free[:, None]

            # back-substitute landmarks: dxp = Hpp^-1 (-gp - sum_e G_e^T dxc)
            back = jnp.zeros((P, 3), dtype).at[e_pt].add(
                jnp.einsum("eij,ei->ej", G_e, dxc[e_cam]))
            dxp = jnp.einsum("pij,pj->pi", Hpp_inv, -gp - back)
            return dxc, dxp

        def body(_, state):
            R, t, p, lam, nu = state
            dxc, dxp = build_and_solve(R, t, p, lam)
            dR, dt = jax.vmap(exp_se3)(dxc)
            Rn, tn = jax.vmap(se3_compose)(dR, dt, R, t)
            pn = p + dxp
            f0 = total_cost(R, t, p)
            f1 = total_cost(Rn, tn, pn)
            ok = (f1 < f0) & jnp.isfinite(f1)
            R = jnp.where(ok, Rn, R)
            t = jnp.where(ok, tn, t)
            p = jnp.where(ok, pn, p)
            lam = jnp.where(ok, lam / 3.0, lam * 4.0)
            return R, t, p, lam, nu

        lam0 = jnp.asarray(1e-4, dtype)
        R, t, p, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (R0, t0, p0, lam0, jnp.asarray(2.0, dtype)))
        return R, t, p

    active = e_valid
    R1, t1, p1 = lm_phase(cam_R, cam_t, pts, active, jnp.asarray(True), its1)
    r1, z1 = edge_res(R1, t1, p1)
    chi2_1 = chi2_of(r1)
    active2 = active & (chi2_1 <= delta2) & (z1 > 0)
    R2, t2, p2 = lm_phase(R1, t1, p1, active2, jnp.asarray(False), its2)
    r2, z2 = edge_res(R2, t2, p2)
    chi2_2 = chi2_of(r2)
    outlier = e_valid & ((chi2_2 > delta2) | (z2 <= 0))
    return R2, t2, p2, outlier
