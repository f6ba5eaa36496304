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


def _edges_project(Rg, tg, pg, ob, fx, fy, cx, cy, bf):
    """Batched `_edge_residual` at (xi, dp) = 0: plain projection, no
    exp/compose chain.  Rg (E,3,3), tg/pg/ob (E,3) -> (r (E,3), z (E,))."""
    pc = jnp.einsum("eij,ej->ei", Rg, pg) + tg
    z = jnp.maximum(pc[:, 2], 1e-6)
    invz = 1.0 / z
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    ur = u - bf * invz
    return jnp.stack([u, v, ur], axis=1) - ob, pc[:, 2]


def inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate / det).

    jnp.linalg.inv lowers to batched LU on TPU, which is far slower than
    the ~40-flop cofactor formula for the (P, 3, 3) landmark Hessian
    blocks.  M must be well-conditioned (the LM damping guarantees it)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C_ = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I_ = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    rows = jnp.stack([
        jnp.stack([A, B, C_], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I_], axis=-1),
    ], axis=-2)
    return rows * inv_det[..., None, None]


def _edges_jacobians(Rg, tg, pg, fx, fy, cx, cy, bf):
    """Closed-form (Jc (E,3,6), Jp (E,3,3)) of `_edge_residual` at zero.

    With q = R pw + t the camera update acts as pc(xi) = exp(phi) q +
    J_l(phi) rho, so at xi = 0: dpc/drho = I, dpc/dphi = -hat(q); the
    point update gives dpc/ddp = R.  Projection rows (z clamped like the
    residual, zero slope where the clamp is active):
      du/dpc  = [fx/z, 0,    -fx x / z^2]
      dv/dpc  = [0,    fy/z, -fy y / z^2]
      dur/dpc = [fx/z, 0,    (bf - fx x) / z^2]
    Replaces per-edge jacfwd through the exp/compose chain (9 forward
    tangents of transcendental-heavy code) with a few vector ops; parity
    vs jacfwd is unit-tested (tests/test_local_ba.py)."""
    E = Rg.shape[0]
    dtype = Rg.dtype
    q = jnp.einsum("eij,ej->ei", Rg, pg) + tg
    x, y, zraw = q[:, 0], q[:, 1], q[:, 2]
    z = jnp.maximum(zraw, 1e-6)
    # jnp.maximum's JVP sends the tangent to the larger branch (ties -> x)
    zslope = (zraw >= 1e-6).astype(dtype)
    invz = 1.0 / z
    invz2 = invz * invz * zslope
    zero = jnp.zeros(E, dtype)
    # dproj/dpc (E, 3, 3)
    Pj = jnp.stack([
        jnp.stack([fx * invz, zero, -fx * x * invz2], axis=1),
        jnp.stack([zero, fy * invz, -fy * y * invz2], axis=1),
        jnp.stack([fx * invz, zero, (bf - fx * x) * invz2], axis=1),
    ], axis=1)
    # dpc/dxi = [I | -hat(q)]  (E, 3, 6)
    hatq = jnp.zeros((E, 3, 3), dtype)
    hatq = hatq.at[:, 0, 1].set(-q[:, 2]).at[:, 0, 2].set(q[:, 1])
    hatq = hatq.at[:, 1, 0].set(q[:, 2]).at[:, 1, 2].set(-q[:, 0])
    hatq = hatq.at[:, 2, 0].set(-q[:, 1]).at[:, 2, 1].set(q[:, 0])
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (E, 3, 3))
    dpc_dxi = jnp.concatenate([I3, -hatq], axis=2)
    Jc = jnp.einsum("eij,ejk->eik", Pj, dpc_dxi)
    Jp = jnp.einsum("eij,ejk->eik", Pj, Rg)
    return Jc, Jp


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
              fx, fy, cx, cy, bf, its1: int = 5, its2: int = 10,
              psum_axis=None):
    """Sparse LM with landmark Schur complement.

    Shapes: cam_* (C, ...), pts (P, 3), edges (E, ...), pt_edges (P, D)
    indices into the edge list (-1 = pad).  Returns
    (cam_R', cam_t', pts', outlier (E,) bool).

    psum_axis: when set, this body is running under shard_map with points
    and edges sharded on that mesh axis (cameras replicated); the reduced
    camera system (S, rhs, Hcc) and the LM accept-test costs are psum-ed —
    the ONLY collectives — and everything per-landmark stays local to its
    shard (parallel/dist_ba.py owns the host-side partitioning).  The
    Huber phase-1 / outlier-drop / phase-2 semantics are identical on one
    device and on a mesh because every shard sees the same reduced system
    and makes the same lambda/accept decisions.
    """
    C = cam_R.shape[0]
    P = pts.shape[0]
    E = e_cam.shape[0]
    D = pt_edges.shape[1]
    dtype = pts.dtype

    def allreduce(x):
        return jax.lax.psum(x, psum_axis) if psum_axis is not None else x

    comp = jnp.stack([jnp.ones(E), jnp.ones(E),
                      is_stereo.astype(dtype)], axis=1)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    zero6 = jnp.zeros(6, dtype)
    zero3 = jnp.zeros(3, dtype)

    def edge_res(R_all, t_all, p_all):
        return _edges_project(R_all[e_cam], t_all[e_cam], p_all[e_pt], obs,
                              fx, fy, cx, cy, bf)

    def edge_jacobians(R_all, t_all, p_all):
        return _edges_jacobians(R_all[e_cam], t_all[e_cam], p_all[e_pt],
                                fx, fy, cx, cy, bf)

    def chi2_of(r):
        return jnp.sum(r * r * comp, axis=1) * inv_sigma2

    def robust_cost(chi2, use_huber):
        d = jnp.sqrt(delta2)
        e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        hub = jnp.where(chi2 <= delta2, chi2, 2.0 * d * e - delta2)
        return jnp.where(use_huber, hub, chi2)

    fixed_f = cam_fixed.astype(dtype)

    # scatter-free segment sums (see parallel/dist_ba.py): one-hot MXU
    # contraction per camera, pt_edges gather lists per point
    onehot_c = jax.nn.one_hot(e_cam, C, dtype=dtype)          # (E, C)
    pe = pt_edges
    pe_ok = pe >= 0
    pe_safe = jnp.where(pe_ok, pe, 0)

    def seg_cam(blocks):
        flat = blocks.reshape(blocks.shape[0], -1)
        return jnp.einsum("ec,ef->cf", onehot_c, flat,
                          ).reshape((C,) + blocks.shape[1:])

    def seg_pt(values):
        g = values[pe_safe]
        mask = pe_ok.reshape(pe_ok.shape + (1,) * (g.ndim - 2))
        return jnp.sum(g * mask, axis=1)

    def lm_phase(R0, t0, p0, active, use_huber, n_iters):
        def cost_of(r):
            return allreduce(jnp.sum(
                jnp.where(active, robust_cost(chi2_of(r), use_huber), 0.0)))

        def build_and_solve(R, t, p, lam, r):
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

            Hcc = allreduce(seg_cam(Hcc_e))
            gc = seg_cam(gc_e)
            Hpp = seg_pt(Hpp_e)
            gp = seg_pt(gp_e)

            I6 = jnp.eye(6, dtype=dtype)
            I3 = jnp.eye(3, dtype=dtype)
            Hcc = Hcc + lam * I6[None]
            Hpp = Hpp + lam * I3[None]
            Hpp_inv = inv3x3(Hpp)

            K_e = jnp.einsum("eij,ejk->eik", G_e, Hpp_inv[e_pt])  # (E,6,3)

            # Schur pairs: bucket each point's K/G rows by camera with a
            # per-point one-hot, contract over points on the MXU
            Kp = K_e[pe_safe] * pe_ok[..., None, None]            # (P,D,6,3)
            Gp = G_e[pe_safe] * pe_ok[..., None, None]            # (P,D,6,3)
            camp = jnp.where(pe_ok, e_cam[pe_safe], 0)            # (P,D)
            A = jax.nn.one_hot(camp, C, dtype=dtype) * pe_ok[..., None]
            T = jnp.einsum("pdc,pdij->pcij", A, Kp)
            U = jnp.einsum("pdc,pdij->pcij", A, Gp)
            S = allreduce(-jnp.einsum("pcij,pCkj->cCik", T, U))
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)

            rhs = allreduce(
                -gc + seg_cam(jnp.einsum("eij,ej->ei", K_e, gp[e_pt])))

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
            back = seg_pt(jnp.einsum("eij,ei->ej", G_e, dxc[e_cam]))
            dxp = jnp.einsum("pij,pj->pi", Hpp_inv, -gp - back)
            return dxc, dxp

        def body(_, state):
            R, t, p, lam, nu = state
            r, _ = edge_res(R, t, p)
            dxc, dxp = build_and_solve(R, t, p, lam, r)
            dR, dt = jax.vmap(exp_se3)(dxc)
            Rn, tn = jax.vmap(se3_compose)(dR, dt, R, t)
            pn = p + dxp
            f0 = cost_of(r)  # same (R, t, p) the residual was built from
            r1, _ = edge_res(Rn, tn, pn)
            f1 = cost_of(r1)
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
