"""Distributed bundle adjustment: landmark-sharded Schur complement.

The reference has no distributed capability (SURVEY.md §2.4); this module is
the BASELINE.json north-star addition: landmarks and their edges are sharded
across a `jax.sharding.Mesh` axis, each device reduces its landmark blocks
locally, and only the small reduced camera system (C x C x 6 x 6 + rhs) is
`psum`-ed over ICI.  Cameras are replicated; back-substitution of landmark
updates is fully local to each shard.

Sharding contract (host side prepares this):
- points are partitioned into `n_shards` contiguous blocks;
- every edge lives on the shard of its point (edges of one landmark never
  span shards), so Hpp / Hpp^-1 / dxp need no communication;
- camera indices are global and replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.lie import exp_se3, se3_compose
from ..core.local_ba import (_edges_jacobians, _edges_project, inv3x3,
                             CHI2_MONO, CHI2_STEREO)


def _shard_body(cam_R, cam_t, fixed_f, pts, e_cam, e_pt_local, obs, comp,
                delta2, inv_sigma2, e_valid, pt_edges_local,
                fx, fy, cx, cy, bf, n_iters, axis):
    with jax.default_matmul_precision("highest"):
        return _shard_body_impl(cam_R, cam_t, fixed_f, pts, e_cam,
                                e_pt_local, obs, comp, delta2, inv_sigma2,
                                e_valid, pt_edges_local, fx, fy, cx, cy, bf,
                                n_iters, axis)


def _shard_body_impl(cam_R, cam_t, fixed_f, pts, e_cam, e_pt_local, obs, comp,
                     delta2, inv_sigma2, e_valid, pt_edges_local,
                     fx, fy, cx, cy, bf, n_iters, axis):
    """Per-shard LM loop body (runs under shard_map).

    pts / edges are this shard's slice; e_pt_local indexes the local point
    slice; the (C*6, C*6) reduced system is psum-ed across `axis`.
    """
    C = cam_R.shape[0]
    Pn = pts.shape[0]
    dtype = pts.dtype

    def edge_res(R_all, t_all, p_all):
        return _edges_project(R_all[e_cam], t_all[e_cam],
                              p_all[e_pt_local], obs, fx, fy, cx, cy, bf)

    def edge_jacobians(R_all, t_all, p_all):
        return _edges_jacobians(R_all[e_cam], t_all[e_cam],
                                p_all[e_pt_local], fx, fy, cx, cy, bf)

    def chi2_of(r):
        return jnp.sum(r * r * comp, axis=1) * inv_sigma2

    def cost_of(r):
        local = jnp.sum(jnp.where(e_valid, chi2_of(r), 0.0))
        return jax.lax.psum(local, axis)

    # scatter-free segment sums: `.at[].add` with heavily-colliding indices
    # (every edge of a camera collides) lowers to slow serialized scatters
    # on TPU; a one-hot contraction rides the MXU instead, and per-point
    # reductions use the pt_edges gather lists (edges of one point are
    # already grouped by the host partitioner).
    onehot_c = jax.nn.one_hot(e_cam, C, dtype=dtype)          # (E, C)
    pe = pt_edges_local
    pe_ok = pe >= 0
    pe_safe = jnp.where(pe_ok, pe, 0)

    def seg_cam(blocks):
        """(E, ...) -> (C, ...) sum grouped by edge camera, via MXU."""
        flat = blocks.reshape(blocks.shape[0], -1)
        return jnp.einsum("ec,ef->cf", onehot_c, flat,
                          ).reshape((C,) + blocks.shape[1:])

    def seg_pt(values):
        """(E, ...) -> (Pn, ...) sum grouped by point, via pt_edges gather."""
        g = values[pe_safe]
        mask = pe_ok.reshape(pe_ok.shape + (1,) * (g.ndim - 2))
        return jnp.sum(g * mask, axis=1)

    def body(_, state):
        R, t, p, lam = state
        r, _ = edge_res(R, t, p)
        Jc, Jp = edge_jacobians(R, t, p)
        w = jnp.where(e_valid, inv_sigma2, 0.0)
        Jc = Jc * comp[:, :, None] * (1.0 - fixed_f[e_cam])[:, None, None]
        Jp = Jp * comp[:, :, None]
        rm = r * comp

        Hcc_e = jnp.einsum("eij,eik,e->ejk", Jc, Jc, w)
        Hpp_e = jnp.einsum("eij,eik,e->ejk", Jp, Jp, w)
        G_e = jnp.einsum("eij,eik,e->ejk", Jc, Jp, w)
        gc_e = jnp.einsum("eij,ei,e->ej", Jc, rm, w)
        gp_e = jnp.einsum("eij,ei,e->ej", Jp, rm, w)

        Hcc = seg_cam(Hcc_e)
        gc = seg_cam(gc_e)
        Hpp = seg_pt(Hpp_e)
        gp = seg_pt(gp_e)

        I6 = jnp.eye(6, dtype=dtype)
        I3 = jnp.eye(3, dtype=dtype)
        Hpp = Hpp + lam * I3[None]
        Hpp_inv = inv3x3(Hpp)
        K_e = jnp.einsum("eij,ejk->eik", G_e, Hpp_inv[e_pt_local])

        # off-diagonal Schur blocks S[c1,c2] = -sum_p K(c1,p) G(c2,p)^T:
        # bucket each point's K/G rows by camera with a small per-point
        # one-hot (deg x C), then contract over points on the MXU — no
        # (C+1)^2-bucket scatter
        Kp = K_e[pe_safe] * pe_ok[..., None, None]            # (P, D, 6, 3)
        Gp = G_e[pe_safe] * pe_ok[..., None, None]
        camp = jnp.where(pe_ok, e_cam[pe_safe], 0)
        A = jax.nn.one_hot(camp, C, dtype=dtype) * pe_ok[..., None]  # (P, D, C)
        T = jnp.einsum("pdc,pdij->pcij", A, Kp)               # (P, C, 6, 3)
        U = jnp.einsum("pdc,pdij->pcij", A, Gp)
        S = -jnp.einsum("pcij,pCkj->cCik", T, U)
        rhs = -gc + seg_cam(jnp.einsum("eij,ej->ei", K_e, gp[e_pt_local]))

        # ---- the one collective: reduce the camera system over shards ----
        S = jax.lax.psum(S, axis)
        rhs = jax.lax.psum(rhs, axis)
        Hcc = jax.lax.psum(Hcc, axis)

        S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc + lam * I6[None])
        free = 1.0 - fixed_f
        S = S * free[:, None, None, None] * free[None, :, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(
            fixed_f[:, None, None] * I6[None])
        rhs = rhs * free[:, None]

        Sd = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        dxc = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(C, 6)
        dxc = dxc * free[:, None]

        back = seg_pt(jnp.einsum("eij,ei->ej", G_e, dxc[e_cam]))
        dxp = jnp.einsum("pij,pj->pi", Hpp_inv, -gp - back)

        dR, dt = jax.vmap(exp_se3)(dxc)
        Rn, tn = jax.vmap(se3_compose)(dR, dt, R, t)
        pn = p + dxp
        f0 = cost_of(r)  # same state the residual was built from
        r1, _ = edge_res(Rn, tn, pn)
        f1 = cost_of(r1)
        ok = (f1 < f0) & jnp.isfinite(f1)
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        p = jnp.where(ok, pn, p)
        lam = jnp.where(ok, lam / 3.0, lam * 4.0)
        return R, t, p, lam

    lam0 = jnp.asarray(1e-4, dtype)
    R, t, p, _ = jax.lax.fori_loop(0, n_iters, body,
                                   (cam_R, cam_t, pts, lam0))
    return R, t, p


def make_dist_ba(mesh: Mesh, axis: str = "data", n_iters: int = 10):
    """Returns a jitted distributed BA step over `mesh`.

    Inputs (see shard contract above): cameras replicated, point/edge arrays
    sharded on their leading axis.
    """
    from jax import shard_map

    repl = P()
    shard = P(axis)

    @partial(jax.jit, static_argnames=())
    def step(cam_R, cam_t, fixed_f, pts, e_cam, e_pt_local, obs, comp,
             delta2, inv_sigma2, e_valid, pt_edges_local,
             fx, fy, cx, cy, bf):
        fn = shard_map(
            partial(_shard_body, fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
                    n_iters=n_iters, axis=axis),
            mesh=mesh,
            in_specs=(repl, repl, repl, shard, shard, shard, shard, shard,
                      shard, shard, shard, shard),
            out_specs=(repl, repl, shard),
            check_vma=False,
        )
        return fn(cam_R, cam_t, fixed_f, pts, e_cam, e_pt_local, obs, comp,
                  delta2, inv_sigma2, e_valid, pt_edges_local)

    return step


def partition_problem(n_shards, pts, e_cam, e_pt, obs, is_stereo, inv_sigma2,
                      e_valid):
    """Host-side partitioner: group edges by point, pad each shard equally.

    Returns arrays shaped (n_shards * per_shard, ...) ready for device_put
    with a sharded leading axis, plus per-shard local point indexing.
    """
    P_total = pts.shape[0]
    per_pts = -(-P_total // n_shards)
    P_pad = per_pts * n_shards
    pts_p = np.zeros((P_pad, 3), pts.dtype)
    pts_p[:P_total] = pts

    # assign point p to shard p // per_pts; edge follows its point
    shard_of_edge = e_pt // per_pts
    counts = np.bincount(shard_of_edge, minlength=n_shards)
    per_e = int(counts.max()) if len(e_cam) else 1
    E_pad = per_e * n_shards
    e_cam_p = np.zeros(E_pad, np.int32)
    e_ptl_p = np.zeros(E_pad, np.int32)
    obs_p = np.zeros((E_pad, 3), np.float32)
    comp_p = np.zeros((E_pad, 3), np.float32)
    delta2_p = np.full(E_pad, CHI2_MONO, np.float32)
    inv_s2_p = np.ones(E_pad, np.float32)
    valid_p = np.zeros(E_pad, bool)

    # per-shard edge fill + per-point (local) edge lists
    max_deg = 1
    if len(e_cam):
        max_deg = int(np.bincount(e_pt, minlength=P_total).max())
    pt_edges = np.full((P_pad, max_deg), -1, np.int32)
    fill_e = np.zeros(n_shards, np.int64)
    fill_p = np.zeros(P_pad, np.int64)
    for e in range(len(e_cam)):
        s = shard_of_edge[e]
        pos = int(s * per_e + fill_e[s])  # global position, shard-contiguous
        fill_e[s] += 1
        e_cam_p[pos] = e_cam[e]
        e_ptl_p[pos] = e_pt[e] % per_pts  # local index within the shard
        obs_p[pos] = obs[e]
        comp_p[pos] = (1.0, 1.0, 1.0 if is_stereo[e] else 0.0)
        delta2_p[pos] = CHI2_STEREO if is_stereo[e] else CHI2_MONO
        inv_s2_p[pos] = inv_sigma2[e]
        valid_p[pos] = e_valid[e]
        p = e_pt[e]
        pt_edges[p, fill_p[p]] = pos % per_e  # local edge index within shard
        fill_p[p] += 1
    return (pts_p, e_cam_p, e_ptl_p, obs_p, comp_p, delta2_p, inv_s2_p,
            valid_p, pt_edges, per_pts, per_e)
