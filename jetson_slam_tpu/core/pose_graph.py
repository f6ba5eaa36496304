"""Sim(3) pose-graph optimization (essential graph).

Replacement for Optimizer::OptimizeEssentialGraph (src/Optimizer.cpp:786-1049
on g2o sim3 types): vertices are Sim3 world->camera poses (scale fixed to 1
for stereo/RGB-D, Optimizer.cpp:823 `_fix_scale`), edges carry relative Sim3
measurements with identity information, solved by LM with `jacfwd` Jacobians
and a dense normal-equation solve (the graph is small: #KFs x 7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.lie import (exp_sim3, log_sim3, sim3_compose, sim3_inverse)


def _edge_error(xi_i, xi_j, S_i, S_j, S_meas_inv, fix_scale):
    """e = log( S_ij_meas^-1 * (exp(xi_i) S_i) * (exp(xi_j) S_j)^-1 )."""
    if fix_scale:
        xi_i = xi_i.at[6].set(0.0)
        xi_j = xi_j.at[6].set(0.0)
    dsi, dRi, dti = exp_sim3(xi_i)
    dsj, dRj, dtj = exp_sim3(xi_j)
    si, Ri, ti = sim3_compose(dsi, dRi, dti, *S_i)
    sj, Rj, tj = sim3_compose(dsj, dRj, dtj, *S_j)
    sji, Rji, tji = sim3_compose(si, Ri, ti, *sim3_inverse(sj, Rj, tj))
    e_s, e_R, e_t = sim3_compose(*S_meas_inv, sji, Rji, tji)
    return log_sim3(e_s, e_R, e_t)


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def pose_graph_optimize(s, R, t, fixed, e_i, e_j, meas_inv_s, meas_inv_R,
                        meas_inv_t, e_valid, n_iters: int = 20,
                        fix_scale: bool = True):
    # full f32 matmuls for the normal equations (TPU defaults to bf16 passes)
    with jax.default_matmul_precision("highest"):
        return _pose_graph_optimize(s, R, t, fixed, e_i, e_j, meas_inv_s,
                                    meas_inv_R, meas_inv_t, e_valid,
                                    n_iters, fix_scale)


def _pose_graph_optimize(s, R, t, fixed, e_i, e_j, meas_inv_s, meas_inv_R,
                         meas_inv_t, e_valid, n_iters: int = 20,
                         fix_scale: bool = True):
    """Optimize Sim3 vertices against relative-pose edges.

    s (K,), R (K,3,3), t (K,3): initial world->camera Sim3 per keyframe.
    fixed (K,) bool.  e_i/e_j (E,) endpoint indices; meas_inv_* the
    precomputed inverse measurements S_ij^-1.  Returns optimized (s, R, t).
    """
    K = s.shape[0]
    E = e_i.shape[0]
    dtype = t.dtype
    zero7 = jnp.zeros(7, dtype)
    free = (~fixed).astype(dtype)

    def residuals(s_all, R_all, t_all):
        def one(i, j, ms, mR, mt):
            return _edge_error(zero7, zero7,
                               (s_all[i], R_all[i], t_all[i]),
                               (s_all[j], R_all[j], t_all[j]),
                               (ms, mR, mt), fix_scale)
        return jax.vmap(one)(e_i, e_j, meas_inv_s, meas_inv_R, meas_inv_t)

    def jacobians(s_all, R_all, t_all):
        def one(i, j, ms, mR, mt):
            fi = lambda xi: _edge_error(xi, zero7,
                                        (s_all[i], R_all[i], t_all[i]),
                                        (s_all[j], R_all[j], t_all[j]),
                                        (ms, mR, mt), fix_scale)
            fj = lambda xj: _edge_error(zero7, xj,
                                        (s_all[i], R_all[i], t_all[i]),
                                        (s_all[j], R_all[j], t_all[j]),
                                        (ms, mR, mt), fix_scale)
            return jax.jacfwd(fi)(zero7), jax.jacfwd(fj)(zero7)
        return jax.vmap(one)(e_i, e_j, meas_inv_s, meas_inv_R, meas_inv_t)

    w = e_valid.astype(dtype)

    def cost(state):
        s_all, R_all, t_all = state
        r = residuals(s_all, R_all, t_all)
        return jnp.sum(w * jnp.sum(r * r, axis=1))

    def body(_, carry):
        s_all, R_all, t_all, lam = carry
        r = residuals(s_all, R_all, t_all)          # (E, 7)
        Ji, Jj = jacobians(s_all, R_all, t_all)     # (E, 7, 7) each
        Ji = Ji * free[e_i][:, None, None]
        Jj = Jj * free[e_j][:, None, None]

        # dense normal equations over 7K unknowns via scatter-add of blocks
        Hii = jnp.einsum("eij,eik,e->ejk", Ji, Ji, w)
        Hjj = jnp.einsum("eij,eik,e->ejk", Jj, Jj, w)
        Hij = jnp.einsum("eij,eik,e->ejk", Ji, Jj, w)
        gi = jnp.einsum("eij,ei,e->ej", Ji, r, w)
        gj = jnp.einsum("eij,ei,e->ej", Jj, r, w)

        Hblk = jnp.zeros((K + 1, K + 1, 7, 7), dtype)
        Hblk = Hblk.at[e_i, e_i].add(Hii)
        Hblk = Hblk.at[e_j, e_j].add(Hjj)
        Hblk = Hblk.at[e_i, e_j].add(Hij)
        Hblk = Hblk.at[e_j, e_i].add(jnp.swapaxes(Hij, -1, -2))
        Hblk = Hblk[:K, :K]
        g = jnp.zeros((K + 1, 7), dtype).at[e_i].add(gi).at[e_j].add(gj)[:K]

        I7 = jnp.eye(7, dtype=dtype)
        Hblk = Hblk.at[jnp.arange(K), jnp.arange(K)].add(lam * I7[None])
        # fixed vertices: identity rows/cols
        Hblk = Hblk * free[:, None, None, None] * free[None, :, None, None]
        Hblk = Hblk.at[jnp.arange(K), jnp.arange(K)].add(
            fixed.astype(dtype)[:, None, None] * I7[None])
        g = g * free[:, None]

        Hd = Hblk.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        dx = jnp.linalg.solve(Hd, -g.reshape(-1)).reshape(K, 7)
        dx = dx * free[:, None]
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)

        ds, dR, dt = jax.vmap(exp_sim3)(dx)
        sn, Rn, tn = jax.vmap(sim3_compose)(ds, dR, dt, s_all, R_all, t_all)
        f0 = cost((s_all, R_all, t_all))
        f1 = cost((sn, Rn, tn))
        ok = (f1 < f0) & jnp.isfinite(f1)
        s_all = jnp.where(ok, sn, s_all)
        R_all = jnp.where(ok, Rn, R_all)
        t_all = jnp.where(ok, tn, t_all)
        lam = jnp.where(ok, lam / 2.0, lam * 4.0)
        return s_all, R_all, t_all, lam

    lam0 = jnp.asarray(1e-6, dtype)
    s, R, t, _ = jax.lax.fori_loop(0, n_iters, body, (s, R, t, lam0))
    return s, R, t
