"""Tests for the Schur-complement local bundle adjustment."""
import numpy as np
import jax.numpy as jnp

from jetson_slam_tpu.core.local_ba import local_ba
from jetson_slam_tpu.utils import lie

FX, FY, CX, CY, BF = 260.0, 260.0, 160.0, 120.0, 52.0


def make_ba_problem(rng, n_cams=6, n_pts=80, pix_noise=0.3, pose_noise=0.02,
                    pt_noise=0.05, outlier_frac=0.0):
    pts_gt = np.stack([
        rng.uniform(-8, 8, n_pts), rng.uniform(-5, 5, n_pts),
        rng.uniform(6, 18, n_pts)], axis=1).astype(np.float32)
    cams = []
    for k in range(n_cams):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.4 * k  # translate along x
        xi[4] = 0.02 * k
        R, t = lie.exp_se3(jnp.asarray(xi))
        cams.append((np.asarray(R), np.asarray(t)))
    e_cam, e_pt, obs, stereo = [], [], [], []
    for c, (R, t) in enumerate(cams):
        pc = pts_gt @ R.T + t
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        ur = u - BF / pc[:, 2]
        vis = (pc[:, 2] > 1) & (u > 0) & (u < 320) & (v > 0) & (v < 240)
        for p in np.flatnonzero(vis):
            e_cam.append(c)
            e_pt.append(p)
            is_st = rng.random() < 0.6
            o = [u[p] + rng.normal() * pix_noise, v[p] + rng.normal() * pix_noise,
                 ur[p] + rng.normal() * pix_noise if is_st else 0.0]
            obs.append(o)
            stereo.append(is_st)
    E = len(e_cam)
    e_cam = np.array(e_cam, np.int32)
    e_pt = np.array(e_pt, np.int32)
    obs = np.array(obs, np.float32)
    stereo = np.array(stereo)
    n_out = int(outlier_frac * E)
    out_idx = rng.choice(E, n_out, replace=False)
    obs[out_idx, 0] += rng.uniform(30, 90, n_out) * rng.choice([-1, 1], n_out)
    # perturb initial states (cam 0 stays fixed as gauge anchor)
    Rs = np.stack([c[0] for c in cams])
    ts = np.stack([c[1] for c in cams])
    Rs_i, ts_i = Rs.copy(), ts.copy()
    for k in range(1, n_cams):
        xi = (rng.normal(size=6) * pose_noise).astype(np.float32)
        dR, dt = lie.exp_se3(jnp.asarray(xi))
        Rn, tn = lie.se3_compose(dR, dt, jnp.asarray(Rs[k]), jnp.asarray(ts[k]))
        Rs_i[k], ts_i[k] = np.asarray(Rn), np.asarray(tn)
    pts_i = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * pt_noise

    # per-point edge lists
    D = int(np.bincount(e_pt, minlength=n_pts).max())
    pt_edges = np.full((n_pts, D), -1, np.int32)
    fill = np.zeros(n_pts, np.int32)
    for e in range(E):
        p = e_pt[e]
        pt_edges[p, fill[p]] = e
        fill[p] += 1
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    return (Rs_i, ts_i, fixed, pts_i, e_cam, e_pt, obs, stereo, pt_edges,
            Rs, ts, pts_gt, out_idx)


def _run(problem):
    (Rs_i, ts_i, fixed, pts_i, e_cam, e_pt, obs, stereo, pt_edges,
     Rs, ts, pts_gt, out_idx) = problem
    E = len(e_cam)
    inv_s2 = np.ones(E, np.float32)
    valid = np.ones(E, bool)
    return local_ba(
        jnp.asarray(Rs_i), jnp.asarray(ts_i), jnp.asarray(fixed),
        jnp.asarray(pts_i), jnp.asarray(e_cam), jnp.asarray(e_pt),
        jnp.asarray(obs), jnp.asarray(stereo), jnp.asarray(inv_s2),
        jnp.asarray(valid), jnp.asarray(pt_edges),
        FX, FY, CX, CY, BF)


def test_local_ba_reduces_error():
    rng = np.random.default_rng(0)
    # initial point perturbation (0.6 m) well above the ~0.1-0.5 m stereo
    # triangulation noise floor at these depths with 0.1 px noise
    problem = make_ba_problem(rng, pix_noise=0.1, pt_noise=0.6, pose_noise=0.03)
    Rs_gt, ts_gt, pts_gt = problem[9], problem[10], problem[11]
    R2, t2, p2, outlier = _run(problem)
    R2, t2, p2 = np.asarray(R2), np.asarray(t2), np.asarray(p2)
    err_t_before = np.linalg.norm(problem[1] - ts_gt, axis=1).mean()
    err_t_after = np.linalg.norm(t2 - ts_gt, axis=1).mean()
    err_p_before = np.linalg.norm(problem[3] - pts_gt, axis=1).mean()
    err_p_after = np.median(np.linalg.norm(p2 - pts_gt, axis=1))
    assert err_t_after < 0.5 * err_t_before, (err_t_before, err_t_after)
    assert err_p_after < 0.5 * err_p_before, (err_p_before, err_p_after)
    # fixed camera must not move
    np.testing.assert_allclose(t2[0], problem[1][0], atol=1e-7)
    assert np.asarray(outlier).sum() < 0.05 * len(problem[4])


def test_local_ba_noise_free_exact():
    rng = np.random.default_rng(3)
    problem = make_ba_problem(rng, pix_noise=0.0)
    ts_gt = problem[10]
    _, t2, _, _ = _run(problem)
    err = np.linalg.norm(np.asarray(t2) - ts_gt, axis=1).mean()
    assert err < 1e-4, err


def test_local_ba_flags_outliers():
    rng = np.random.default_rng(1)
    problem = make_ba_problem(rng, outlier_frac=0.1)
    out_idx = problem[12]
    _, _, _, outlier = _run(problem)
    outlier = np.asarray(outlier)
    # most injected outliers must be flagged
    assert outlier[out_idx].mean() > 0.8, outlier[out_idx].mean()


def test_analytic_jacobians_match_jacfwd():
    """_edges_jacobians (closed form) vs jax.jacfwd through the exp/compose
    chain of _edge_residual at the linearization point."""
    import jax
    import jax.numpy as jnp
    from jetson_slam_tpu.core.local_ba import (_edge_residual,
                                               _edges_jacobians)
    from jetson_slam_tpu.utils.lie import exp_so3
    rng = np.random.default_rng(5)
    E = 64
    FX, FY, CX, CY, BF = 310.0, 305.0, 160.0, 120.0, 38.0
    Rg = np.stack([np.asarray(exp_so3(jnp.asarray(
        rng.normal(0, 0.4, 3).astype(np.float32)))) for _ in range(E)])
    tg = rng.normal(0, 1.0, (E, 3)).astype(np.float32)
    pg = rng.normal(0, 2.0, (E, 3)).astype(np.float32)
    pg[:, 2] += 8.0  # keep points in front of the cameras
    zero6 = jnp.zeros(6); zero3 = jnp.zeros(3)

    def one(R, t, p):
        fc = lambda xi: _edge_residual(xi, zero3, R, t, p, jnp.zeros(3),
                                       FX, FY, CX, CY, BF)[0]
        fp = lambda dp: _edge_residual(zero6, dp, R, t, p, jnp.zeros(3),
                                       FX, FY, CX, CY, BF)[0]
        return jax.jacfwd(fc)(zero6), jax.jacfwd(fp)(zero3)

    Jc_ref, Jp_ref = jax.vmap(one)(jnp.asarray(Rg), jnp.asarray(tg),
                                   jnp.asarray(pg))
    Jc, Jp = _edges_jacobians(jnp.asarray(Rg), jnp.asarray(tg),
                              jnp.asarray(pg), FX, FY, CX, CY, BF)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp_ref),
                               rtol=1e-4, atol=1e-4)
