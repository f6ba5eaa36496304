"""Tests for the JAX pose optimizer (PoseOptimization semantics)."""
import numpy as np
import jax.numpy as jnp

from jetson_slam_tpu.core.optimizer import pose_optimization
from jetson_slam_tpu.utils import lie


FX, FY, CX, CY, BF = 260.0, 260.0, 160.0, 120.0, 52.0


def _make_problem(rng, n=120, stereo_frac=0.7, noise=0.3, outlier_frac=0.0):
    pts = np.stack([
        rng.uniform(-6, 6, n), rng.uniform(-4, 4, n), rng.uniform(4, 15, n)
    ], axis=1).astype(np.float32)
    xi_true = (rng.normal(size=6) * 0.1).astype(np.float32)
    R, t = lie.exp_se3(jnp.asarray(xi_true))
    R = np.asarray(R); t = np.asarray(t)
    pc = pts @ R.T + t
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    ur = u - BF / pc[:, 2]
    u += rng.normal(size=n) * noise
    v += rng.normal(size=n) * noise
    ur += rng.normal(size=n) * noise
    is_stereo = rng.random(n) < stereo_frac
    ur = np.where(is_stereo, ur, -1.0)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    u[out_idx] += rng.uniform(30, 80, n_out) * rng.choice([-1, 1], n_out)
    return pts, u, v, ur, (R, t), out_idx


def test_pose_optimization_converges_from_perturbed_start():
    rng = np.random.default_rng(0)
    pts, u, v, ur, (R_true, t_true), _ = _make_problem(rng, noise=0.0)
    xi0 = (rng.normal(size=6) * 0.05).astype(np.float32)
    dR, dt = lie.exp_se3(jnp.asarray(xi0))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_true), jnp.asarray(t_true))
    n = len(pts)
    Rr, tr, inlier, n_in = pose_optimization(
        R0, t0, jnp.asarray(pts), jnp.asarray(np.stack([u, v], 1).astype(np.float32)),
        jnp.asarray(ur.astype(np.float32)), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool), FX, FY, CX, CY, BF)
    np.testing.assert_allclose(np.asarray(Rr), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tr), t_true, atol=5e-3)
    assert int(n_in) == n


def test_pose_optimization_rejects_outliers():
    rng = np.random.default_rng(1)
    pts, u, v, ur, (R_true, t_true), out_idx = _make_problem(
        rng, noise=0.2, outlier_frac=0.15)
    n = len(pts)
    Rr, tr, inlier, n_in = pose_optimization(
        jnp.asarray(R_true), jnp.asarray(t_true), jnp.asarray(pts),
        jnp.asarray(np.stack([u, v], 1).astype(np.float32)),
        jnp.asarray(ur.astype(np.float32)), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool), FX, FY, CX, CY, BF)
    inlier = np.asarray(inlier)
    assert not inlier[out_idx].any(), "gross outliers must be classified out"
    assert inlier.sum() > 0.7 * n
    np.testing.assert_allclose(np.asarray(tr), t_true, atol=2e-2)


def test_pose_optimization_respects_padding_mask():
    rng = np.random.default_rng(2)
    pts, u, v, ur, (R_true, t_true), _ = _make_problem(rng, n=64, noise=0.0)
    # pad with garbage entries that must not affect the solution
    pad = 32
    pts_p = np.concatenate([pts, rng.normal(size=(pad, 3)).astype(np.float32)])
    u_p = np.concatenate([u, rng.uniform(0, 320, pad)])
    v_p = np.concatenate([v, rng.uniform(0, 240, pad)])
    ur_p = np.concatenate([ur, -np.ones(pad)])
    valid = np.concatenate([np.ones(64, bool), np.zeros(pad, bool)])
    Rr, tr, inlier, n_in = pose_optimization(
        jnp.asarray(R_true), jnp.asarray(t_true), jnp.asarray(pts_p),
        jnp.asarray(np.stack([u_p, v_p], 1).astype(np.float32)),
        jnp.asarray(ur_p.astype(np.float32)), jnp.ones(96, jnp.float32),
        jnp.asarray(valid), FX, FY, CX, CY, BF)
    assert not np.asarray(inlier)[64:].any()
    np.testing.assert_allclose(np.asarray(tr), t_true, atol=5e-3)
