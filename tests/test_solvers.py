"""Tests for Sim3 solver, PnP RANSAC, pose graph, mono initializer."""
import numpy as np
import jax
import jax.numpy as jnp

from jetson_slam_tpu.core.initializer import MonoInitializer
from jetson_slam_tpu.core.pnp_solver import pnp_ransac
from jetson_slam_tpu.core.pose_graph import pose_graph_optimize
from jetson_slam_tpu.core.sim3_solver import horn_sim3, sim3_ransac
from jetson_slam_tpu.utils import lie

FX, FY, CX, CY = 300.0, 300.0, 160.0, 120.0


def test_horn_sim3_exact(rng):
    p1 = rng.normal(size=(10, 3)).astype(np.float32)
    xi = (rng.normal(size=7) * 0.3).astype(np.float32)
    s, R, t = lie.exp_sim3(jnp.asarray(xi))
    p2 = np.asarray(lie.sim3_apply(s, R, t, jnp.asarray(p1)))
    se, Re, te = horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
    np.testing.assert_allclose(float(se), float(s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Re), np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(te), np.asarray(t), atol=1e-4)


def test_sim3_ransac_with_outliers(rng):
    N = 60
    p1 = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                   rng.uniform(4, 10, N)], 1).astype(np.float32)
    xi = np.array([0.1, -0.2, 0.05, 0.02, 0.03, -0.01, 0.0], np.float32)
    s, R, t = lie.exp_sim3(jnp.asarray(xi))
    p2 = np.asarray(lie.sim3_apply(s, R, t, jnp.asarray(p1))).copy()
    out_idx = rng.choice(N, 12, replace=False)
    p2[out_idx] += rng.uniform(1, 3, (12, 3))
    cam = (FX, FY, CX, CY)
    th = 9.21 * np.ones(N, np.float32)
    se, Re, te, inl, n = sim3_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(np.ones(N, bool)),
        cam, cam, jnp.asarray(th), jnp.asarray(th),
        jax.random.PRNGKey(0), n_hyp=64, fix_scale=True)
    inl = np.asarray(inl)
    assert int(n) >= N - 15
    assert not inl[out_idx].any()
    np.testing.assert_allclose(np.asarray(te), np.asarray(t), atol=0.05)


def test_pnp_ransac_recovers_pose(rng):
    N = 80
    pw = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                   rng.uniform(4, 12, N)], 1).astype(np.float32)
    xi = (rng.normal(size=6) * 0.2).astype(np.float32)
    R, t = lie.exp_se3(jnp.asarray(xi))
    Rn, tn = np.asarray(R), np.asarray(t)
    pc = pw @ Rn.T + tn
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    uv = np.stack([u, v], 1).astype(np.float32)
    out_idx = rng.choice(N, 15, replace=False)
    uv[out_idx] += rng.uniform(20, 60, (15, 2))
    Re, te, inl, n = pnp_ransac(
        jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(np.ones(N, np.float32)),
        jnp.asarray(np.ones(N, bool)), FX, FY, CX, CY,
        jax.random.PRNGKey(1), n_hyp=256)
    assert int(n) >= 50, int(n)
    inl = np.asarray(inl)
    assert inl[out_idx].sum() <= 2
    np.testing.assert_allclose(np.asarray(te), tn, atol=0.05)


def test_pose_graph_closes_loop(rng):
    """Chain of K poses with drift; loop edge to the start corrects it."""
    K = 12
    # ground truth: camera moves along x
    ts_gt = np.zeros((K, 3), np.float32)
    ts_gt[:, 0] = np.arange(K) * 0.5
    Rs_gt = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    # drifted estimates: accumulating translation error
    ts_est = ts_gt.copy()
    drift = np.cumsum(rng.normal(0, 0.05, (K, 3)), axis=0).astype(np.float32)
    drift -= drift[0]  # the fixed gauge vertex keeps its true pose
    ts_est += drift
    Rs_est = Rs_gt.copy()
    # edges: consecutive with TRUE relative measurements + loop edge 0->K-1
    e_i, e_j, mi_R, mi_t, mi_s = [], [], [], [], []
    for a in range(K - 1):
        b = a + 1
        R_ij = Rs_gt[b] @ Rs_gt[b].T  # identity
        t_ij = ts_gt[b] - ts_gt[a]
        e_i.append(b); e_j.append(a)
        # S_ij measures vertex_i relative to vertex_j: S_i * S_j^-1
        # with R=I world->cam = (I, -c): t_iw = -c_i
        pass
    # build measurements in world->cam convention: T_iw = (I, -c_i)
    e_i, e_j, mi_R, mi_t, mi_s = [], [], [], [], []
    def Tcw(c):
        return np.eye(3, dtype=np.float32), -c
    for a in range(K - 1):
        b = a + 1
        Ri, ti = Tcw(ts_gt[b])
        Rj, tj = Tcw(ts_gt[a])
        R_ij = Ri @ Rj.T
        t_ij = ti - R_ij @ tj
        e_i.append(b); e_j.append(a)
        mi_R.append(R_ij.T); mi_t.append(-R_ij.T @ t_ij); mi_s.append(1.0)
    # loop edge between last and first with true measurement
    Ri, ti = Tcw(ts_gt[K - 1]); Rj, tj = Tcw(ts_gt[0])
    R_ij = Ri @ Rj.T; t_ij = ti - R_ij @ tj
    e_i.append(K - 1); e_j.append(0)
    mi_R.append(R_ij.T); mi_t.append(-R_ij.T @ t_ij); mi_s.append(1.0)

    cam_t_est = np.stack([-c for c in ts_est])  # t_cw = -c for R=I
    fixed = np.zeros(K, bool); fixed[0] = True
    s2, R2, t2 = pose_graph_optimize(
        jnp.asarray(np.ones(K, np.float32)), jnp.asarray(Rs_est),
        jnp.asarray(cam_t_est), jnp.asarray(fixed),
        jnp.asarray(np.array(e_i, np.int32)), jnp.asarray(np.array(e_j, np.int32)),
        jnp.asarray(np.array(mi_s, np.float32)), jnp.asarray(np.stack(mi_R)),
        jnp.asarray(np.stack(mi_t)), jnp.asarray(np.ones(len(e_i), bool)),
        n_iters=30, fix_scale=True)
    t2 = np.asarray(t2)
    err_before = np.abs(cam_t_est - (-ts_gt)).max()
    err_after = np.abs(t2 - (-ts_gt)).max()
    assert err_after < 0.02, (err_before, err_after)


def test_mono_initializer_two_views(rng):
    N = 150
    pw = np.stack([rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
                   rng.uniform(5, 15, N)], 1)
    # view 1 at origin; view 2 translated + small rotation
    xi = np.array([0.3, 0.05, 0.02, 0.02, -0.03, 0.01], np.float32)
    R21, t21 = lie.exp_se3(jnp.asarray(xi))
    R21, t21 = np.asarray(R21), np.asarray(t21)
    pc2 = pw @ R21.T + t21
    u1 = FX * pw[:, 0] / pw[:, 2] + CX
    v1 = FY * pw[:, 1] / pw[:, 2] + CY
    u2 = FX * pc2[:, 0] / pc2[:, 2] + CX
    v2 = FY * pc2[:, 1] / pc2[:, 2] + CY
    kp1 = np.stack([u1, v1], 1) + rng.normal(0, 0.3, (N, 2))
    kp2 = np.stack([u2, v2], 1) + rng.normal(0, 0.3, (N, 2))
    init = MonoInitializer(FX, FY, CX, CY)
    ok, R, t, X, good = init.initialize(kp1.astype(np.float32),
                                        kp2.astype(np.float32),
                                        np.ones(N, bool))
    assert ok
    assert good.sum() > 0.6 * N
    # direction of translation (scale is free in mono)
    t_dir = t / np.linalg.norm(t)
    t_gt = t21 / np.linalg.norm(t21)
    assert np.dot(t_dir, t_gt) > 0.99, (t_dir, t_gt)
    np.testing.assert_allclose(R, R21, atol=0.02)


def test_sim3_optimization_refines_noisy_ransac_estimate():
    """sim3_optimization (Optimizer::OptimizeSim3 parity): starting from a
    perturbed Sim3, the bidirectional-reprojection LM recovers the true
    transform and flags gross outliers."""
    import jax.numpy as jnp
    from jetson_slam_tpu.core.optimizer import sim3_optimization
    from jetson_slam_tpu.utils.lie import exp_so3

    rng = np.random.default_rng(4)
    N = 60
    fx = fy = 320.0
    cx, cy = 160.0, 120.0
    # true S12: scale 1 (stereo), modest rotation + translation
    w = np.array([0.03, -0.05, 0.02], np.float32)
    R12 = np.asarray(exp_so3(jnp.asarray(w)))
    t12 = np.array([0.3, -0.1, 0.2], np.float32)
    P2 = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                   rng.uniform(4, 10, N)], 1).astype(np.float32)
    P1 = P2 @ R12.T + t12

    def proj(P):
        return np.stack([fx * P[:, 0] / P[:, 2] + cx,
                         fy * P[:, 1] / P[:, 2] + cy], 1).astype(np.float32)

    obs1 = proj(P1)
    obs2 = proj(P2)
    # corrupt 6 observations
    obs1[:6] += 40.0
    # perturbed start
    R0 = np.asarray(exp_so3(jnp.asarray(w + 0.02)))
    t0 = t12 + np.array([0.05, 0.02, -0.04], np.float32)
    inv = np.ones(N, np.float32)
    s, R, t, inlier, n = sim3_optimization(
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(obs1),
        jnp.asarray(obs2), jnp.asarray(inv), jnp.asarray(inv),
        jnp.asarray(np.ones(N, bool)), jnp.float32(1.0),
        jnp.asarray(R0), jnp.asarray(t0), fx, fy, cx, cy, fix_scale=True)
    assert float(s) == 1.0
    assert int(n) >= N - 6
    assert not np.asarray(inlier)[:6].any()
    assert np.abs(np.asarray(R) - R12).max() < 1e-3
    assert np.abs(np.asarray(t) - t12).max() < 5e-3
