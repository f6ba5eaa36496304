"""Distributed BA on a virtual 8-device CPU mesh (SURVEY.md §4 multi-host
strategy: xla_force_host_platform_device_count).

The sharded solver shares ONE implementation with the single-device
local_ba (core/local_ba._local_ba parameterized by the psum axis), so the
tests here assert behavioral parity on a NOISY problem WITH outliers —
the Huber phase-1 / chi2-drop / phase-2 semantics must survive sharding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from jetson_slam_tpu.core.local_ba import local_ba
from jetson_slam_tpu.parallel.dist_ba import DistBA
from tests.test_local_ba import make_ba_problem, FX, FY, CX, CY, BF


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_dist_ba_matches_local_on_noisy_outlier_problem():
    rng = np.random.default_rng(0)
    prob = make_ba_problem(rng, n_cams=5, n_pts=64, pix_noise=0.4,
                           pose_noise=0.06, pt_noise=0.15, outlier_frac=0.1)
    (Rs_i, ts_i, fixed, pts_i, e_cam, e_pt, obs, stereo, pt_edges,
     Rs_gt, ts_gt, pts_gt, _) = prob
    E = len(e_cam)
    inv_s2 = np.ones(E, np.float32)
    e_valid = np.ones(E, bool)

    solver = DistBA(Mesh(np.array(jax.devices()), ("data",)))
    R2, t2, p2, outlier = solver.solve(
        Rs_i, ts_i, fixed, pts_i, e_cam, e_pt, obs, stereo, inv_s2, e_valid,
        FX, FY, CX, CY, BF)

    Rl, tl, pl, outl = jax.device_get(local_ba(
        jnp.asarray(Rs_i), jnp.asarray(ts_i), jnp.asarray(fixed),
        jnp.asarray(pts_i), jnp.asarray(e_cam), jnp.asarray(e_pt),
        jnp.asarray(obs), jnp.asarray(stereo), jnp.asarray(inv_s2),
        jnp.asarray(e_valid), jnp.asarray(pt_edges),
        FX, FY, CX, CY, BF))

    # convergence toward ground truth despite noise + 10% gross outliers
    # (pixel noise 0.4 keeps the ML estimate off the exact ground truth, so
    # the gate is a solid reduction, not recovery to machine precision)
    err_before = np.linalg.norm(ts_i - ts_gt, axis=1).mean()
    err_after = np.linalg.norm(np.asarray(t2) - ts_gt, axis=1).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    np.testing.assert_allclose(t2[0], ts_i[0], atol=1e-7)  # gauge anchored

    # parity vs the single-device solver (same math, different reduction
    # order -> small float drift allowed)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(tl),
                               atol=5e-3, rtol=0)
    # outlier CLASSIFICATION parity: the Huber/chi2 two-phase gates must
    # agree on (nearly) every edge
    agree = (np.asarray(outlier) == np.asarray(outl)).mean()
    assert agree > 0.98, agree
    # the injected gross outliers must actually be caught
    assert np.asarray(outlier).sum() >= 0.05 * E


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_mapper_runs_sharded_ba_on_mesh():
    """SLAM e2e slice: the LIVE LocalMapper solves its bundle adjustment
    landmark-sharded on the mesh (VERDICT round-2 ask #3)."""
    from jetson_slam_tpu.config import SLAMConfig
    from jetson_slam_tpu.io.evaluation import ate_rmse
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.models.slam import SlamSystem

    seq = make_stereo_sequence(seed=5, n_frames=10, h=240, w=320,
                               n_points=800)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.bf = seq.bf
    cfg.camera.width = 320; cfg.camera.height = 240
    cfg.orb.n_levels = 3; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    mesh = Mesh(np.array(jax.devices()), ("data",))
    slam = SlamSystem(cfg, sensor="stereo", async_mapping=False, mesh=mesh)
    assert slam.local_mapper._dist_ba is not None
    for i in range(len(seq.lefts)):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
    ts, ps = slam.camera_trajectory()
    ate = ate_rmse(np.asarray(ts), np.asarray(ps), seq.timestamps,
                   seq.poses_twc)
    length = np.linalg.norm(
        np.diff(seq.poses_twc[:, :3, 3], axis=0), axis=1).sum()
    assert ate < 0.05 * max(length, 0.5), ate
