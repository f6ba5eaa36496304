"""Distributed BA on a virtual 8-device CPU mesh (SURVEY.md §4 multi-host
strategy: xla_force_host_platform_device_count)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jetson_slam_tpu.parallel.dist_ba import make_dist_ba, partition_problem
from tests.test_local_ba import make_ba_problem, FX, FY, CX, CY, BF


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_dist_ba_matches_single_device():
    rng = np.random.default_rng(0)
    prob = make_ba_problem(rng, n_cams=5, n_pts=64, pix_noise=0.0,
                           pose_noise=0.02, pt_noise=0.1)
    (Rs_i, ts_i, fixed, pts_i, e_cam, e_pt, obs, stereo, pt_edges,
     Rs_gt, ts_gt, pts_gt, _) = prob

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    (pts_p, e_cam_p, e_ptl_p, obs_p, comp_p, delta2_p, inv_s2_p, valid_p,
     pt_edges_p, per_pts, per_e) = partition_problem(
        n_dev, pts_i, e_cam, e_pt, obs, stereo,
        np.ones(len(e_cam), np.float32), np.ones(len(e_cam), bool))

    step = make_dist_ba(mesh, n_iters=10)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    put_s = lambda x: jax.device_put(jnp.asarray(x), shard)
    put_r = lambda x: jax.device_put(jnp.asarray(x), repl)

    R2, t2, p2 = step(
        put_r(Rs_i), put_r(ts_i), put_r(fixed.astype(np.float32)),
        put_s(pts_p), put_s(e_cam_p), put_s(e_ptl_p), put_s(obs_p),
        put_s(comp_p), put_s(delta2_p), put_s(inv_s2_p), put_s(valid_p),
        put_s(pt_edges_p), FX, FY, CX, CY, BF)
    t2 = np.asarray(t2)
    err_before = np.linalg.norm(ts_i - ts_gt, axis=1).mean()
    err_after = np.linalg.norm(t2 - ts_gt, axis=1).mean()
    assert err_after < 0.05 * err_before, (err_before, err_after)
    # fixed cam anchored
    np.testing.assert_allclose(t2[0], ts_i[0], atol=1e-7)
    # sharded points converge toward ground truth too
    p2 = np.asarray(p2)[:len(pts_gt)]
    perr_before = np.linalg.norm(pts_i - pts_gt, axis=1).mean()
    perr_after = np.median(np.linalg.norm(p2 - pts_gt, axis=1))
    assert perr_after < 0.5 * perr_before, (perr_before, perr_after)
