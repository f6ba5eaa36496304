"""Batched / sharded front-end (OrbFrontend.frame_step_batch).

The frame batch is the data-parallel mesh axis (SURVEY.md §2.4 TPU scope):
results must match the single-frame fused path bit-exactly, with or without
a NamedSharding over the virtual 8-device CPU mesh from conftest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops.frontend import OrbFrontend


@pytest.fixture(scope="module")
def setup():
    seq = make_stereo_sequence(seed=9, n_frames=8, h=120, w=160, n_points=300)
    fe = OrbFrontend(120, 160, n_levels=3, scale_factor=1.2, threshold=20,
                     tile_h=12, tile_w=12)
    return seq, fe


def test_batch_matches_single(setup):
    seq, fe = setup
    B = 4
    lefts = np.stack(seq.lefts[:B])
    rights = np.stack(seq.rights[:B])
    bf, mz = float(seq.bf), float(seq.baseline)
    L, R, u_r, depth, dist = fe.frame_step_batch(lefts, rights, bf, mz)
    for i in range(B):
        Li, Ri, u_i, d_i, dist_i = fe.frame_step(seq.lefts[i], seq.rights[i],
                                                 bf, mz)
        assert np.array_equal(np.asarray(L.desc[i]), np.asarray(Li.desc))
        assert np.array_equal(np.asarray(L.valid[i]), np.asarray(Li.valid))
        assert np.allclose(np.asarray(u_r[i]), np.asarray(u_i), atol=1e-4)
        assert np.allclose(np.asarray(depth[i]), np.asarray(d_i), atol=1e-4)


def test_batch_sharded_over_mesh(setup):
    seq, fe = setup
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), ("data",))
    B = 8
    lefts = np.stack([seq.lefts[i % len(seq.lefts)] for i in range(B)])
    rights = np.stack([seq.rights[i % len(seq.rights)] for i in range(B)])
    shard = NamedSharding(mesh, P("data"))
    lefts_s = jax.device_put(jnp.asarray(lefts), shard)
    rights_s = jax.device_put(jnp.asarray(rights), shard)
    L, R, u_r, depth, dist = fe.frame_step_batch(
        lefts_s, rights_s, float(seq.bf), float(seq.baseline))
    jax.block_until_ready(depth)
    # parity with the unsharded batch
    L2, _, u2, d2, _ = fe.frame_step_batch(lefts, rights, float(seq.bf),
                                           float(seq.baseline))
    assert np.array_equal(np.asarray(L.desc), np.asarray(L2.desc))
    assert np.allclose(np.asarray(depth), np.asarray(d2), atol=1e-4)
    assert int(np.asarray(L.valid).sum()) > 100

def test_batch_sharded_pallas_kernels(setup):
    """Sharding x Pallas: the PRODUCTION kernel path (FAST + descriptor +
    stereo Pallas kernels, interpret mode on CPU) must run and agree with
    the XLA path's stereo geometry under a NamedSharding over the mesh.
    Pins what the multichip dryrun now exercises (__graft_entry__)."""
    seq, fe = setup
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    fe_p = OrbFrontend(120, 160, n_levels=3, scale_factor=1.2, threshold=20,
                       tile_h=12, tile_w=12, use_pallas=True,
                       use_pallas_desc=True, use_pallas_stereo=True)
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("data",))
    B = 8
    lefts = np.stack([seq.lefts[i % len(seq.lefts)] for i in range(B)])
    rights = np.stack([seq.rights[i % len(seq.rights)] for i in range(B)])
    shard = NamedSharding(mesh, P("data"))
    lefts_s = jax.device_put(jnp.asarray(lefts), shard)
    rights_s = jax.device_put(jnp.asarray(rights), shard)
    L, R, u_r, depth, dist = fe_p.frame_step_batch(
        lefts_s, rights_s, float(seq.bf), float(seq.baseline))
    jax.block_until_ready(depth)
    # XLA reference path, unsharded
    L2, _, u2, d2, _ = setup[1].frame_step_batch(
        lefts, rights, float(seq.bf), float(seq.baseline))
    # FAST/NMS selection is bit-exact across paths
    assert np.array_equal(np.asarray(L.valid), np.asarray(L2.valid))
    # stereo costs are bit-identical across paths; depths must agree except
    # where the (measured, bounded) descriptor drift flips a coarse match
    v = np.asarray(L.valid) & np.asarray(L2.valid)
    close = np.isclose(np.asarray(depth)[v], np.asarray(d2)[v], atol=1e-3)
    assert close.mean() > 0.9, close.mean()
    assert int(np.asarray(L.valid).sum()) > 100
