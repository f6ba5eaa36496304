"""Distributed bundle adjustment: landmark-sharded Schur complement.

The reference has no distributed capability (SURVEY.md §2.4); this module is
the BASELINE.json north-star addition: landmarks and their edges are sharded
across a `jax.sharding.Mesh` axis, each device reduces its landmark blocks
locally, and only the small reduced camera system (C x C x 6 x 6 + rhs) plus
the LM accept-test costs are `psum`-ed over ICI.  Cameras are replicated;
back-substitution of landmark updates is fully local to each shard.

The LM math itself — Huber phase 1, chi2 outlier drop, phase 2, the exact
reference semantics of Optimizer::LocalBundleAdjustment — is ONE shared
implementation (core/local_ba._local_ba) parameterized by the psum axis, so
single-device and mesh solves cannot drift apart.

Sharding contract (the host-side partitioner prepares this):
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

from ..core.local_ba import _local_ba


def _shard_body(cam_R, cam_t, cam_fixed, pts, e_cam, e_pt_local, obs,
                is_stereo, inv_sigma2, e_valid, pt_edges_local,
                fx, fy, cx, cy, bf, its1, its2, axis):
    with jax.default_matmul_precision("highest"):
        return _local_ba(cam_R, cam_t, cam_fixed, pts, e_cam, e_pt_local,
                         obs, is_stereo, inv_sigma2, e_valid, pt_edges_local,
                         fx, fy, cx, cy, bf, its1, its2, psum_axis=axis)


def make_dist_ba(mesh: Mesh, axis: str = "data", its1: int = 5,
                 its2: int = 10):
    """Returns a jitted distributed BA step over `mesh`.

    Same contract as core.local_ba.local_ba with the point/edge arrays
    sharded on their leading axis (see module docstring); returns
    (cam_R', cam_t', pts'(sharded), outlier(sharded)).
    """
    from jax import shard_map

    repl = P()
    shard = P(axis)

    @jax.jit
    def step(cam_R, cam_t, cam_fixed, pts, e_cam, e_pt_local, obs,
             is_stereo, inv_sigma2, e_valid, pt_edges_local,
             fx, fy, cx, cy, bf):
        fn = shard_map(
            partial(_shard_body, fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
                    its1=its1, its2=its2, axis=axis),
            mesh=mesh,
            in_specs=(repl, repl, repl, shard, shard, shard, shard, shard,
                      shard, shard, shard),
            out_specs=(repl, repl, shard, shard),
            check_vma=False,
        )
        return fn(cam_R, cam_t, cam_fixed, pts, e_cam, e_pt_local, obs,
                  is_stereo, inv_sigma2, e_valid, pt_edges_local)

    return step


def partition_problem(n_shards, pts, e_cam, e_pt, obs, is_stereo, inv_sigma2,
                      e_valid):
    """Host-side partitioner: group edges by point, pad each shard equally.

    Returns arrays shaped (n_shards * per_shard, ...) ready for device_put
    with a sharded leading axis, per-shard local point indexing, and the
    permutation mapping each ORIGINAL edge to its position in the sharded
    layout (for scattering per-edge outputs back).
    """
    P_total = pts.shape[0]
    per_pts = -(-P_total // n_shards)
    P_pad = per_pts * n_shards
    pts_p = np.zeros((P_pad, 3), pts.dtype)
    pts_p[:P_total] = pts

    # assign point p to shard p // per_pts; edge follows its point
    E = len(e_cam)
    shard_of_edge = e_pt // per_pts
    counts = np.bincount(shard_of_edge, minlength=n_shards)
    per_e = int(counts.max()) if E else 1
    E_pad = per_e * n_shards
    e_cam_p = np.zeros(E_pad, np.int32)
    e_ptl_p = np.zeros(E_pad, np.int32)
    obs_p = np.zeros((E_pad, 3), np.float32)
    stereo_p = np.zeros(E_pad, bool)
    inv_s2_p = np.ones(E_pad, np.float32)
    valid_p = np.zeros(E_pad, bool)
    e_perm = np.zeros(E, np.int64)

    # per-shard edge fill + per-point (local) edge lists
    max_deg = 1
    if E:
        max_deg = int(np.bincount(e_pt, minlength=P_total).max())
    pt_edges = np.full((P_pad, max_deg), -1, np.int32)
    fill_e = np.zeros(n_shards, np.int64)
    fill_p = np.zeros(P_pad, np.int64)
    for e in range(E):
        s = shard_of_edge[e]
        pos = int(s * per_e + fill_e[s])  # global position, shard-contiguous
        fill_e[s] += 1
        e_perm[e] = pos
        e_cam_p[pos] = e_cam[e]
        e_ptl_p[pos] = e_pt[e] % per_pts  # local index within the shard
        obs_p[pos] = obs[e]
        stereo_p[pos] = is_stereo[e]
        inv_s2_p[pos] = inv_sigma2[e]
        valid_p[pos] = e_valid[e]
        p = e_pt[e]
        pt_edges[p, fill_p[p]] = pos % per_e  # local edge index within shard
        fill_p[p] += 1
    return (pts_p, e_cam_p, e_ptl_p, obs_p, stereo_p, inv_s2_p,
            valid_p, pt_edges, per_pts, per_e, e_perm)


class DistBA:
    """Mesh-backed drop-in for core.local_ba.local_ba.

    solve() takes the same global-indexed problem arrays, partitions them
    over the mesh, runs the sharded LM (one psum per iteration), and
    returns (cam_R', cam_t', pts', outlier) in the ORIGINAL point/edge
    order — so LocalMapper / the global BA can swap it in transparently.
    Compiled executables are cached per (C, P_pad, E_pad, D) shape bucket.
    """

    def __init__(self, mesh: Mesh, axis: str = "data", its1: int = 5,
                 its2: int = 10):
        self.mesh = mesh
        self.axis = axis
        self.n_shards = int(np.prod([mesh.shape[a] for a in (axis,)]))
        self.step = make_dist_ba(mesh, axis, its1, its2)
        self._shard = NamedSharding(mesh, P(axis))
        self._repl = NamedSharding(mesh, P())

    def solve(self, cam_R, cam_t, cam_fixed, pts, e_cam, e_pt, obs,
              is_stereo, inv_sigma2, e_valid, fx, fy, cx, cy, bf):
        (pts_p, e_cam_p, e_ptl_p, obs_p, stereo_p, inv_s2_p, valid_p,
         pt_edges_p, per_pts, per_e, e_perm) = partition_problem(
            self.n_shards, np.asarray(pts), np.asarray(e_cam),
            np.asarray(e_pt), np.asarray(obs), np.asarray(is_stereo),
            np.asarray(inv_sigma2), np.asarray(e_valid))
        # put_global/fetch_global degrade to plain device_put/device_get on
        # a single-process mesh; on a multi-process (cross-host) mesh each
        # process contributes its addressable shards and the sharded
        # outputs are all-gathered back (parallel/multihost.py)
        from .multihost import fetch_global, put_global
        put_s = lambda x: put_global(x, self._shard)
        put_r = lambda x: put_global(x, self._repl)
        R2, t2, p2, outlier_p = self.step(
            put_r(cam_R), put_r(cam_t), put_r(cam_fixed),
            put_s(pts_p), put_s(e_cam_p), put_s(e_ptl_p), put_s(obs_p),
            put_s(stereo_p), put_s(inv_s2_p), put_s(valid_p),
            put_s(pt_edges_p), fx, fy, cx, cy, bf)
        R2, t2, p2, outlier_p = (fetch_global(self.mesh, a)
                                 for a in (R2, t2, p2, outlier_p))
        P_orig = np.asarray(pts).shape[0]
        outlier = outlier_p[e_perm] if len(e_perm) else outlier_p[:0]
        return R2, t2, p2[:P_orig], outlier
