#!/usr/bin/env python
"""Distributed-BA scaling benchmark (BASELINE.json north star: >= 70%
scaling efficiency at N >= 2 devices).

Builds a synthetic BA problem (C cameras, P landmarks, stereo edges), runs
the landmark-sharded Schur-complement LM step (parallel/dist_ba.py) on
1..N devices of whatever platform JAX selects, and prints per-N wall time
plus efficiency vs the 1-device run scaled by N.

On a single-chip session this still exercises the full sharded program; run
it on a multi-chip slice (or a CPU host with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a logic-only check)
to measure real scaling.

Usage: python examples/bench_dist_ba.py [--points 16384] [--cams 64] [--iters 6]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_problem(rng, n_cams, n_pts, fx, fy, cx, cy, bf, obs_per_pt=4):
    pts = np.stack([rng.uniform(-8, 8, n_pts), rng.uniform(-6, 6, n_pts),
                    rng.uniform(6, 20, n_pts)], 1).astype(np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    ts = np.zeros((n_cams, 3), np.float32)
    ts[:, 0] = 0.15 * np.arange(n_cams)
    e_cam, e_pt, obs = [], [], []
    for p in range(n_pts):
        cams = rng.choice(n_cams, size=min(obs_per_pt, n_cams), replace=False)
        for c in cams:
            pc = pts[p].copy()
            pc[0] -= ts[c, 0]
            u = fx * pc[0] / pc[2] + cx + rng.normal(0, 0.3)
            v = fy * pc[1] / pc[2] + cy + rng.normal(0, 0.3)
            e_cam.append(c)
            e_pt.append(p)
            obs.append([u, v, u - bf / pc[2]])
    return (pts, Rs, ts, np.array(e_cam, np.int32), np.array(e_pt, np.int32),
            np.array(obs, np.float32))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: --points is PER SHARD; the problem "
                         "grows with N and ideal time stays flat "
                         "(efficiency = t1/tN)")
    ns = ap.parse_args(argv)

    import jax
    # the session sitecustomize force-registers the TPU tunnel plugin and
    # wins over the env var alone; honor an explicit JAX_PLATFORMS request
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from jetson_slam_tpu.parallel.dist_ba import make_dist_ba, partition_problem

    FX = FY = 320.0
    CX, CY, BF = 160.0, 120.0, 40.0
    C = ns.cams
    # per-iteration psum payload (core/local_ba.py build_and_solve): the
    # reduced camera system S (C,C,6,6) + Hcc (C,6,6) + rhs (C,6) + accept
    # costs — the ONLY collectives; everything per-landmark stays local
    psum_bytes = (C * C * 36 + C * 36 + C * 6 + 4) * 4
    print(f"psum payload per LM iteration: {psum_bytes/1e6:.2f} MB "
          f"(C={C}: S {C}x{C}x6x6 + Hcc + rhs, f32)")
    rng = np.random.default_rng(0)

    def problem_for(n_pts):
        pts, Rs, ts, e_cam, e_pt, obs = build_problem(
            rng, C, n_pts, FX, FY, CX, CY, BF)
        stereo = np.ones(len(e_cam), bool)
        return pts, Rs, ts, e_cam, e_pt, obs, stereo

    fixed = np.zeros(C, bool)
    fixed[0] = True
    if not ns.weak:
        pts, Rs, ts, e_cam, e_pt, obs, stereo = problem_for(ns.points)
        print(f"problem: {C} cams, {ns.points} pts, {len(e_cam)} edges "
              f"(strong scaling)")

    devices = jax.devices()
    sizes = sorted({1, 2, 4, 8, len(devices)})
    t1 = None
    for n in sizes:
        if n > len(devices):
            continue
        if ns.weak:
            rng = np.random.default_rng(0)  # same per-shard stream per N
            pts, Rs, ts, e_cam, e_pt, obs, stereo = problem_for(
                ns.points * n)
            print(f"N={n}: {C} cams, {len(pts)} pts, {len(e_cam)} edges "
                  f"({ns.points}/shard)")
        mesh = Mesh(np.array(devices[:n]), ("data",))
        parts = partition_problem(
            n, pts, e_cam, e_pt, obs, stereo,
            np.ones(len(e_cam), np.float32), np.ones(len(e_cam), bool))
        (pts_p, e_cam_p, e_ptl_p, obs_p, stereo_p, inv_s2_p,
         valid_p, pt_edges_p, per_pts, per_e, e_perm) = parts
        step = make_dist_ba(mesh, its1=0, its2=ns.iters)
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        put_s = lambda x: jax.device_put(jnp.asarray(x), shard)
        put_r = lambda x: jax.device_put(jnp.asarray(x), repl)
        args = (put_r(Rs), put_r(ts), put_r(fixed), put_s(pts_p),
                put_s(e_cam_p), put_s(e_ptl_p), put_s(obs_p),
                put_s(stereo_p), put_s(inv_s2_p), put_s(valid_p),
                put_s(pt_edges_p), FX, FY, CX, CY, BF)
        out = step(*args)
        jax.device_get(out[1])  # real readback: block_until_ready is
        # optimistic on the tunneled TPU platform and would time dispatch
        t0 = time.perf_counter()
        for _ in range(ns.reps):
            out = step(*args)
        jax.device_get(out[1])
        dt = (time.perf_counter() - t0) / ns.reps
        if t1 is None:
            t1 = dt
            eff = 1.0
        else:
            # weak: ideal time flat; strong: ideal time t1/n
            eff = (t1 / dt) if ns.weak else (t1 / (dt * n))
        print(f"N={n}: {dt*1e3:8.1f} ms/step   efficiency vs 1-dev: "
              f"{eff*100:5.1f}%")


if __name__ == "__main__":
    main()
