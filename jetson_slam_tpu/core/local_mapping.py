"""Local mapping: map-point culling, triangulation, fusion, local BA, KF culling.

Replacement for src/LocalMapping.cpp.  The reference runs this as a separate
thread polling a keyframe queue (LocalMapping.cpp:53-114); here it is a
synchronous stage invoked per inserted keyframe (`process_pending`) — the
host-side pipeline overlap arrives with the parallel/ module (SURVEY.md §7.1
"Concurrency").

Reference semantics preserved:
- MapPointCulling (LocalMapping.cpp:176-211): found-ratio < 0.25, or < 3
  observations two keyframes after creation; survivors graduate after 3.
- CreateNewMapPoints (:213-458): triangulate against the 10 best covisible
  neighbors, epipolar-gated matching, parallax vs stereo-depth arbitration,
  reprojection + scale-consistency gates.
- SearchInNeighbors (:460-540): bidirectional fuse with th=3.
- LocalBundleAdjustment via core/local_ba.py (5+10 iterations, abortable).
- KeyFrameCulling (:638-702): cull a covisible KF when >= 90% of its points
  are seen >= 3 times elsewhere at same-or-finer scale.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from . import matcher
from .local_ba import local_ba
from .map import MapStore
from .triangulation import epipolar_match, fundamental_matrix, triangulate_pairs


def _bucket(n: int, lo: int = 16) -> int:
    """Round a dynamic count up to a power-of-two bucket (>= lo).

    Every jitted program here is shape-specialized; padding dynamic problem
    sizes (match counts, edge counts, camera counts) to buckets means XLA
    compiles once per bucket instead of once per keyframe — the reference
    has no such issue because CUDA kernels take runtime sizes, but on TPU
    recompilation (~1 s each) would dominate the mapping stage.
    """
    return max(lo, 1 << int(max(np.ceil(np.log2(max(n, 1))), 0)))


class LocalMapper:
    def __init__(self, map_store: MapStore, cam, geom, sensor="stereo",
                 run_ba=True, device=None, mesh=None):
        self.map = map_store
        self.cam = cam
        self.geom = geom
        self.sensor = sensor
        self.run_ba = run_ba
        # optional stage-pipeline device: run mapping's device programs
        # (triangulation, fuse matching, local BA) on a DIFFERENT chip than
        # the tracker's, the multi-chip analog of the reference's
        # LocalMapping thread (System.cpp:98-99)
        self.device = device
        # optional device mesh: local (and global) bundle adjustment runs
        # landmark-sharded across it (parallel/dist_ba.py) — the BASELINE
        # north star's distributed BA inside the live SLAM loop
        self.mesh = mesh
        self._dist_ba = None
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            from ..parallel.dist_ba import DistBA
            self._dist_ba = DistBA(mesh)
        self.queue: list[int] = []
        self._busy = 0
        self.recent_points: list[tuple[int, int]] = []  # (pid, birth_kf)
        self.scale_factors = np.asarray(geom.scales, np.float32)
        self.sigma2 = (self.scale_factors ** 2).astype(np.float32)
        self.inv_sigma2 = (1.0 / self.sigma2).astype(np.float32)
        self.K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                          np.float32)
        self._abort_ba = False

    # -- thread-protocol emulation used by the Tracker.
    # The reference's LocalMapping thread is busy for a few frame-times per
    # keyframe, which throttles the tracker's keyframe rate
    # (LocalMapping::AcceptKeyFrames / SetAcceptKeyFrames around Run()).
    # Running synchronously we emulate that latency with a frame-countdown,
    # otherwise a keyframe is created every frame and covisibility culling
    # churns the map.
    BUSY_FRAMES = 1

    def accepting(self):
        return self._busy == 0

    def tick(self):
        """Called once per tracked frame."""
        self._busy = max(0, self._busy - 1)

    def interrupt_ba(self):
        self._abort_ba = True

    def queue_len(self):
        return len(self.queue) + self._busy

    def insert_keyframe(self, kid: int):
        self.queue.append(kid)
        self._busy = self.BUSY_FRAMES

    # ------------------------------------------------------------------
    def process_pending(self):
        """Drain the keyframe queue; returns the processed keyframe ids."""
        done = []
        while self.queue:
            kid = self.queue.pop(0)
            self.process_keyframe(kid)
            done.append(kid)
        return done

    def device_ctx(self):
        """Context placing this mapper's device programs on its chip."""
        if self.device is None:
            import contextlib
            return contextlib.nullcontext()
        import jax
        return jax.default_device(self.device)

    def process_keyframe(self, kid: int):
        with self.device_ctx():
            # first-connection parent assignment (ProcessNewKeyFrame ->
            # UpdateConnections, LocalMapping.cpp:169-171)
            self.map.update_spanning_tree(kid)
            self._register_new_points(kid)
            self.cull_map_points(kid)
            self.create_new_map_points(kid)
            if not self.queue:
                self.search_in_neighbors(kid)
                self._abort_ba = False
                if self.run_ba and self.map.n_keyframes() > 2:
                    self.local_bundle_adjustment(kid)
                self.cull_keyframes(kid)
            self.map.version += 1

    def _register_new_points(self, kid):
        obs = self.map.kf_obs[kid]
        for slot in np.flatnonzero(obs >= 0):
            pid = int(obs[slot])
            if self.map.pt_first_kf[pid] == kid:
                self.recent_points.append((pid, kid))

    # ------------------------------------------------------- culling
    def cull_map_points(self, kid):
        """LocalMapping::MapPointCulling (LocalMapping.cpp:176-211)."""
        m = self.map
        th_obs = 2 if self.sensor == "mono" else 3
        keep = []
        for pid, birth in self.recent_points:
            if not m.pt_alive[pid]:
                continue
            found_ratio = m.pt_found[pid] / max(m.pt_visible[pid], 1)
            age = kid - birth
            if found_ratio < 0.25:
                m.erase_point(pid)
            elif age >= 2 and m.pt_nobs[pid] <= th_obs:
                m.erase_point(pid)
            elif age >= 3:
                continue  # graduated
            else:
                keep.append((pid, birth))
        self.recent_points = keep

    # ------------------------------------------------- triangulation
    def create_new_map_points(self, kid):
        """LocalMapping::CreateNewMapPoints (LocalMapping.cpp:213-458).

        Device calls are PHASED: every neighbor's epipolar match is
        dispatched first and pulled in ONE batched device_get, then every
        triangulation batch likewise — on a tunneled chip the previous
        per-neighbor blocking pulls cost 2 round-trips x #neighbors
        (~0.5 s/keyframe); now the whole stage pays two."""
        m = self.map
        n_neigh = 20 if self.sensor == "mono" else 10
        neighbors, _ = m.covisible_keyframes(kid, n=n_neigh)
        if len(neighbors) == 0:
            return
        R1 = m.kf_pose[kid, :3, :3]
        t1 = m.kf_pose[kid, :3, 3]
        c1 = m.camera_center(kid)
        ratio_factor = 1.5 * self.geom.scale_factor

        free1 = m.kf_kp_valid[kid] & (m.kf_obs[kid] < 0)
        # ---- phase A: dispatch all epipolar matches, ONE batched pull
        cand = []
        pending = []
        for kid2 in neighbors:
            kid2 = int(kid2)
            c2 = m.camera_center(kid2)
            baseline = float(np.linalg.norm(c2 - c1))
            if self.sensor != "mono":
                if baseline < self.cam.bf / self.cam.fx:
                    continue
            else:
                med_depth = self._scene_median_depth(kid2)
                if med_depth <= 0 or baseline / med_depth < 0.01:
                    continue
            R2 = m.kf_pose[kid2, :3, :3]
            t2 = m.kf_pose[kid2, :3, 3]
            F12 = fundamental_matrix(R1, t1, R2, t2, self.K)
            # epipole of kf1 center in image 2
            cc = R2 @ c1 + t2
            ex = self.cam.fx * cc[0] / max(cc[2], 1e-9) + self.cam.cx
            ey = self.cam.fy * cc[1] / max(cc[2], 1e-9) + self.cam.cy

            free2 = m.kf_kp_valid[kid2] & (m.kf_obs[kid2] < 0)
            pending.append(epipolar_match(
                jnp.asarray(m.kf_desc[kid]), jnp.asarray(free1),
                jnp.asarray(m.kf_kp_angle[kid]), jnp.asarray(m.kf_kp_xy[kid]),
                jnp.asarray(m.kf_kp_ur[kid]),
                jnp.asarray(m.kf_desc[kid2]), jnp.asarray(free2),
                jnp.asarray(m.kf_kp_angle[kid2]), jnp.asarray(m.kf_kp_xy[kid2]),
                jnp.asarray(F12), jnp.asarray(self.sigma2),
                jnp.asarray(m.kf_kp_octave[kid2]),
                float(ex), float(ey),
                jnp.asarray(self.scale_factors ** 2)))
            cand.append((kid2, R2, t2))
        if not pending:
            return
        matches = jax.device_get(pending)

        # ---- phase B: dispatch all triangulations, ONE batched pull;
        # free1 is NOT updated between neighbors here (the per-point
        # double-claim is resolved in phase C by the kf_obs check, same as
        # the reference's AddMapPoint ordering)
        tri = []
        for (kid2, R2, t2), match in zip(cand, matches):
            match = np.asarray(match)
            s1 = np.flatnonzero((match >= 0) & free1)
            n = len(s1)
            if n == 0:
                continue
            s2 = match[s1]
            # pad the pair batch to a bucket (repeat entry 0); padded outputs
            # are sliced off below — keeps triangulate_pairs' compiled shapes
            # stable across keyframes
            cap = _bucket(n, 64)
            s1p = np.concatenate([s1, np.full(cap - n, s1[0], s1.dtype)])
            s2p = np.concatenate([s2, np.full(cap - n, s2[0], s2.dtype)])
            xy1 = m.kf_kp_xy[kid, s1p]
            xy2 = m.kf_kp_xy[kid2, s2p]
            x1n = np.stack([(xy1[:, 0] - self.cam.cx) / self.cam.fx,
                            (xy1[:, 1] - self.cam.cy) / self.cam.fy,
                            np.ones(cap, np.float32)], axis=1)
            x2n = np.stack([(xy2[:, 0] - self.cam.cx) / self.cam.fx,
                            (xy2[:, 1] - self.cam.cy) / self.cam.fy,
                            np.ones(cap, np.float32)], axis=1)
            out = triangulate_pairs(
                jnp.broadcast_to(jnp.asarray(R1), (cap, 3, 3)),
                jnp.broadcast_to(jnp.asarray(t1), (cap, 3)),
                jnp.broadcast_to(jnp.asarray(R2), (cap, 3, 3)),
                jnp.broadcast_to(jnp.asarray(t2), (cap, 3)),
                jnp.asarray(x1n.astype(np.float32)),
                jnp.asarray(x2n.astype(np.float32)),
                jnp.asarray(m.kf_kp_ur[kid, s1p]),
                jnp.asarray(m.kf_kp_ur[kid2, s2p]),
                jnp.asarray(m.kf_kp_depth[kid, s1p]),
                jnp.asarray(m.kf_kp_depth[kid2, s2p]),
                jnp.asarray(xy1), jnp.asarray(xy2),
                jnp.asarray(m.kf_kp_octave[kid, s1p]),
                jnp.asarray(m.kf_kp_octave[kid2, s2p]),
                jnp.asarray(self.sigma2[m.kf_kp_octave[kid, s1p]]),
                jnp.asarray(self.sigma2[m.kf_kp_octave[kid2, s2p]]),
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                self.cam.bf, float(ratio_factor))
            tri.append((kid2, s1, s2, n, out))
        if not tri:
            return
        pulled = jax.device_get([t[-1] for t in tri])

        # ---- phase C: host-side registration (unchanged semantics)
        for (kid2, s1, s2, n, _), (pts, ok) in zip(tri, pulled):
            pts = np.asarray(pts)[:n]
            ok = np.asarray(ok)[:n]
            for i in np.flatnonzero(ok):
                sl1, sl2 = int(s1[i]), int(s2[i])
                if m.kf_obs[kid, sl1] >= 0 or m.kf_obs[kid2, sl2] >= 0:
                    continue
                pid = m.add_point(pts[i], m.kf_desc[kid, sl1], kid)
                m.add_observation(kid, sl1, pid)
                m.add_observation(kid2, sl2, pid)
                m.compute_distinctive_descriptor(pid)
                m.update_normal_and_depth(pid, self.scale_factors,
                                          self.geom.n_levels)
                self.recent_points.append((pid, kid))

    def _scene_median_depth(self, kid):
        """KeyFrame::ComputeSceneMedianDepth (KeyFrame.cpp:637)."""
        m = self.map
        obs = m.kf_obs[kid]
        pids = obs[obs >= 0]
        pids = pids[m.pt_alive[pids]]
        if len(pids) == 0:
            return -1.0
        R = m.kf_pose[kid, :3, :3]
        t = m.kf_pose[kid, :3, 3]
        z = (m.pt_pos[pids] @ R[2]) + t[2]
        return float(np.median(z))

    # --------------------------------------------------------- fusion
    def search_in_neighbors(self, kid):
        """LocalMapping::SearchInNeighbors (LocalMapping.cpp:460-540).

        Bidirectional fuse with th=3 via the batched projection matcher.
        """
        m = self.map
        neighbors, _ = m.covisible_keyframes(kid, n=10)
        targets = set()
        for nk in neighbors:
            targets.add(int(nk))
            n2, _ = m.covisible_keyframes(int(nk), n=5)
            for nn in n2:
                if int(nn) != kid:
                    targets.add(int(nn))
        # fuse current KF's points into targets, then targets' points into
        # kid.  The forward fuses are dispatched for ALL targets and pulled
        # in ONE batched device_get (per-target blocking pulls cost a full
        # tunnel round-trip each); candidate selection therefore sees the
        # pre-fuse map snapshot — the commit loop re-validates liveness, so
        # a point replaced by an earlier target's fuse is simply skipped,
        # like the reference's sequential ORBmatcher::Fuse ordering
        my_pids = np.unique(m.kf_obs[kid][m.kf_obs[kid] >= 0])
        pending = [self._fuse_dispatch(tk, my_pids) for tk in targets]
        pulled = jax.device_get([p[2] for p in pending if p is not None])
        for (tk, idx, _), sel in zip(
                [p for p in pending if p is not None], pulled):
            self._fuse_commit(tk, idx, np.asarray(sel))
        back_pids = []
        for tk in targets:
            o = m.kf_obs[tk]
            back_pids.append(o[o >= 0])
        if back_pids:
            self._fuse_into(kid, np.unique(np.concatenate(back_pids)))
        # refresh point descriptors/normals of current KF
        for pid in np.unique(m.kf_obs[kid][m.kf_obs[kid] >= 0]):
            if m.pt_alive[pid]:
                m.compute_distinctive_descriptor(int(pid))
                m.update_normal_and_depth(int(pid), self.scale_factors,
                                          self.geom.n_levels)

    def _fuse_into(self, kid, pids):
        """ORBmatcher::Fuse (ORBmatcher.cpp:812-962) with th=3."""
        out = self._fuse_dispatch(kid, pids)
        if out is None:
            return
        _, idx, sel = out
        self._fuse_commit(kid, idx, np.asarray(sel))

    def _fuse_dispatch(self, kid, pids):
        """Dispatch the frustum + projection search for one fuse target;
        returns (kid, padded pid table, device selection) without blocking."""
        m = self.map
        pids = pids[m.pt_alive[pids]] if len(pids) else pids
        if len(pids) == 0:
            return None
        cap = max(128, 1 << int(np.ceil(np.log2(len(pids)))))
        pad = cap - len(pids)
        idx = np.concatenate([pids, np.zeros(pad, pids.dtype)])
        alive = np.concatenate([np.ones(len(pids), bool), np.zeros(pad, bool)])
        R = m.kf_pose[kid, :3, :3]
        t = m.kf_pose[kid, :3, 3]
        Ow = m.camera_center(kid)
        ok, u, v, invz, lvl, vcos = matcher.frustum_check(
            jnp.asarray(m.pt_pos[idx]), jnp.asarray(m.pt_normal[idx]),
            jnp.asarray(m.pt_max_dist[idx]), jnp.asarray(m.pt_min_dist[idx]),
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(Ow),
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            0.0, float(self.geom.widths[0]), 0.0, float(self.geom.heights[0]),
            self.geom.n_levels, float(np.log(self.geom.scale_factor)), 0.5,
            jnp.asarray(alive))
        ur_proj = u - self.cam.bf * invz          # on device: no mid pull
        sel = matcher.search_by_projection_points(
            u, v, ur_proj, lvl, vcos, ok,
            jnp.asarray(m.pt_desc[idx]),
            jnp.asarray(m.kf_kp_xy[kid]), jnp.asarray(m.kf_kp_octave[kid]),
            jnp.asarray(m.kf_desc[kid]), jnp.asarray(m.kf_kp_valid[kid]),
            jnp.asarray(m.kf_kp_ur[kid]),
            jnp.asarray(np.ones(m.n_slots, bool)),  # fuse also checks occupied
            3.0, self.scale_factors, self.geom.n_levels, nn_ratio=1.0,
            fuse=True)
        return kid, idx, sel

    def _fuse_commit(self, kid, idx, sel):
        m = self.map
        for slot in np.flatnonzero(sel >= 0):
            pid = int(idx[sel[slot]])
            if not m.pt_alive[pid]:
                continue
            existing = m.kf_obs[kid, slot]
            if existing >= 0:
                if existing == pid or not m.pt_alive[existing]:
                    continue
                # keep the more-observed point (ORBmatcher.cpp:941-951)
                if m.pt_nobs[existing] > m.pt_nobs[pid]:
                    m.replace_point(pid, int(existing))
                else:
                    m.replace_point(int(existing), pid)
            else:
                m.add_observation(kid, slot, pid)

    # ------------------------------------------------------ local BA
    def local_bundle_adjustment(self, kid):
        """Optimizer::LocalBundleAdjustment wrapper (Optimizer.cpp:458-784).

        Split into prepare (map reads) / solve (pure device LM) / commit
        (map writes) so the async pipeline can run the solve without holding
        the map lock and honor the abort-BA interrupt by discarding the
        result (mbAbortBA semantics, Optimizer.cpp:577-580)."""
        prep = self._lba_prepare(kid)
        if prep is None:
            return
        sol = self._lba_solve(prep)
        self._lba_commit(prep, sol)

    def _lba_prepare(self, kid):
        m = self.map
        local, _ = m.covisible_keyframes(kid, n=None, min_weight=1)
        local = np.concatenate([[kid], local]).astype(np.int64)
        local_set = np.zeros(m.max_keyframes, bool)
        local_set[local] = True
        obs = m.kf_obs[local]
        pids = np.unique(obs[obs >= 0])
        pids = pids[m.pt_alive[pids]]
        if len(pids) < 10:
            return None
        in_pts = np.zeros(m.max_points, bool)
        in_pts[pids] = True
        # fixed cameras: other KFs observing these points (allocated rows only)
        Kact = m._next_kf
        tab = m.kf_obs[:Kact]
        sees = np.zeros(m.max_keyframes, bool)
        sees[:Kact] = (in_pts[np.where(tab >= 0, tab, 0)] & (tab >= 0)).any(1)
        fixed_kfs = np.flatnonzero(sees & m.kf_alive & ~local_set)
        cams = np.concatenate([local, fixed_kfs])
        # KF 0 is always fixed even when local (Optimizer.cpp:527
        # vSE3->setFixed(pKFi->mnId==0)) — anchoring the gauge at the map
        # origin; anchoring the newest KF instead lets the whole older map
        # slide to match the current (drifting) pose.
        fixed = np.concatenate([local == 0,
                                np.ones(len(fixed_kfs), bool)])
        if len(local) == 1 or (~fixed).sum() < 1:
            return None
        if fixed.sum() == 0:
            fixed[np.argmin(cams)] = True  # no frontier: anchor oldest KF
        cam_of = {int(k): i for i, k in enumerate(cams)}
        pt_of = {int(p): i for i, p in enumerate(pids)}

        e_cam, e_pt, e_slot, e_kf = [], [], [], []
        for ci, k in enumerate(cams):
            o = m.kf_obs[k]
            for slot in np.flatnonzero(o >= 0):
                pid = o[slot]
                if in_pts[pid]:
                    e_cam.append(ci)
                    e_pt.append(pt_of[int(pid)])
                    e_slot.append(slot)
                    e_kf.append(int(k))
        E = len(e_cam)
        if E < 20:
            return None
        e_cam = np.array(e_cam, np.int32)
        e_pt = np.array(e_pt, np.int32)
        e_slot = np.array(e_slot, np.int64)
        e_kf = np.array(e_kf, np.int64)
        kp_ur = m.kf_kp_ur[e_kf, e_slot]
        obs_arr = np.stack([
            m.kf_kp_xy[e_kf, e_slot, 0], m.kf_kp_xy[e_kf, e_slot, 1],
            np.where(kp_ur >= 0, kp_ur, 0.0)], axis=1).astype(np.float32)
        is_stereo = kp_ur >= 0
        inv_s2 = self.inv_sigma2[m.kf_kp_octave[e_kf, e_slot]]

        P = len(pids)
        deg = np.bincount(e_pt, minlength=P)
        # pad every problem dimension to a bucket so the LM program compiles
        # once per bucket, not once per keyframe (padded cameras are fixed
        # identity blocks, padded points are edge-free lam*I blocks, padded
        # edges carry e_valid=False -> zero weight)
        C_real = len(cams)
        C_pad = _bucket(C_real, 8)
        P_pad = _bucket(P, 64)
        E_pad = _bucket(E, 256)
        D = _bucket(int(deg.max()), 4)
        pt_edges = np.full((P_pad, D), -1, np.int32)
        fill = np.zeros(P, np.int32)
        for e in range(E):
            p = e_pt[e]
            pt_edges[p, fill[p]] = e
            fill[p] += 1

        Rs = np.tile(np.eye(3, dtype=np.float32), (C_pad, 1, 1))
        ts = np.zeros((C_pad, 3), np.float32)
        Rs[:C_real] = m.kf_pose[cams, :3, :3]
        ts[:C_real] = m.kf_pose[cams, :3, 3]
        fixed_p = np.ones(C_pad, bool)
        fixed_p[:C_real] = fixed
        pt_pos = np.zeros((P_pad, 3), np.float32)
        pt_pos[:P] = m.pt_pos[pids]

        def padE(a, fillv=0):
            out = np.full((E_pad,) + a.shape[1:], fillv, a.dtype)
            out[:E] = a
            return out

        return dict(cams=cams, fixed=fixed_p, pids=pids, Rs=Rs, ts=ts,
                    pt_pos=pt_pos,
                    e_cam=padE(e_cam), e_pt=padE(e_pt),
                    e_slot=e_slot, e_kf=e_kf,
                    obs_arr=padE(obs_arr), is_stereo=padE(is_stereo),
                    inv_s2=padE(inv_s2, 1.0),
                    e_valid=padE(np.ones(E, bool)),
                    pt_edges=pt_edges, E=E)

    def _lba_solve(self, prep):
        """Pure device LM solve over the prepared snapshot — touches no map
        state (safe to run without the map lock).  With a mesh attached the
        solve runs landmark-sharded over it (one psum per LM iteration);
        the math is the same shared implementation either way."""
        import jax
        if self._dist_ba is not None:
            R2, t2, p2, outlier_orig = self._dist_ba.solve(
                prep["Rs"], prep["ts"], prep["fixed"], prep["pt_pos"],
                prep["e_cam"], prep["e_pt"], prep["obs_arr"],
                prep["is_stereo"], prep["inv_s2"], prep["e_valid"],
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                self.cam.bf)
            return R2, t2, p2, outlier_orig
        R2, t2, p2, outlier = local_ba(
            jnp.asarray(prep["Rs"]), jnp.asarray(prep["ts"]),
            jnp.asarray(prep["fixed"]),
            jnp.asarray(prep["pt_pos"]),
            jnp.asarray(prep["e_cam"]), jnp.asarray(prep["e_pt"]),
            jnp.asarray(prep["obs_arr"]), jnp.asarray(prep["is_stereo"]),
            jnp.asarray(prep["inv_s2"]),
            jnp.asarray(prep["e_valid"]),
            jnp.asarray(prep["pt_edges"]),
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy, self.cam.bf)
        return jax.device_get((R2, t2, p2, outlier))

    def _lba_commit(self, prep, sol):
        """Write solved poses/points/outliers back into the map."""
        m = self.map
        R2, t2, p2, outlier = sol
        cams, fixed, pids = prep["cams"], prep["fixed"], prep["pids"]
        from ..utils.lie import project_so3_np
        for i, k in enumerate(cams):
            if not fixed[i]:
                m.kf_pose[k, :3, :3] = project_so3_np(R2[i])
                m.kf_pose[k, :3, 3] = t2[i]
        m.pt_pos[pids] = p2[:len(pids)]
        for e in np.flatnonzero(outlier[:prep["E"]]):
            m.erase_observation(int(prep["e_kf"][e]), int(prep["e_slot"][e]))

    # -------------------------------------------------- keyframe culling
    def cull_keyframes(self, kid):
        """LocalMapping::KeyFrameCulling (LocalMapping.cpp:638-702)."""
        m = self.map
        neighbors, _ = m.covisible_keyframes(kid, n=None, min_weight=1)
        for k in neighbors:
            k = int(k)
            if k == 0:  # never cull the first keyframe
                continue
            obs = m.kf_obs[k]
            slots = np.flatnonzero(obs >= 0)
            if len(slots) == 0:
                continue
            pids = obs[slots]
            alive = m.pt_alive[pids]
            slots, pids = slots[alive], pids[alive]
            if len(slots) == 0:
                continue
            # stereo: only consider points with valid close depth
            if self.sensor != "mono":
                d = m.kf_kp_depth[k, slots]
                near = (d > 0) & (d < self.cam.th_depth * self.cam.bf / self.cam.fx)
                slots, pids = slots[near], pids[near]
            if len(slots) == 0:
                continue
            n_redundant = 0
            my_lvl = m.kf_kp_octave[k, slots]
            for s, pid, lv in zip(slots, pids, my_lvl):
                kfs, sl2 = m.observations_of(int(pid))
                other = kfs != k
                if other.sum() < 3:
                    continue
                fine = m.kf_kp_octave[kfs[other], sl2[other]] <= lv + 1
                if fine.sum() >= 3:
                    n_redundant += 1
            if n_redundant > 0.9 * len(slots):
                m.erase_keyframe(k)
