"""Loop closing: detection, Sim3 computation, loop correction, global BA.

Replacement for src/LoopClosing.cpp:
- `detect_loop`     <- LoopClosing::DetectLoop (:108-234): min covisible BoW
  score, database query, 3-consecutive covisibility-group consistency.
- `compute_sim3`    <- LoopClosing::ComputeSim3 (:236-405): per-candidate
  brute-force matches -> Sim3 RANSAC -> guided projection >= threshold.
- `correct_loop`    <- LoopClosing::CorrectLoop (:407-590): Sim3 propagation
  over the current covisibility group, duplicate fusion, essential-graph
  optimization (core/pose_graph.py), then full BA.
The reference runs this as a thread polling a queue (:62-89); here it is a
synchronous stage invoked per keyframe.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bow.database import KeyFrameDatabase
from ..utils.lie import log_so3
from . import matcher
from .local_ba import local_ba
from .map import MapStore
from .pose_graph import pose_graph_optimize
from .sim3_solver import sim3_ransac

COVIS_CONSISTENCY_TH = 3  # reference LoopClosing.cpp:48


class LoopCloser:
    def __init__(self, map_store: MapStore, database: KeyFrameDatabase, cam,
                 geom, sensor="stereo", run_gba=True):
        self.map = map_store
        self.db = database
        self.cam = cam
        self.geom = geom
        self.sensor = sensor
        self.run_gba = run_gba
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf = -1
        self.sigma2 = np.asarray(geom.scales, np.float32) ** 2
        self.n_loops_closed = 0
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    def process_keyframe(self, kid: int):
        """Returns True if a loop was detected and corrected."""
        self.db.add(kid, self._kf_descs(kid))
        if self.map.n_keyframes() < 10 or kid < self.last_loop_kf + 10:
            return False
        candidates = self.detect_loop(kid)
        if len(candidates) == 0:
            return False
        ok, loop_kf, s, R, t = self.compute_sim3(kid, candidates)
        if not ok:
            return False
        self.correct_loop(kid, loop_kf, s, R, t)
        self.last_loop_kf = kid
        self.n_loops_closed += 1
        return True

    def _kf_descs(self, kid):
        m = self.map
        sel = m.kf_kp_valid[kid]
        return m.kf_desc[kid][sel]

    # ------------------------------------------------------------------
    def detect_loop(self, kid):
        """LoopClosing::DetectLoop (:108-234)."""
        m = self.map
        neigh, w = m.covisible_keyframes(kid, n=None)
        min_score = 1.0
        for nk in neigh:
            s = self.db.score(kid, int(nk))
            min_score = min(min_score, s)
        cand = self.db.detect_loop_candidates(kid, min_score, neigh, m)
        if len(cand) == 0:
            self.consistent_groups = []
            return []
        # covisibility-group temporal consistency >= 3
        consistent_enough = []
        new_groups = []
        for c in cand:
            group = {int(c)}
            gn, _ = m.covisible_keyframes(int(c), n=10)
            group.update(int(x) for x in gn)
            best_consistency = 0
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    best_consistency = max(best_consistency, count + 1)
            new_groups.append((group, best_consistency))
            if best_consistency >= COVIS_CONSISTENCY_TH:
                consistent_enough.append(int(c))
        self.consistent_groups = new_groups
        return consistent_enough

    # ------------------------------------------------------------------
    def compute_sim3(self, kid, candidates):
        """LoopClosing::ComputeSim3 (:236-405).

        Matches current KF features to each candidate's map points (brute
        force; BoW buckets in the reference), runs Sim3 RANSAC on the paired
        3D points (camera frames), accepts with >= 20 inliers.
        """
        m = self.map
        fix_scale = self.sensor != "mono"
        for cand in candidates:
            match, _ = matcher.match_brute_force(
                jnp.asarray(m.kf_desc[kid]),
                jnp.asarray(m.kf_kp_valid[kid] & (m.kf_obs[kid] >= 0)),
                jnp.asarray(m.kf_kp_angle[kid]),
                jnp.asarray(m.kf_desc[cand]),
                jnp.asarray(m.kf_kp_valid[cand] & (m.kf_obs[cand] >= 0)),
                jnp.asarray(m.kf_kp_angle[cand]), nn_ratio=0.75)
            match = np.asarray(match)
            slots1 = np.flatnonzero(match >= 0)
            if len(slots1) < 20:
                continue
            slots2 = match[slots1]
            p1 = m.kf_obs[kid, slots1]
            p2 = m.kf_obs[cand, slots2]
            good = (p1 >= 0) & (p2 >= 0)
            good[good] &= m.pt_alive[p1[good]] & m.pt_alive[p2[good]]
            if good.sum() < 20:
                continue
            slots1, slots2 = slots1[good], slots2[good]
            p1, p2 = p1[good], p2[good]
            # 3D positions in each camera frame
            P1 = m.pt_pos[p1] @ m.kf_pose[kid, :3, :3].T + m.kf_pose[kid, :3, 3]
            P2 = m.pt_pos[p2] @ m.kf_pose[cand, :3, :3].T + m.kf_pose[cand, :3, 3]
            N = len(P1)
            th1 = 9.210 * self.sigma2[m.kf_kp_octave[kid, slots1]]
            th2 = 9.210 * self.sigma2[m.kf_kp_octave[cand, slots2]]
            self._key, sub = jax.random.split(self._key)
            cam = (self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy)
            s, R, t, inl, n_inl = sim3_ransac(
                jnp.asarray(P1.astype(np.float32)),
                jnp.asarray(P2.astype(np.float32)),
                jnp.asarray(np.ones(N, bool)), cam, cam,
                jnp.asarray(th1), jnp.asarray(th2), sub,
                n_hyp=128, fix_scale=fix_scale)
            if int(n_inl) < 20:
                continue
            # Sim3 LM refinement on the RANSAC inliers
            # (Optimizer::OptimizeSim3, Optimizer.cpp:1051-1248).
            # Direction care: sim3_ransac returns S mapping CURRENT-frame
            # points into the CANDIDATE frame (p2 = s R p1 + t);
            # sim3_optimization refines S mapping its SECOND point set into
            # its FIRST (q1 = s R p2 + t), so the candidate set rides first
            # to keep the same current->candidate transform throughout.
            from .optimizer import sim3_optimization
            obs1 = m.kf_kp_xy[kid, slots1]
            obs2 = m.kf_kp_xy[cand, slots2]
            inv1 = 1.0 / self.sigma2[m.kf_kp_octave[kid, slots1]]
            inv2 = 1.0 / self.sigma2[m.kf_kp_octave[cand, slots2]]
            s, R, t, inl, n_inl = sim3_optimization(
                jnp.asarray(P2.astype(np.float32)),
                jnp.asarray(P1.astype(np.float32)),
                jnp.asarray(obs2.astype(np.float32)),
                jnp.asarray(obs1.astype(np.float32)),
                jnp.asarray(inv2.astype(np.float32)),
                jnp.asarray(inv1.astype(np.float32)),
                jnp.asarray(inl), jnp.float32(s), R, t,
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                fix_scale=fix_scale)
            if int(n_inl) >= 20:
                return True, int(cand), float(s), np.asarray(R), np.asarray(t)
        return False, -1, 1.0, np.eye(3), np.zeros(3)

    # ------------------------------------------------------------------
    def correct_loop(self, kid, loop_kf, s, R, t):
        """LoopClosing::CorrectLoop (:407-590).

        S21 maps current-KF camera coords into loop-KF camera coords.  The
        corrected world->current pose is S21^-1 composed with loop-KF pose
        scaled; we propagate the correction delta over the current covisible
        group, fuse duplicates, optimize the essential graph, then run full
        BA (the reference spawns a GBA thread; synchronous here).
        """
        m = self.map
        # corrected Sim3 pose of current KF: S_cw' = S_lc^-1... derive:
        # P2 = s R P1 + t maps current-cam -> loop-cam; world pose of loop
        # T_lw known; corrected current pose S_cw = (s,R,t)^-1 * T_lw.
        R_lw = m.kf_pose[loop_kf, :3, :3]
        t_lw = m.kf_pose[loop_kf, :3, 3]
        si, Ri, ti = 1.0 / s, R.T, -(R.T @ t) / s
        R_cw_new = Ri @ R_lw
        t_cw_new = si * (Ri @ t_lw) + ti
        s_cw_new = si  # scale drift absorbed (1 for stereo)

        T_old = m.kf_pose[kid].copy()
        R_old, t_old = T_old[:3, :3], T_old[:3, 3]

        # propagate delta to the covisible group (reference :447-520)
        group, _ = m.covisible_keyframes(kid, n=None, min_weight=1)
        group = np.concatenate([[kid], group]).astype(np.int64)
        corrected = {}
        for k in group:
            R_kw = m.kf_pose[k, :3, :3]
            t_kw = m.kf_pose[k, :3, 3]
            # T_kc = T_kw * T_cw_old^-1 ; corrected T_kw' = T_kc * S_cw_new
            R_kc = R_kw @ R_old.T
            t_kc = t_kw - R_kc @ t_old
            R_new = R_kc @ R_cw_new
            t_new = R_kc @ t_cw_new + t_kc
            corrected[int(k)] = (R_new, t_new)
        # correct the group's map points with their KF's old->new transform
        moved = set()
        for k in group:
            R_new, t_new = corrected[int(k)]
            R_kw = m.kf_pose[k, :3, :3]
            t_kw = m.kf_pose[k, :3, 3]
            obs = m.kf_obs[k]
            pids = obs[obs >= 0]
            pids = pids[m.pt_alive[pids]]
            for pid in pids:
                if int(pid) in moved:
                    continue
                moved.add(int(pid))
                pc = R_kw @ m.pt_pos[pid] + t_kw
                m.pt_pos[pid] = R_new.T @ (pc - t_new)
        from ..utils.lie import project_so3_np
        for k in group:
            R_new, t_new = corrected[int(k)]
            m.kf_pose[k, :3, :3] = project_so3_np(R_new)
            m.kf_pose[k, :3, 3] = t_new

        # fuse duplicated points between loop region and current region
        loop_group, _ = m.covisible_keyframes(loop_kf, n=10)
        loop_pids = []
        for k in np.concatenate([[loop_kf], loop_group]).astype(np.int64):
            o = m.kf_obs[k]
            loop_pids.append(o[o >= 0])
        if loop_pids:
            loop_pids = np.unique(np.concatenate(loop_pids))
            from .local_mapping import LocalMapper
            lm = LocalMapper(m, self.cam, self.geom, sensor=self.sensor,
                             run_ba=False)
            for k in group:
                lm._fuse_into(int(k), loop_pids)

        # essential graph optimization over all alive keyframes
        self._optimize_essential_graph(kid, loop_kf)
        if self.run_gba:
            self.global_bundle_adjustment()

    # ------------------------------------------------------------------
    def _essential_edges(self, kids):
        """Spanning chain + strong covisibility edges (weight >= 100,
        Optimizer.cpp:905)."""
        m = self.map
        pos = {int(k): i for i, k in enumerate(kids)}
        edges = set()
        for i in range(1, len(kids)):
            edges.add((i - 1, i))  # temporal chain (spanning tree analog)
        for k in kids:
            w = m.covisibility_weights(int(k))
            for k2 in np.flatnonzero(w >= 100):
                if int(k2) in pos and int(k2) != int(k):
                    a, b = pos[int(k)], pos[int(k2)]
                    edges.add((min(a, b), max(a, b)))
        return sorted(edges)

    def _optimize_essential_graph(self, kid, loop_kf):
        m = self.map
        kids = m.keyframe_ids()
        K = len(kids)
        if K < 3:
            return
        pos = {int(k): i for i, k in enumerate(kids)}
        edges = self._essential_edges(kids)
        # add the loop edge
        edges.append((min(pos[kid], pos[loop_kf]),
                      max(pos[kid], pos[loop_kf])))
        e_i = np.array([a for a, b in edges], np.int32)
        e_j = np.array([b for a, b in edges], np.int32)
        Rs = m.kf_pose[kids, :3, :3].astype(np.float32)
        ts = m.kf_pose[kids, :3, 3].astype(np.float32)
        ss = np.ones(K, np.float32)
        # measurements from current (already corrected) relative poses
        mi_s, mi_R, mi_t = [], [], []
        for a, b in zip(e_i, e_j):
            R_ij = Rs[a] @ Rs[b].T
            t_ij = ts[a] - R_ij @ ts[b]
            # inverse measurement
            mi_R.append(R_ij.T)
            mi_t.append(-R_ij.T @ t_ij)
            mi_s.append(1.0)
        fixed = np.zeros(K, bool)
        fixed[pos[loop_kf]] = True
        s2, R2, t2 = pose_graph_optimize(
            jnp.asarray(ss), jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(fixed), jnp.asarray(e_i), jnp.asarray(e_j),
            jnp.asarray(np.array(mi_s, np.float32)),
            jnp.asarray(np.stack(mi_R)), jnp.asarray(np.stack(mi_t)),
            jnp.asarray(np.ones(len(e_i), bool)),
            n_iters=20, fix_scale=self.sensor != "mono")
        R2 = np.asarray(R2)
        t2 = np.asarray(t2)
        s2 = np.asarray(s2)
        # apply with point correction via reference keyframes
        self._apply_corrected_poses(kids, R2, t2, s2)

    def _apply_corrected_poses(self, kids, R2, t2, s2):
        m = self.map
        old_R = m.kf_pose[kids, :3, :3].copy()
        old_t = m.kf_pose[kids, :3, 3].copy()
        pos = {int(k): i for i, k in enumerate(kids)}
        # move each point with its reference KF's old->new transform
        for pid in np.flatnonzero(m.pt_alive):
            ref = m.pt_ref_kf[pid]
            if ref not in pos:
                kfs, _ = m.observations_of(pid)
                if len(kfs) == 0:
                    continue
                ref = int(kfs[0])
                if ref not in pos:
                    continue
            i = pos[int(ref)]
            pc = old_R[i] @ m.pt_pos[pid] + old_t[i]
            # Sim3 inverse: p_w = (1/s) R^T (p_c - t); s == 1 for stereo
            m.pt_pos[pid] = (R2[i].T @ (pc - t2[i])) / s2[i]
        for k, i in pos.items():
            from ..utils.lie import project_so3_np
            m.kf_pose[k, :3, :3] = project_so3_np(R2[i])
            m.kf_pose[k, :3, 3] = t2[i]

    # ------------------------------------------------------------------
    def global_bundle_adjustment(self, its=10):
        """Optimizer::GlobalBundleAdjustemnt via the Schur LM (full map)."""
        m = self.map
        kids = m.keyframe_ids()
        pids = np.flatnonzero(m.pt_alive)
        if len(kids) < 3 or len(pids) < 30:
            return
        pos_c = {int(k): i for i, k in enumerate(kids)}
        pos_p = {int(p): i for i, p in enumerate(pids)}
        e_cam, e_pt, e_kf, e_slot = [], [], [], []
        for k in kids:
            o = m.kf_obs[k]
            for slot in np.flatnonzero(o >= 0):
                pid = o[slot]
                if m.pt_alive[pid]:
                    e_cam.append(pos_c[int(k)])
                    e_pt.append(pos_p[int(pid)])
                    e_kf.append(int(k))
                    e_slot.append(int(slot))
        E = len(e_cam)
        if E < 50:
            return
        e_cam = np.array(e_cam, np.int32)
        e_pt = np.array(e_pt, np.int32)
        e_kf = np.array(e_kf)
        e_slot = np.array(e_slot)
        kp_ur = m.kf_kp_ur[e_kf, e_slot]
        obs_arr = np.stack([
            m.kf_kp_xy[e_kf, e_slot, 0], m.kf_kp_xy[e_kf, e_slot, 1],
            np.where(kp_ur >= 0, kp_ur, 0.0)], 1).astype(np.float32)
        inv_s2 = (1.0 / self.sigma2)[m.kf_kp_octave[e_kf, e_slot]]
        # bucket every problem dimension (see local_mapping._bucket): a
        # second loop event then reuses the compiled LM program
        from .local_mapping import _bucket
        C_real, P = len(kids), len(pids)
        C_pad = _bucket(C_real, 8)
        P_pad = _bucket(P, 64)
        E_pad = _bucket(E, 256)
        deg = np.bincount(e_pt, minlength=P)
        D = _bucket(int(deg.max()), 4)
        pt_edges = np.full((P_pad, D), -1, np.int32)
        fill = np.zeros(P, np.int64)
        for e in range(E):
            p = e_pt[e]
            pt_edges[p, fill[p]] = e
            fill[p] += 1
        fixed = np.ones(C_pad, bool)
        fixed[1:C_real] = False
        Rs = np.tile(np.eye(3, dtype=np.float32), (C_pad, 1, 1))
        ts = np.zeros((C_pad, 3), np.float32)
        Rs[:C_real] = m.kf_pose[kids, :3, :3]
        ts[:C_real] = m.kf_pose[kids, :3, 3]
        pt_pos = np.zeros((P_pad, 3), np.float32)
        pt_pos[:P] = m.pt_pos[pids]

        def padE(a, fillv=0):
            out = np.full((E_pad,) + a.shape[1:], fillv, a.dtype)
            out[:E] = a
            return out

        R2, t2, p2, outlier = local_ba(
            jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(fixed), jnp.asarray(pt_pos),
            jnp.asarray(padE(e_cam)), jnp.asarray(padE(e_pt)),
            jnp.asarray(padE(obs_arr)), jnp.asarray(padE(kp_ur >= 0)),
            jnp.asarray(padE(inv_s2.astype(np.float32), 1.0)),
            jnp.asarray(padE(np.ones(E, bool))), jnp.asarray(pt_edges),
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy, self.cam.bf,
            its1=5, its2=its)
        R2 = np.asarray(R2); t2 = np.asarray(t2); p2 = np.asarray(p2)
        for i, k in enumerate(kids):
            if not fixed[i]:
                from ..utils.lie import project_so3_np
                m.kf_pose[k, :3, :3] = project_so3_np(R2[i])
                m.kf_pose[k, :3, 3] = t2[i]
        m.pt_pos[pids] = p2[:P]
