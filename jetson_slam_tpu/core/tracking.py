"""Tracking: sensor-agnostic front-end state machine.

Replacement for src/Tracking.cpp: NO_IMAGES_YET / NOT_INITIALIZED / OK / LOST
(Tracking.h:81-87), stereo/RGB-D initialization (Tracking.cpp:663-722),
motion-model tracking (:1030-1115), reference-keyframe fallback (:919-961),
local-map tracking (:1117-1177), keyframe decision (:1180-1264) and creation
(:1266-1344).  Heavy math (projection search, frustum culling, pose
optimization) runs in jitted device programs (core/matcher.py,
core/optimizer.py); graph bookkeeping stays host-side on the MapStore.
"""
from __future__ import annotations

import enum
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import matcher
from .frame import Frame
from .map import MapStore
from .optimizer import pose_optimization, _pose_optimization
from .pnp_solver import pnp_ransac


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


class Tracker:
    def __init__(self, frontend, cam, map_store: MapStore, sensor="stereo",
                 local_mapper=None, min_frames=0, max_frames=None,
                 database=None, map_lock=None, fused=True,
                 pipeline_depth=0):
        self.frontend = frontend
        self.cam = cam
        self.map = map_store
        self.sensor = sensor
        self.local_mapper = local_mapper
        self.database = database  # BoW KeyFrameDatabase for relocalization
        # Map::mMutexMapUpdate analog for the async pipeline (Tracking.cpp:385
        # takes it for the whole Track()); None -> no-op context
        import contextlib
        self._map_lock = map_lock if map_lock is not None \
            else contextlib.nullcontext()
        self.state = TrackingState.NO_IMAGES_YET
        self.velocity = None          # 4x4 Tcl (current-from-last motion)
        self.last_frame: Frame | None = None
        self.ref_kf = -1
        self.last_kf_frame_id = -1
        self.last_reloc_frame_id = -1000000
        self.min_frames = min_frames
        self.max_frames = int(max_frames if max_frames is not None else cam.fps)
        self.th_depth = cam.th_depth * cam.bf / cam.fx  # ThDepth * baseline
        g = frontend.geom
        self.scale_factors = np.asarray(g.scales, np.float32)
        self.log_scale = float(np.log(g.scale_factor))
        self.n_levels = g.n_levels
        self.inv_level_sigma2 = (1.0 / self.scale_factors ** 2).astype(np.float32)
        self.min_x, self.max_x = 0.0, float(g.widths[0])
        self.min_y, self.max_y = 0.0, float(g.heights[0])
        self.trajectory = []  # (ts, Tcw, ref_kf, is_lost, Tcr, ref_kf_gen)
        self.matches_inliers = 0
        # localization-only: never create keyframes / mutate the map
        # (System::ActivateLocalizationMode semantics, working here unlike
        # the reference's every-frame reset quirk, Tracking.cpp:375)
        self.only_tracking = False
        # temp "visual odometry" points attached to the last frame
        self._last_temp_world = None
        self._last_temp_flag = None
        # fused whole-frame device step (core/fused_track.py): one device
        # round-trip per steady-state frame, all sensor modes; keypoint
        # undistortion runs on device for distorted-lens configs.
        self.fused = bool(fused)
        self._spec = None          # speculated local-map candidates (device)
        self._spec_pid = None      # host copy of candidate pids
        self._spec_gen = None      # pt_gen snapshot paired with _spec
        self.fused_frames = 0      # frames tracked via the fused fast path
        # software pipelining over the host<->device link: keep up to
        # pipeline_depth fused dispatches in flight, finishing (pulling +
        # bookkeeping) them FIFO one frame late.  An in-flight frame is
        # dispatched against the newest FINISHED frame's state, so with
        # depth d the motion-model stage matches against the frame d+1
        # back and the pose prediction applies the velocity d+1 times; the
        # search threshold widens accordingly.  depth 0 = classic blocking
        # behavior (identical semantics to the reference).
        self.pipeline_depth = int(pipeline_depth)
        self._inflight = []        # FIFO of pending fused dispatches
        # no-vocabulary relocalization: rotating candidate-window offset
        # so successive LOST frames sweep ALL keyframes (reset on success)
        self._reloc_rr = 0
        # keyframe rows are recycled (core/map.py): if the tracker's
        # reference keyframe is culled, fall back to its spanning-tree
        # parent BEFORE the row can be reused for a different keyframe
        map_store.erase_hooks.append(self._on_kf_erased)

    def prewarm(self, background=True, caps=(128, 256, 512, 1024, 2048)):
        """Compile the fused whole-frame program for every candidate-bucket
        size before the map grows into them (multi-second mid-run compile
        stalls otherwise; disk-cache hits on later sessions).  Runs on a
        daemon thread by default so tracking can start immediately."""
        from .fused_track import prewarm_fused
        mode = self.sensor
        cam_params = (self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                      self.cam.bf, self.cam.bf / self.cam.fx,
                      self.min_x, self.max_x, self.min_y, self.max_y,
                      self.log_scale, self.n_levels)

        def run():
            try:
                prewarm_fused(self.frontend, self.cam, mode,
                              self.scale_factors, self.inv_level_sigma2,
                              cam_params, caps=caps)
            except Exception:  # best-effort: a failed warmup only costs time
                pass

        if not background:
            return run()
        import threading
        t = threading.Thread(target=run, daemon=True, name="fused-prewarm")
        t.start()
        return t

    def _on_kf_erased(self, kid: int):
        if kid == self.ref_kf:
            parent = int(self.map.kf_parent[kid])
            self.ref_kf = parent if parent >= 0 and \
                self.map.kf_alive[parent] else -1

    # ================================================================ api
    def track_stereo(self, left, right, timestamp):
        if self.fused and self.pipeline_depth > 0:
            out = self._track_pipelined((left, right), timestamp, "stereo")
            if out is not None:
                return out
        elif self.fused:
            out = self._dispatch_fused((left, right), timestamp, "stereo")
            if out is not None:
                frame, fused = out
                with self._map_lock:
                    return self._track_locked(frame, fused)
        frame = Frame(self.frontend, self.cam, timestamp, left, right_img=right)
        return self._track(frame)

    def track_rgbd(self, rgb, depth, timestamp):
        if self.fused and self.pipeline_depth > 0:
            out = self._track_pipelined(
                (rgb, np.asarray(depth, np.float32)), timestamp, "rgbd")
            if out is not None:
                return out
        elif self.fused:
            out = self._dispatch_fused(
                (rgb, np.asarray(depth, np.float32)), timestamp, "rgbd")
            if out is not None:
                frame, fused = out
                with self._map_lock:
                    return self._track_locked(frame, fused)
        frame = Frame(self.frontend, self.cam, timestamp, rgb, depth_img=depth)
        return self._track(frame)

    def track_monocular(self, img, timestamp):
        if self.fused and self.pipeline_depth > 0:
            out = self._track_pipelined((img,), timestamp, "mono")
            if out is not None:
                return out
        elif self.fused:
            out = self._dispatch_fused((img,), timestamp, "mono")
            if out is not None:
                frame, fused = out
                with self._map_lock:
                    return self._track_locked(frame, fused)
        frame = Frame(self.frontend, self.cam, timestamp, img)
        return self._track(frame)

    # ------------------------------------------- pipelined fused tracking
    def _track_pipelined(self, imgs, timestamp, mode):
        """Keep up to pipeline_depth fused dispatches in flight: dispatch
        the current frame against the newest FINISHED state, then finish
        (pull + bookkeeping) the oldest in-flight frame.  The tunnel RTT of
        the pull overlaps the in-flight frames' device execution, so the
        steady-state wall time per frame approaches device + host time
        instead of device + host + round-trip.  Returns the (state, frame)
        of the newest FINISHED frame, or None to fall back to the classic
        path for this frame (pipeline flushed first)."""
        pending = self._begin_fused(imgs, timestamp, mode)
        if pending is None:
            self.flush_pipeline()
            return None
        self._inflight.append(pending)
        ret = None
        while len(self._inflight) > self.pipeline_depth:
            ret = self._finish_oldest()
        if ret is not None:
            return ret
        # pipeline still filling: report current state with no frame yet
        return self.state, None

    def _finish_oldest(self):
        pending = self._inflight.pop(0)
        frame, fz = self._finish_fused(pending)
        with self._map_lock:
            return self._track_locked(frame, fz)

    def flush_pipeline(self):
        """Finish every in-flight fused dispatch (FIFO).  Returns the last
        (state, frame) finished, or None if the pipeline was empty."""
        ret = None
        while self._inflight:
            ret = self._finish_oldest()
        return ret

    # =============================================================== core
    def _track(self, frame: Frame):
        # frame construction (the fused device front-end) already happened
        # OUTSIDE the lock; graph reads/writes happen inside it
        with self._map_lock:
            return self._track_locked(frame)

    def _track_locked(self, frame: Frame, fused=None):
        if self.local_mapper is not None:
            self.local_mapper.tick()
        if self.state == TrackingState.NO_IMAGES_YET:
            self.state = TrackingState.NOT_INITIALIZED

        if self.state == TrackingState.NOT_INITIALIZED:
            if self.sensor == "mono":
                self._monocular_initialization(frame)
            else:
                self._stereo_initialization(frame)
        else:
            ok = False
            if self.state == TrackingState.OK and fused is not None and \
                    fused.n_match >= 20 and fused.n_map1 >= 10:
                # fused whole-frame step succeeded on device; apply both
                # stages' results (motion-model semantics already verified
                # inside the program, Tracking.cpp:1070/1110 gates above)
                self._apply_last_matches(frame, fused.m,
                                         snapshot=fused.last_snap)
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = fused.R1
                T[:3, 3] = fused.t1
                frame.set_pose(T)
                frame.outlier = (fused.m >= 0) & ~fused.inl1
                frame.ref_kf = self.ref_kf
                ok = self._consume_fused_local(frame, fused)
            else:
                if self.state == TrackingState.OK:
                    if self.velocity is None or \
                            frame.frame_id < self.last_reloc_frame_id + 2:
                        ok = self._track_reference_keyframe(frame)
                    else:
                        ok = (fused is None and
                              self._track_with_motion_model(frame))
                        if not ok:
                            ok = self._track_reference_keyframe(frame)
                else:
                    ok = self._relocalization(frame)

                frame.ref_kf = self.ref_kf
                if ok:
                    ok = self._track_local_map(frame)
            self.state = TrackingState.OK if ok else TrackingState.LOST

            if ok:
                if self.last_frame is not None and self.last_frame.pose_set:
                    last_twc = self.last_frame.Twc
                    self.velocity = frame.Tcw @ last_twc
                else:
                    self.velocity = None
                # drop outlier associations (Tracking.cpp:608-618)
                out = frame.outlier & (frame.map_points >= 0)
                frame.map_points[out] = -1
                frame.outlier[:] = False
                if self._need_new_keyframe(frame):
                    self._create_new_keyframe(frame)

        # relative pose to the reference KF, so UpdateLastFrame can re-anchor
        # the last frame after BA moves the KF (Tracking.cpp:642-658 stores
        # mlRelativeFramePoses; UpdateLastFrame applies Tlr * pRef->GetPose())
        ref = getattr(frame, "ref_kf", -1)
        if frame.pose_set and ref is not None and ref >= 0:
            self._last_rel_pose = (
                frame.Tcw @ np.linalg.inv(self.map.kf_pose[ref])).astype(
                    np.float32)
        else:
            self._last_rel_pose = None
        if frame.pose_set:
            # store T_frame<-refKF like mlRelativeFramePoses, so loop-closure
            # / GBA corrections of keyframe poses propagate into the saved
            # trajectory (System.cpp:360-389 reconstructs Tcw = Tcr * Trw at
            # save time); keep the absolute pose as fallback for dead refs
            ref_gen = int(self.map.kf_gen[ref]) if ref is not None and \
                ref >= 0 else -1  # guards the chain against kf-row recycling
            self.trajectory.append(
                (frame.timestamp, frame.Tcw.copy(), frame.ref_kf,
                 self.state == TrackingState.LOST, self._last_rel_pose,
                 ref_gen))
        self.last_frame = frame
        if self.fused and self.state == TrackingState.OK:
            self._speculate_candidates(frame)
        else:
            self._spec = None
        return self.state, frame

    # ============================================== fused whole-frame step
    def _fused_preconditions(self):
        return (self.state == TrackingState.OK
                and self.velocity is not None
                and self.last_frame is not None
                and self.last_frame.pose_set
                and self._spec is not None
                and Frame._next_id >= self.last_reloc_frame_id + 2)

    def _dispatch_fused(self, imgs, timestamp, mode):
        """Prepare inputs under the map lock, then run the whole tracking
        step as ONE device program with ONE pull (core/fused_track.py).
        Returns (frame, FusedTrackResult) or None when preconditions fail."""
        pending = self._begin_fused(imgs, timestamp, mode)
        if pending is None:
            return None
        return self._finish_fused(pending)

    def _begin_fused(self, imgs, timestamp, mode):
        """Input prep (under the map lock) + non-blocking device dispatch.
        Returns a pending dict for _finish_fused, or None when the fused
        preconditions fail."""
        from .fused_track import fused_track_dispatch
        with self._map_lock:
            if not self._fused_preconditions():
                return None
            self._update_last_frame()
            lf = self.last_frame
            m = self.map
            # with frames in flight the last FINISHED frame is `steps`
            # frames back: apply the velocity that many times
            steps = 1 + len(self._inflight)
            pred = lf.Tcw
            for _ in range(steps):
                pred = self.velocity @ pred
            pred = pred.astype(np.float32)
            pw, has_pt, alive = self._last_frame_points()
            last_state = {
                "pw": pw, "has_pt": has_pt, "real": alive,
                "pid": np.where(alive, lf.map_points, -1).astype(np.int32),
                "octave": lf.dev("octave"), "angle": lf.dev("angle"),
                "desc": lf.dev("desc"), "ur": lf.dev("u_right"),
            }
            # generation snapshot of the last frame's pids, taken while the
            # positions above are read: _alloc_pt recycles culled pids, so
            # a pid culled + reallocated by the concurrent mapper during
            # the unlocked dispatch/pull window would otherwise pass the
            # pt_alive recheck in _consume_fused_local while referring to a
            # different physical point
            last_gen = m.pt_gen[np.maximum(lf.map_points, 0)].copy()
            # refresh the speculated candidates with the CURRENT map state:
            # speculation ran at the end of the previous frame, and the
            # mapper's BA/fuse may have moved or culled points since.  The
            # re-upload is gated on the map's coarse version counter — on a
            # ~24 ms-RTT link, unconditional per-frame uploads of the seven
            # candidate arrays dominate the frame time, and between mapper
            # commits the speculated copies are exact.  The pids stay those
            # chosen at speculation; recycled pids (gen mismatch) drop out
            # of the alive mask, and the gen snapshot is re-taken to pair
            # with the re-read data.
            if m.version != self._spec_version:
                self._spec_version = m.version
                sidx = self._spec_pid
                fresh = (self._spec_alive & m.pt_alive[sidx]
                         & (m.pt_gen[sidx] == self._spec_gen))
                self._spec_alive = fresh
                self._spec_gen = m.pt_gen[sidx].copy()
                cand = dict(self._spec)
                cand.update(
                    pos=jnp.asarray(m.pt_pos[sidx]),
                    normal=jnp.asarray(m.pt_normal[sidx]),
                    maxd=jnp.asarray(m.pt_max_dist[sidx]),
                    mind=jnp.asarray(m.pt_min_dist[sidx]),
                    desc=jnp.asarray(m.pt_desc[sidx]),
                    alive=jnp.asarray(fresh),
                    pid=jnp.asarray(
                        np.where(fresh, sidx, -1).astype(np.int32)),
                )
                self._spec = cand
            cand = self._spec
        # device dispatch runs OUTSIDE the lock so the async mapping worker
        # overlaps (core/pipeline.py); the pull happens in _finish_fused
        mb = self.cam.bf / self.cam.fx
        tz = float((pred @ lf.Twc)[2, 3])
        # widen the motion-model window with the prediction horizon
        th = (7.0 if mode in ("stereo", "rgbd") else 15.0) * steps
        mono = mode == "mono"
        arrays, dev_cache = fused_track_dispatch(
            self.frontend, self.cam, imgs, mode, self.cam.bf, mb, pred,
            last_state, cand, min(th, 21.0), 1.0, self.scale_factors,
            self.inv_level_sigma2,
            (self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy, self.cam.bf,
             mb, self.min_x, self.max_x, self.min_y, self.max_y,
             self.log_scale, self.n_levels),
            forward=(not mono) and tz > mb,
            backward=(not mono) and -tz > mb)
        # snapshot the DISPATCH-time last frame's slot associations: fz.m
        # indexes THIS frame's slots, but with pipeline_depth>0 the finish
        # runs one-to-depth frames later, when self.last_frame (and the
        # _last_temp_* buffers _update_last_frame rewrites) have moved on.
        # _apply_last_matches must read the snapshot, not finish-time state,
        # or same-generation wrong pids pass the gen filter and pollute the
        # map (see also last_gen above, which pairs with these map_points).
        last_snap = dict(
            map_points=lf.map_points.copy(),
            temp_flag=(None if self._last_temp_flag is None
                       else self._last_temp_flag.copy()),
            temp_world=(None if self._last_temp_world is None
                        else self._last_temp_world.copy()))
        return dict(arrays=arrays, dev_cache=dev_cache, timestamp=timestamp,
                    last_gen=last_gen, spec_gen=self._spec_gen,
                    spec_pid=self._spec_pid, last_snap=last_snap)

    def _finish_fused(self, pending):
        """Block on a _begin_fused dispatch and build the Frame + result."""
        from .fused_track import fused_track_pull
        pulled, dev_cache, fz = fused_track_pull(
            pending["arrays"], pending["dev_cache"])
        (valid, xs, ys, octave, angle, response, desc, u_r, depth) = pulled
        frame = Frame.from_arrays(
            self.frontend, self.cam, pending["timestamp"], valid, xs, ys,
            octave, angle, response, desc, u_right=u_r, depth=depth,
            dev_cache=dev_cache)
        fz.last_gen = pending["last_gen"]
        fz.spec_gen = pending["spec_gen"]
        fz.spec_pid = pending["spec_pid"]
        fz.last_snap = pending["last_snap"]
        return frame, fz

    def _consume_fused_local(self, frame: Frame, fz):
        """Apply the fused step's local-map stage results: the post-pull half
        of _track_local_map (bookkeeping, gates) with device outputs already
        in hand."""
        m = self.map
        # staleness filter FIRST: the dispatch/pull window ran without the
        # map lock, so the mapper may have culled points since their data
        # was uploaded — and _alloc_pt recycles pids, so pt_alive alone
        # cannot detect reuse.  Compare against the generation snapshots
        # taken when the data was captured (last frame: at dispatch;
        # candidates: at speculation/refresh).  Running this before the
        # covisibility vote keeps recycled impostor pids from voting for
        # local keyframes or collecting visible/found counters.
        exp_gen = np.full(frame.n_slots, -1, np.int64)
        cur_m = np.flatnonzero(fz.m >= 0)
        exp_gen[cur_m] = fz.last_gen[fz.m[cur_m]]
        mp = frame.map_points
        stale = (mp >= 0) & (~m.pt_alive[np.maximum(mp, 0)] |
                             (m.pt_gen[np.maximum(mp, 0)] != exp_gen))
        mp[stale] = -1
        # reference-KF vote on the motion-model matches (classic semantics:
        # UpdateLocalKeyFrames runs before the local search)
        local_kfs = self._local_keyframes(frame)
        if len(local_kfs) == 0:
            return False
        cur_pids = frame.map_points[frame.map_points >= 0]
        m.pt_visible[cur_pids] += 1
        frame.temp_flag = np.zeros(frame.n_slots, bool)  # temp VO pts drop
        # the candidate set the DISPATCH saw — in pipelined mode
        # speculation may have re-picked self._spec_pid since
        cand_pid = fz.spec_pid
        ok_pid = cand_pid[fz.ok]
        ok_fresh = m.pt_alive[ok_pid] & (m.pt_gen[ok_pid] == fz.spec_gen[fz.ok])
        m.pt_visible[ok_pid[ok_fresh]] += 1
        cur = np.flatnonzero(fz.sel >= 0)
        sel_pid = cand_pid[fz.sel[cur]]
        sel_fresh = m.pt_alive[sel_pid] & \
            (m.pt_gen[sel_pid] == fz.spec_gen[fz.sel[cur]])
        frame.map_points[cur[sel_fresh]] = sel_pid[sel_fresh]
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = fz.R2
        T[:3, 3] = fz.t2
        frame.set_pose(T)
        frame.outlier = (frame.map_points >= 0) & ~fz.inl2
        self.fused_frames += 1
        # identical tail to _track_local_map
        has = (frame.map_points >= 0) & ~frame.outlier
        m.pt_found[frame.map_points[has]] += 1
        self.matches_inliers = int(
            (has & (m.pt_nobs[np.maximum(frame.map_points, 0)] > 0)).sum())
        if frame.frame_id < self.last_reloc_frame_id + self.max_frames and \
                self.matches_inliers < 50:
            return False
        return self.matches_inliers >= 10

    def _speculate_candidates(self, frame: Frame):
        """Upload next frame's local-map candidate set: points observed by
        the keyframes covisible with THIS frame's final associations.  The
        classic path re-votes on the next frame's motion matches
        (Tracking::UpdateLocalKeyFrames); consecutive frames share almost
        all associations, so this one-frame-stale candidate set plus the
        on-device in-frame exclusion (fused_track.py) reproduces the same
        search set in practice."""
        m = self.map
        local_kfs = self._vote_local_kfs(frame)
        if len(local_kfs) == 0:
            self._spec = None
            return
        obs = m.kf_obs[local_kfs]
        cand = np.unique(obs[obs >= 0])
        cand = cand[m.pt_alive[cand]]
        if len(cand) == 0:
            self._spec = None
            return
        # identical candidate set + unchanged map: the device copies from
        # the previous frame are exact — skip the seven re-uploads (each
        # host->device transfer pays this environment's tunnel round-trip)
        if (self._spec is not None and m.version == self._spec_version
                and len(cand) <= len(self._spec_pid)
                and np.array_equal(
                    cand, self._spec_pid[self._spec_alive])):
            return
        # same power-of-two bucketing as _track_local_map (bounds recompiles)
        cap = 1 << max(int(np.ceil(np.log2(max(len(cand), 128)))), 7)
        pad = cap - len(cand)
        idx = np.concatenate([cand, np.zeros(pad, np.int64)])
        alive = np.concatenate([np.ones(len(cand), bool),
                                np.zeros(pad, bool)])
        self._spec_pid = idx.astype(np.int32)
        # generation snapshot paired with the uploaded point data (see
        # _consume_fused_local's staleness check)
        self._spec_gen = m.pt_gen[idx].copy()
        self._spec_alive = alive
        self._spec_version = m.version
        self._spec = {
            "pos": jnp.asarray(m.pt_pos[idx]),
            "normal": jnp.asarray(m.pt_normal[idx]),
            "maxd": jnp.asarray(m.pt_max_dist[idx]),
            "mind": jnp.asarray(m.pt_min_dist[idx]),
            "desc": jnp.asarray(m.pt_desc[idx]),
            "alive": jnp.asarray(alive),
            "pid": jnp.asarray(np.where(alive, idx, -1).astype(np.int32)),
        }

    # ==================================================== initialization
    def _stereo_initialization(self, frame: Frame):
        """Tracking::StereoInitialization (Tracking.cpp:663-722)."""
        n_kp = int(frame.valid.sum())
        if n_kp <= 500 * 0:  # reference gate is 500; tile budget caps counts,
            pass             # so we gate on a fraction of slots instead
        if n_kp < max(50, 0.02 * frame.n_slots):
            return
        frame.set_pose(np.eye(4, dtype=np.float32))
        kid = self.map.add_keyframe(frame)
        slots = np.flatnonzero((frame.depth > 0) & frame.valid)
        if len(slots) < 20:
            self.map.erase_keyframe(kid, force=True)  # roll back failed init
            return
        pw = frame.unproject_stereo_batch(slots)
        for slot, pos in zip(slots, pw):
            pid = self.map.add_point(pos, frame.desc[slot], kid)
            self.map.add_observation(kid, slot, pid)
            frame.map_points[slot] = pid
            self.map.init_point_single_obs(pid, kid, slot,
                                           self.scale_factors, self.n_levels)
        self.ref_kf = kid
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kid)

    # ==================================================== mono init
    def _monocular_initialization(self, frame: Frame):
        """Tracking::MonocularInitialization + CreateInitialMapMonocular
        (Tracking.cpp:724-917): two-view H/F initialization, map scaled to
        unit median scene depth."""
        min_kp = max(50, 0.02 * frame.n_slots)  # reference gate is 100
        init_ref = getattr(self, "_mono_init_ref", None)
        if init_ref is None or frame.valid.sum() < min_kp:
            if frame.valid.sum() >= min_kp:
                self._mono_init_ref = frame
            return
        from . import matcher as M
        from .initializer import MonoInitializer
        ref = init_ref
        match, _ = M.match_brute_force(
            jnp.asarray(ref.desc), jnp.asarray(ref.valid),
            jnp.asarray(ref.angle),
            jnp.asarray(frame.desc), jnp.asarray(frame.valid),
            jnp.asarray(frame.angle), nn_ratio=0.9)
        match = np.asarray(match)
        s_ref = np.flatnonzero(match >= 0)
        if len(s_ref) < 50:
            self._mono_init_ref = frame
            return
        s_cur = match[s_ref]
        init = MonoInitializer(self.cam.fx, self.cam.fy, self.cam.cx,
                               self.cam.cy)
        ok, R21, t21, X, good = init.initialize(
            ref.kp_xy[s_ref], frame.kp_xy[s_cur],
            np.ones(len(s_ref), bool))
        if not ok:
            return
        # scale to unit median depth (CreateInitialMapMonocular semantics:
        # invMedianDepth applied to pose translation and points)
        z = X[good, 2]
        med = float(np.median(z)) if len(z) else 1.0
        if med <= 0:
            return
        X = X / med
        t21 = t21 / med
        ref.set_pose(np.eye(4, dtype=np.float32))
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = R21
        T2[:3, 3] = t21
        frame.set_pose(T2)
        kid1 = self.map.add_keyframe(ref)
        kid2 = self.map.add_keyframe(frame)
        for i in np.flatnonzero(good):
            pid = self.map.add_point(X[i], frame.desc[s_cur[i]], kid2)
            self.map.add_observation(kid1, int(s_ref[i]), pid)
            self.map.add_observation(kid2, int(s_cur[i]), pid)
            self.map.compute_distinctive_descriptor(pid)
            self.map.update_normal_and_depth(pid, self.scale_factors,
                                             self.n_levels)
            frame.map_points[s_cur[i]] = pid
        self.ref_kf = kid2
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kid1)
            self.local_mapper.insert_keyframe(kid2)

    # ================================================== motion model
    def _update_last_frame(self):
        """Tracking::UpdateLastFrame: refresh pose from ref KF + spawn temp VO
        points for close stereo depths (Tracking.cpp:963-1027)."""
        lf = self.last_frame
        # re-anchor the last frame to its (possibly BA-corrected) ref KF:
        # mLastFrame.SetPose(Tlr * pRef->GetPose()) (Tracking.cpp:967-974)
        ref = getattr(lf, "ref_kf", -1)
        rel = getattr(self, "_last_rel_pose", None)
        if rel is not None and ref is not None and ref >= 0 and \
                self.map.kf_alive[ref]:
            lf.set_pose((rel @ self.map.kf_pose[ref]).astype(np.float32))
        # temp points: slots with depth in (0, th_depth] and no map point
        depth = lf.depth
        close = (depth > 0) & lf.valid
        if close.sum() == 0:
            self._last_temp_world = None
            self._last_temp_flag = None
            return
        order = np.argsort(np.where(close, depth, np.inf))
        n_close = int(((depth > 0) & (depth < self.th_depth) & lf.valid).sum())
        n_take = max(min(100, int(close.sum())), n_close)
        chosen = order[:n_take]
        need = chosen[(lf.map_points[chosen] < 0)]
        temp_flag = np.zeros(lf.n_slots, bool)
        temp_world = np.zeros((lf.n_slots, 3), np.float32)
        if len(need):
            temp_flag[need] = True
            temp_world[need] = lf.unproject_stereo_batch(need)
        self._last_temp_world = temp_world
        self._last_temp_flag = temp_flag

    def _last_frame_points(self):
        """World positions / masks of the last frame's associations incl.
        temp VO points — the motion-model search inputs, shared by the
        classic step and the fused dispatch."""
        lf = self.last_frame
        m = self.map
        has_real = lf.map_points >= 0
        pw = np.zeros((lf.n_slots, 3), np.float32)
        pw[has_real] = m.pt_pos[lf.map_points[has_real]]
        alive = np.zeros(lf.n_slots, bool)
        alive[has_real] = m.pt_alive[lf.map_points[has_real]]
        has_pt = alive.copy()
        if self._last_temp_flag is not None:
            has_pt |= self._last_temp_flag
            tf = self._last_temp_flag
            pw[tf] = self._last_temp_world[tf]
        return pw, has_pt, alive

    def _track_with_motion_model(self, frame: Frame):
        """Tracking::TrackWithMotionModel (Tracking.cpp:1030-1115)."""
        self._update_last_frame()
        lf = self.last_frame
        frame.set_pose(self.velocity @ lf.Tcw)

        pw, has_pt, alive = self._last_frame_points()
        last_real = alive
        th = 7.0 if self.sensor in ("stereo", "rgbd") else 15.0
        tlc = (frame.Tcw @ lf.Twc)[:3, 3]
        mb = self.cam.bf / self.cam.fx
        forward = tlc[2] > mb and self.sensor != "mono"
        backward = -tlc[2] > mb and self.sensor != "mono"
        import jax
        res = matcher.motion_model_track(
            jnp.asarray(frame.Rcw), jnp.asarray(frame.tcw),
            jnp.asarray(pw), jnp.asarray(has_pt), jnp.asarray(last_real),
            lf.dev("octave"), lf.dev("angle"),
            lf.dev("desc"), lf.dev("u_right"),
            frame.dev("kp_xy"), frame.dev("octave"),
            frame.dev("angle"), frame.dev("desc"),
            frame.dev("valid"), frame.dev("u_right"),
            float(th), self.scale_factors, self.inv_level_sigma2,
            self.n_levels,
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy, self.cam.bf,
            mb, self.min_x, self.max_x, self.min_y, self.max_y,
            bool(forward), bool(backward))
        match_slot, n, R, t, inlier, n_map = jax.device_get(res)  # ONE pull
        if n < 20:
            return False
        self._apply_last_matches(frame, match_slot)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        frame.set_pose(T)
        frame.outlier = (match_slot >= 0) & ~inlier
        return int(n_map) >= 10

    def _apply_last_matches(self, frame, match_slot, snapshot=None):
        """match_slot: per-current-slot index into last-frame slots.

        snapshot (fused pipelined path): the dispatch-time last frame's
        {map_points, temp_flag, temp_world} — match_slot indexes THOSE
        slots, which with frames in flight are not self.last_frame's."""
        if snapshot is not None:
            lf_map_points = snapshot["map_points"]
            temp_flag = snapshot["temp_flag"]
            temp_world = snapshot["temp_world"]
        else:
            lf_map_points = self.last_frame.map_points
            temp_flag = self._last_temp_flag
            temp_world = self._last_temp_world
        cur = np.flatnonzero(match_slot >= 0)
        last_slots = match_slot[cur]
        pids = lf_map_points[last_slots]
        frame.map_points[:] = -1
        frame.temp_world = np.zeros((frame.n_slots, 3), np.float32)
        frame.temp_flag = np.zeros(frame.n_slots, bool)
        real = pids >= 0
        frame.map_points[cur[real]] = pids[real]
        if temp_flag is not None:
            is_temp = temp_flag[last_slots]
            frame.temp_flag[cur[is_temp]] = True
            frame.temp_world[cur[is_temp]] = temp_world[last_slots[is_temp]]

    # ================================================== pose refinement
    def _optimize_pose(self, frame: Frame):
        """PoseOptimization wrapper; returns #inliers with real map points."""
        has_real = frame.map_points >= 0
        temp_flag = getattr(frame, "temp_flag", None)
        has_any = has_real.copy()
        pts = np.zeros((frame.n_slots, 3), np.float32)
        pts[has_real] = self.map.pt_pos[frame.map_points[has_real]]
        if temp_flag is not None:
            has_any |= temp_flag
            pts[temp_flag] = frame.temp_world[temp_flag]
        if has_any.sum() < 3:
            return 0
        inv_s2 = self.inv_level_sigma2[frame.octave]
        import jax
        R, t, inlier, _ = pose_optimization(
            jnp.asarray(frame.Rcw), jnp.asarray(frame.tcw), jnp.asarray(pts),
            frame.dev("kp_xy"), frame.dev("u_right"),
            jnp.asarray(inv_s2), jnp.asarray(has_any),
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy, self.cam.bf)
        R, t, inlier = jax.device_get((R, t, inlier))  # one batched pull
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        frame.set_pose(T)
        frame.outlier = has_any & ~inlier
        return int((inlier & has_real).sum())

    # ================================================== reference KF
    def _track_reference_keyframe(self, frame: Frame):
        """Tracking::TrackReferenceKeyFrame (Tracking.cpp:919-961)."""
        if self.ref_kf < 0:
            return False
        kid = self.ref_kf
        m = self.map
        match, _ = matcher.match_brute_force(
            frame.dev("desc"), frame.dev("valid"),
            frame.dev("angle"),
            jnp.asarray(m.kf_desc[kid]),
            jnp.asarray(m.kf_kp_valid[kid] & (m.kf_obs[kid] >= 0)),
            jnp.asarray(m.kf_kp_angle[kid]), nn_ratio=0.7)
        match = np.asarray(match)
        cur = np.flatnonzero(match >= 0)
        pids = m.kf_obs[kid][match[cur]]
        good = (pids >= 0)
        good[good] &= m.pt_alive[pids[good]]
        if good.sum() < 15:
            return False
        frame.map_points[:] = -1
        frame.map_points[cur[good]] = pids[good]
        frame.temp_flag = np.zeros(frame.n_slots, bool)
        frame.temp_world = np.zeros((frame.n_slots, 3), np.float32)
        if self.last_frame is not None and self.last_frame.pose_set:
            frame.set_pose(self.last_frame.Tcw)
        else:
            frame.set_pose(np.eye(4, dtype=np.float32))
        n_map = self._optimize_pose(frame)
        return n_map >= 10

    # ================================================== local map
    def _vote_local_kfs(self, frame):
        """Covisibility vote over the frame's current associations
        (Tracking::UpdateLocalKeyFrames core): keyframes observing the
        frame's map points, best-first, plus top-10 covisible neighbors of
        the top-20, capped at 80.  Shared by the classic local-map step
        (_local_keyframes) and next-frame candidate speculation."""
        m = self.map
        has = frame.map_points >= 0
        pids = frame.map_points[has]
        pids = pids[m.pt_alive[pids]]
        if len(pids) == 0:
            return np.array([], np.int64)
        seen = np.zeros(m.max_points, bool)
        seen[pids] = True
        K = m._next_kf  # allocated rows only (ids are never reused)
        tab = m.kf_obs[:K]
        votes = (seen[np.where(tab >= 0, tab, 0)] & (tab >= 0)).sum(1)
        votes = votes * m.kf_alive[:K]
        local = np.flatnonzero(votes > 0)
        if len(local) == 0:
            return np.array([], np.int64)
        local = local[np.argsort(-votes[local], kind="stable")]
        out = list(local[:80])
        neighbors = m.covisible_neighbors_batch(local[:20], n=10)
        for neigh in neighbors:
            for nk in neigh:
                if nk not in out:
                    out.append(int(nk))
                    if len(out) >= 80:
                        break
            if len(out) >= 80:
                break
        return np.asarray(out, np.int64)

    def _local_keyframes(self, frame):
        """Tracking::UpdateLocalKeyFrames (vote + reference-KF update)."""
        out = self._vote_local_kfs(frame)
        if len(out):
            self.ref_kf = int(out[0])  # highest-vote keyframe
            frame.ref_kf = self.ref_kf
        return out

    def _track_local_map(self, frame: Frame):
        """Tracking::TrackLocalMap + SearchLocalPoints (Tracking.cpp:1117-1806)."""
        m = self.map
        local_kfs = self._local_keyframes(frame)
        if len(local_kfs) == 0:
            return False
        obs = m.kf_obs[local_kfs]
        pids = np.unique(obs[obs >= 0])
        pids = pids[m.pt_alive[pids]]
        in_frame = np.zeros(m.max_points, bool)
        cur_pids = frame.map_points[frame.map_points >= 0]
        in_frame[cur_pids] = True
        m.pt_visible[cur_pids] += 1
        cand = pids[~in_frame[pids]]
        frame.temp_flag = np.zeros(frame.n_slots, bool)  # temp VO pts drop here
        if len(cand):
            import jax
            cap = 1 << max(int(np.ceil(np.log2(max(len(cand), 128)))), 7)
            pad = cap - len(cand)
            idx = np.concatenate([cand, np.zeros(pad, np.int64)])
            alive = np.concatenate([np.ones(len(cand), bool), np.zeros(pad, bool)])
            exist_has = frame.map_points >= 0
            exist_pts = np.zeros((frame.n_slots, 3), np.float32)
            exist_pts[exist_has] = m.pt_pos[frame.map_points[exist_has]]
            th = 5.0 if frame.frame_id < self.last_reloc_frame_id + 2 else 1.0
            # ONE fused device program: frustum + projection search + pose
            # optimization, one batched pull
            ok, sel, R, t, inlier, n_map = jax.device_get(
                matcher.local_map_track(
                    jnp.asarray(m.pt_pos[idx]), jnp.asarray(m.pt_normal[idx]),
                    jnp.asarray(m.pt_max_dist[idx]),
                    jnp.asarray(m.pt_min_dist[idx]),
                    jnp.asarray(m.pt_desc[idx]), jnp.asarray(alive),
                    jnp.asarray(frame.Rcw), jnp.asarray(frame.tcw),
                    jnp.asarray(frame.camera_center),
                    frame.dev("kp_xy"), frame.dev("octave"),
                    frame.dev("desc"), frame.dev("valid"),
                    frame.dev("u_right"), jnp.asarray(~exist_has),
                    jnp.asarray(exist_pts), jnp.asarray(exist_has),
                    jnp.asarray(exist_has),
                    float(th), self.scale_factors, self.inv_level_sigma2,
                    self.n_levels,
                    self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                    self.cam.bf, self.min_x, self.max_x, self.min_y,
                    self.max_y, self.log_scale))
            m.pt_visible[idx[ok]] += 1
            cur = np.flatnonzero(sel >= 0)
            frame.map_points[cur] = idx[sel[cur]]
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = t
            frame.set_pose(T)
            frame.outlier = (frame.map_points >= 0) & ~inlier
            n_map = int(n_map)
        else:
            n_map = self._optimize_pose(frame)
        # bookkeeping: found counts for inlier observations
        has = (frame.map_points >= 0) & ~frame.outlier
        m.pt_found[frame.map_points[has]] += 1
        self.matches_inliers = int(
            (has & (m.pt_nobs[np.maximum(frame.map_points, 0)] > 0)).sum())
        if frame.frame_id < self.last_reloc_frame_id + self.max_frames and \
                self.matches_inliers < 50:
            return False
        return self.matches_inliers >= 10  # reference uses 30; tile budget
        # keeps slot counts lower than ORB-SLAM2's 1000+ features, so the
        # inlier floor scales down accordingly.

    # ================================================== keyframe policy
    def _need_new_keyframe(self, frame: Frame):
        """Tracking::NeedNewKeyFrame (Tracking.cpp:1180-1264)."""
        if self.only_tracking:
            return False
        m = self.map
        if not m.kf_capacity_left():
            # keyframe table saturated faster than culling frees rows:
            # degrade to tracking-only for this frame instead of raising
            # (the reference's heap never hits this; our fixed capacity can)
            return False
        n_kfs = m.n_keyframes()
        if frame.frame_id < self.last_reloc_frame_id + self.max_frames and \
                n_kfs > self.max_frames:
            return False
        min_obs = 3 if n_kfs > 2 else 2
        n_ref_matches = m.tracked_points_in_kf(self.ref_kf, min_obs) \
            if self.ref_kf >= 0 else 0
        idle = self.local_mapper.accepting() if self.local_mapper else True

        n_tracked_close = 0
        n_nontracked_close = 0
        if self.sensor != "mono":
            close = (frame.depth > 0) & (frame.depth < self.th_depth) & frame.valid
            tracked = (frame.map_points >= 0) & ~frame.outlier
            n_tracked_close = int((close & tracked).sum())
            n_nontracked_close = int((close & ~tracked).sum())
        # reference constants 100/70 (Tracking.cpp:1221) assume ~1000-3000
        # features/frame; our NMS-G tile budget caps slots lower, so the
        # thresholds scale with the budget
        scale = min(1.0, frame.n_slots / 2000.0)
        need_close = (n_tracked_close < 100 * scale) and \
            (n_nontracked_close > 70 * scale)

        th_ref = 0.75 if n_kfs >= 2 else 0.4
        if self.sensor == "mono":
            th_ref = 0.9
        c1a = frame.frame_id >= self.last_kf_frame_id + self.max_frames
        c1b = frame.frame_id >= self.last_kf_frame_id + self.min_frames and idle
        c1c = self.sensor != "mono" and \
            (self.matches_inliers < n_ref_matches * 0.25 or need_close)
        c2 = (self.matches_inliers < n_ref_matches * th_ref or need_close) and \
            self.matches_inliers > 15
        if (c1a or c1b or c1c) and c2:
            if idle:
                return True
            if self.local_mapper is not None:
                self.local_mapper.interrupt_ba()
                if self.sensor != "mono":
                    return self.local_mapper.queue_len() < 3
            return False
        return False

    def _create_new_keyframe(self, frame: Frame):
        """Tracking::CreateNewKeyFrame (Tracking.cpp:1266-1344)."""
        m = self.map
        kid = m.add_keyframe(frame)
        self.ref_kf = kid
        frame.ref_kf = kid
        if self.sensor != "mono":
            # close-point spawn, vectorized (Tracking.cpp:1301-1332): walk
            # slots by increasing depth; every slot counts toward n_points
            # whether created or pre-tracked, and the walk stops at the
            # first slot with depth > th once n_points > 100 — so the
            # processed prefix is order[:J] with J = first index >= 100
            # whose depth exceeds th (the loop's j-th iteration has
            # n_points = j+1)
            depth = frame.depth
            valid_d = (depth > 0) & frame.valid
            order = np.argsort(np.where(valid_d, depth, np.inf))
            n_valid = int(valid_d.sum())
            order = order[:n_valid]
            far = depth[order] > self.th_depth
            far[:100] = False
            # the loop breaks AFTER processing the triggering slot, so the
            # processed prefix is inclusive of it
            J = int(np.argmax(far)) + 1 if far.any() else n_valid
            sel = order[:J]
            pid0 = frame.map_points[sel]
            dead = (pid0 < 0) | ~m.pt_alive[np.maximum(pid0, 0)] | \
                (m.pt_nobs[np.maximum(pid0, 0)] < 1)
            create = sel[dead]
            if len(create):
                pos = frame.unproject_stereo_batch(create)
                pids = m.add_points_batch(kid, create, pos,
                                          self.scale_factors, self.n_levels)
                frame.map_points[create] = pids
        self.last_kf_frame_id = frame.frame_id
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kid)

    # ================================================== relocalization
    RELOC_MAX_CANDIDATES = 8  # one compiled shape; DB rarely returns more

    def _relocalization(self, frame: Frame):
        """Tracking::Relocalization (Tracking.cpp:1954-2115): BoW candidate
        keyframes (KeyFrameDatabase) -> descriptor matching -> PnP RANSAC ->
        pose optimization.  Falls back to the most recent keyframes when no
        vocabulary/database is configured.

        All candidates ride ONE device program (matching, PnP RANSAC, and
        pose LM vmapped over the padded candidate axis), so relocalization
        costs one round-trip regardless of candidate count — the per-
        candidate loop was a ~0.5-1 s stall at this environment's ~24 ms
        tunnel RTT."""
        m = self.map
        kfs = []
        if self.database is not None:
            kfs = self.database.detect_relocalization_candidates(
                frame.desc[frame.valid], m)
            kfs = [int(k) for k in kfs if m.kf_alive[k]]
        if len(kfs) < self.RELOC_MAX_CANDIDATES:
            # fill the remaining slots by ROTATING a window across ALL
            # keyframes on successive LOST frames (recent-first on the
            # first attempt).  A fixed "most recent" fallback never
            # proposes older map regions — measured to leave the tracker
            # LOST forever while staring at mapped territory on multi-lap
            # sequences; the rotation also backstops weak BoW recall.
            ids = [int(k) for k in m.keyframe_ids()][::-1]  # recent first
            if len(ids) > self.RELOC_MAX_CANDIDATES:
                off = (self._reloc_rr * self.RELOC_MAX_CANDIDATES) \
                    % len(ids)
                ids = ids[off:] + ids[:off]
                self._reloc_rr += 1
            seen = set(kfs)
            kfs = kfs + [k for k in ids if k not in seen]
        if not kfs:
            return False
        C = self.RELOC_MAX_CANDIDATES
        if len(kfs) > C:
            # the reference tries every candidate (Tracking.cpp:1973-2115);
            # the one-dispatch batch is capped to keep ONE compiled shape —
            # surface the truncation instead of silently dropping
            import logging
            logging.getLogger("jetson_slam_tpu").info(
                "relocalization: %d candidates truncated to %d",
                len(kfs), C)
        kfs = kfs[:C]
        n_real = len(kfs)
        pad_kfs = kfs + [kfs[0]] * (C - n_real)
        idx = np.asarray(pad_kfs, np.int64)
        obs = m.kf_obs[idx]                                # (C, S)
        safe = np.maximum(obs, 0)
        has = (obs >= 0) & m.pt_alive[safe] & m.kf_kp_valid[idx]
        has[n_real:] = False                               # padded candidates
        n_match, n_final, R2, t2, inlier, match = jax.device_get(
            _batched_reloc(
                frame.dev("desc"), frame.dev("valid"), frame.dev("angle"),
                frame.dev("kp_xy"), frame.dev("u_right"),
                frame.dev("octave"),
                jnp.asarray(self.inv_level_sigma2[frame.octave]),
                jnp.asarray(m.kf_desc[idx]), jnp.asarray(has),
                jnp.asarray(m.kf_kp_angle[idx]),
                jnp.asarray(m.kf_kp_octave[idx]),
                jnp.asarray(m.kf_kp_ur[idx]),
                jnp.asarray(m.pt_pos[safe]),
                jnp.asarray(m.kf_pose[idx, :3, :3]),
                jnp.asarray(m.kf_pose[idx, :3, 3]),
                jnp.asarray(self.scale_factors), self.n_levels,
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                self.cam.bf, self.cam.bf / self.cam.fx,
                self.min_x, self.max_x, self.min_y, self.max_y,
                jax.random.PRNGKey(frame.frame_id)))
        # accept the best candidate passing the reference gates
        # (>= 15 matches to try, >= 20 optimized inliers to accept)
        ok = (n_match >= 15) & (n_final >= 20)
        ok[n_real:] = False
        if not ok.any():
            return False
        best = int(np.argmax(np.where(ok, n_final, -1)))
        kid = kfs[best]
        mb = match[best]
        cur = np.flatnonzero(mb >= 0)
        pids = m.kf_obs[kid][mb[cur]]
        good = (pids >= 0)
        good[good] &= m.pt_alive[pids[good]]
        frame.map_points[:] = -1
        frame.map_points[cur[good]] = pids[good]
        frame.temp_flag = np.zeros(frame.n_slots, bool)
        frame.temp_world = np.zeros((frame.n_slots, 3), np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R2[best]
        T[:3, 3] = t2[best]
        frame.set_pose(T)
        frame.outlier = (frame.map_points >= 0) & ~inlier[best]
        self.last_reloc_frame_id = frame.frame_id
        self._reloc_rr = 0
        return True


@partial(jax.jit, static_argnames=("n_levels",))
def _batched_reloc(f_desc, f_valid, f_angle, f_xy, f_ur, f_octave, f_inv_s2,
                   c_desc, c_has, c_angle, c_octave, c_ur, c_pw, c_R, c_t,
                   scale_factors, n_levels,
                   fx, fy, cx, cy, bf, mb,
                   min_x, max_x, min_y, max_y, key):
    """All relocalization candidates in ONE device program: per candidate,
    brute-force matching (SearchByBoW gates) -> PnP RANSAC -> motion-only
    pose LM -> projection augmentation -> final pose LM, vmapped over the
    padded candidate axis.

    Spec: Tracking::Relocalization (Tracking.cpp:1954-2115) — >= 15 matches
    to try a candidate, PnP >= 8 inliers else seed from the candidate's own
    pose, and when the first optimization lands >= 10 inliers, the
    candidate keyframe's remaining map points are projected into the frame
    (SearchByProjection coarse window, ORBdist gate) and the pose is
    re-optimized over the enlarged set (Tracking.cpp:2060-2106).  The
    caller applies the acceptance gate on the returned counts.
    Returns (n_match (C,), n_final (C,), R (C,3,3), t (C,3),
    inlier (C, S_frame), match (C, S_frame))."""
    C = c_desc.shape[0]
    false_ = jnp.asarray(False)

    def one(cdesc, chas, cangle, coct, cur_, cpw, cR, ct, k):
        match, _ = matcher.match_brute_force(
            f_desc, f_valid, f_angle, cdesc, chas, cangle, nn_ratio=0.75)
        has = match >= 0
        midx = jnp.where(has, match, 0)
        pw = jnp.take(cpw, midx, axis=0)
        n_match = jnp.sum(has)
        R0, t0, _inlp, n_pnp = pnp_ransac(
            pw, f_xy, f_inv_s2, has, fx, fy, cx, cy, k, n_hyp=256)
        use_pnp = n_pnp >= 8
        R0 = jnp.where(use_pnp, R0, cR)
        t0 = jnp.where(use_pnp, t0, ct)
        with jax.default_matmul_precision("highest"):
            R2, t2, inlier, n2 = _pose_optimization(
                R0, t0, pw, f_xy, f_ur, f_inv_s2, has, fx, fy, cx, cy, bf)
        # projection augmentation: find the candidate KF's other points in
        # the frame under the refined pose, then re-optimize
        already = jnp.zeros(chas.shape[0], bool).at[midx].set(has)
        proj, _ = matcher._search_by_projection_last_impl(
            R2, t2, cpw, chas & ~already, coct, cangle, cdesc, cur_ >= 0,
            f_xy, f_octave, f_angle, f_desc, f_valid, f_ur,
            10.0, scale_factors, n_levels,
            fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y,
            false_, false_)
        match2 = jnp.where(match >= 0, match, proj)
        has2 = match2 >= 0
        pw2 = jnp.take(cpw, jnp.where(has2, match2, 0), axis=0)
        with jax.default_matmul_precision("highest"):
            R3, t3, inlier3, n3 = _pose_optimization(
                R2, t2, pw2, f_xy, f_ur, f_inv_s2, has2,
                fx, fy, cx, cy, bf)
        aug = n2 >= 10
        # second NARROW retry: when the augmented optimization lands
        # 30 <= n < 50, re-search the remaining points in a th=3 window with
        # the tighter ORBdist=64 gate and re-optimize (Tracking.cpp:2083-2101)
        already2 = jnp.zeros(chas.shape[0], bool).at[
            jnp.where(has2, match2, 0)].set(has2)
        proj2, _ = matcher._search_by_projection_last_impl(
            R3, t3, cpw, chas & ~already2, coct, cangle, cdesc, cur_ >= 0,
            f_xy, f_octave, f_angle, f_desc, f_valid, f_ur,
            3.0, scale_factors, n_levels,
            fx, fy, cx, cy, bf, mb, min_x, max_x, min_y, max_y,
            false_, false_, orb_dist=64)
        match3 = jnp.where(match2 >= 0, match2, proj2)
        has3 = match3 >= 0
        pw3 = jnp.take(cpw, jnp.where(has3, match3, 0), axis=0)
        with jax.default_matmul_precision("highest"):
            R4, t4, inlier4, n4 = _pose_optimization(
                R3, t3, pw3, f_xy, f_ur, f_inv_s2, has3,
                fx, fy, cx, cy, bf)
        retry = aug & (n3 >= 30) & (n3 < 50)
        n_final = jnp.where(retry, n4, jnp.where(aug, n3, n2))
        R_out = jnp.where(retry, R4, jnp.where(aug, R3, R2))
        t_out = jnp.where(retry, t4, jnp.where(aug, t3, t2))
        inl_out = jnp.where(retry, inlier4, jnp.where(aug, inlier3, inlier))
        m_out = jnp.where(retry, match3, jnp.where(aug, match2, match))
        return n_match, n_final, R_out, t_out, inl_out, m_out

    keys = jax.random.split(key, C)
    return jax.vmap(one)(c_desc, c_has, c_angle, c_octave, c_ur, c_pw,
                         c_R, c_t, keys)
