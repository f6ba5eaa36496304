"""SlamSystem: the public session facade (System.h equivalent).

Mirrors the reference's System API (include/System.h:62-128):
TrackStereo/TrackRGBD/TrackMonocular, ActivateLocalizationMode, Reset,
Shutdown, SaveTrajectoryTUM/KITTI, GetTrackingState/GetTrackedMapPoints.
The reference spawns LocalMapping/LoopClosing/Viewer threads
(System.cpp:97-111); here the mapping backend runs as a synchronous stage
after each keyframe insertion (async pipelining lands with parallel/).
"""
from __future__ import annotations

import numpy as np

from ..config import SLAMConfig
from ..core.frame import Frame
from ..core.local_mapping import LocalMapper
from ..core.map import MapStore
from ..core.tracking import Tracker, TrackingState
from ..io.trajectory import save_trajectory_kitti, save_trajectory_tum
from ..ops.frontend import OrbFrontend

SENSOR_MONOCULAR = "mono"
SENSOR_STEREO = "stereo"
SENSOR_RGBD = "rgbd"


class SlamSystem:
    def __init__(self, config: SLAMConfig, sensor: str = SENSOR_STEREO,
                 vocabulary=None, enable_mapping: bool = True,
                 enable_ba: bool = True, async_mapping: bool = False,
                 mapping_device=None, mesh=None, pipeline_depth: int = 0,
                 prewarm: bool = False):
        # pipeline_depth: software-pipeline the fused tracking step over
        # the host<->device link (core/tracking.py Tracker.pipeline_depth);
        # 0 = classic blocking per-frame behavior
        # mesh: optional jax.sharding.Mesh — local/global bundle adjustment
        # runs landmark-sharded across it (parallel/dist_ba.py)
        self.mesh = mesh
        self.config = config
        self.sensor = sensor
        cam = config.camera
        orb = config.orb
        mask = None
        if orb.mask_left:
            try:
                from ..io.datasets import imread_gray
                mask = imread_gray(orb.mask_left)
            except Exception:
                mask = None
        self.frontend = OrbFrontend(
            cam.height, cam.width, n_levels=orb.n_levels,
            scale_factor=orb.scale_factor, fast_n_min=orb.fast_n_min,
            fast_n_max=orb.fast_n_max, threshold=orb.th_fast_max,
            tile_h=orb.tile_h, tile_w=orb.tile_w,
            fixed_multi_scale_tile_size=orb.fixed_multi_scale_tile_size,
            apply_nms_ms=orb.apply_nms_ms, mask=mask)
        self.mapping_device = mapping_device
        self.vocabulary = vocabulary
        self.enable_mapping = enable_mapping
        self.enable_ba = enable_ba
        self.async_mapping = async_mapping
        self.pipeline_depth = int(pipeline_depth)
        self.pipeline = None
        self.localization_only = False
        self._wire(MapStore(max_points=config.max_map_points,
                            max_keyframes=config.max_keyframes,
                            n_slots=self.frontend.n_slots_padded))
        if prewarm:
            # compile the fused step for every candidate-bucket size on a
            # daemon thread (kills multi-second mid-run compile stalls)
            self.tracker.prewarm(background=True)

    def _wire(self, map_store, populate_database=False):
        """(Re)bind every module to `map_store`: mapper, BoW database + loop
        closer, async pipeline, tracker.  Used by __init__ / reset / load_map
        so no module is ever left pointing at a stale MapStore."""
        if self.pipeline is not None:
            self.pipeline.shutdown()
            self.pipeline = None
        self.map = map_store
        cam = self.config.camera
        self.local_mapper = (
            LocalMapper(self.map, cam, self.frontend.geom, sensor=self.sensor,
                        run_ba=self.enable_ba, device=self.mapping_device,
                        mesh=self.mesh)
            if self.enable_mapping else None)
        self.database = None
        self.loop_closer = None
        if self.vocabulary is not None:
            from ..bow.database import KeyFrameDatabase
            from ..core.loop_closing import LoopCloser
            self.database = KeyFrameDatabase(
                self.vocabulary, max_keyframes=self.config.max_keyframes)
            if populate_database:
                for kid in self.map.keyframe_ids():
                    self.database.add(
                        kid, self.map.kf_desc[kid][self.map.kf_kp_valid[kid]])
            self.loop_closer = LoopCloser(self.map, self.database, cam,
                                          self.frontend.geom,
                                          sensor=self.sensor, mesh=self.mesh)
        # async: LocalMapping + LoopClosing on a worker thread, like the
        # reference's System.cpp:97-111 thread spawn; else synchronous stage
        mapper_handle = self.local_mapper
        map_lock = None
        if self.async_mapping and self.local_mapper is not None:
            from ..core.pipeline import AsyncMappingPipeline
            self.pipeline = AsyncMappingPipeline(self.local_mapper,
                                                 self.loop_closer)
            mapper_handle = self.pipeline
            map_lock = self.pipeline.lock
            if self.loop_closer is not None:
                # post-loop global BA runs on its own transient thread with
                # catch-up correction (LoopClosing.cpp:650-754 semantics)
                self.loop_closer.async_gba = True
                self.loop_closer.gba_lock = map_lock
        self.tracker = Tracker(self.frontend, cam, self.map,
                               sensor=self.sensor,
                               local_mapper=mapper_handle,
                               database=self.database, map_lock=map_lock,
                               pipeline_depth=self.pipeline_depth)
        self.tracker.only_tracking = self.localization_only

    # ------------------------------------------------------------- track
    def track_stereo(self, left, right, timestamp):
        state, frame = self.tracker.track_stereo(left, right, timestamp)
        self._run_mapping()
        return state, frame

    def track_rgbd(self, rgb, depth, timestamp):
        state, frame = self.tracker.track_rgbd(rgb, depth, timestamp)
        self._run_mapping()
        return state, frame

    def track_monocular(self, img, timestamp):
        state, frame = self.tracker.track_monocular(img, timestamp)
        self._run_mapping()
        return state, frame

    def _run_mapping(self):
        if self.pipeline is not None:
            return  # the worker thread drains the queue
        if self.local_mapper is not None and not self.localization_only:
            done = self.local_mapper.process_pending()
            if self.loop_closer is not None:
                for kid in done:
                    if self.map.kf_alive[kid]:
                        self.loop_closer.process_keyframe(kid)

    # --------------------------------------------------------------- api
    def activate_localization_mode(self):
        """System::ActivateLocalizationMode (System.cpp:282).  Note the
        reference quirk: Tracking::Track resets mbOnlyTracking every frame
        (Tracking.cpp:375) making the mode a no-op there; here it works:
        the tracker stops creating keyframes, so neither the synchronous
        stage nor the async worker ever mutates the map."""
        self.localization_only = True
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.only_tracking = False

    def get_tracking_state(self):
        return self.tracker.state

    def get_tracked_map_points(self):
        f = self.tracker.last_frame
        if f is None:
            return np.array([], np.int64)
        return f.map_points[f.map_points >= 0]

    def get_tracked_keypoints_un(self):
        """System::GetTrackedKeyPointsUn (System.h:123): the last frame's
        undistorted keypoint coordinates, valid slots only — (N, 2) px."""
        f = self.tracker.last_frame
        if f is None:
            return np.zeros((0, 2), np.float32)
        return np.asarray(f.kp_xy)[np.asarray(f.valid)]

    def change_calibration(self, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0,
                           p2=0.0, k3=0.0, bf=None):
        """Tracking::ChangeCalibration (Tracking.cpp:2165): swap camera
        intrinsics mid-run (live rigs); takes effect from the next frame."""
        cam = self.config.camera
        cam.fx, cam.fy, cam.cx, cam.cy = fx, fy, cx, cy
        cam.k1, cam.k2, cam.p1, cam.p2, cam.k3 = k1, k2, p1, p2, k3
        if bf is not None:
            cam.bf = bf
        self.tracker.th_depth = cam.th_depth * cam.bf / cam.fx

    def reset(self):
        """System::Reset -> Tracking::Reset (Tracking.cpp:2117)."""
        # finish in-flight pipelined dispatches first (mirrors shutdown):
        # the old tracker's frames would otherwise be silently dropped from
        # the trajectory and their device work abandoned
        self.tracker.flush_pipeline()
        self._wire(MapStore(max_points=self.config.max_map_points,
                            max_keyframes=self.config.max_keyframes,
                            n_slots=self.frontend.n_slots_padded))

    def shutdown(self):
        """System::Shutdown — drain/stop mapping threads (System.cpp:313)."""
        self.tracker.flush_pipeline()
        if self.pipeline is not None:
            self.pipeline.shutdown()
            self.pipeline = None
        else:
            self._run_mapping()
        # join a transient GBA thread (System.cpp:326 waits for mpThreadGBA)
        if self.loop_closer is not None:
            t = getattr(self.loop_closer, "_gba_thread", None)
            if t is not None and t.is_alive():
                t.join(timeout=120.0)

    # -------------------------------------------------------- checkpoints
    def save_map(self, path):
        """Serialize the map (the reference's SaveMap TODO, System.h:115)."""
        from ..io.checkpoint import save_map
        save_map(self.map, path)

    def load_map(self, path):
        """Load a map checkpoint and rebind all modules to it.  The tracker
        restarts LOST so the next frame relocalizes (BoW + EPnP) against the
        loaded map — the resume story the reference never shipped."""
        from ..core.tracking import TrackingState
        from ..io.checkpoint import load_map
        self._wire(load_map(path), populate_database=True)
        self.tracker.state = (TrackingState.LOST if self.map.n_keyframes()
                              else TrackingState.NO_IMAGES_YET)

    # --------------------------------------------------------- trajectory
    def _camera_trajectory(self):
        """Relative-pose chain x reference-KF poses (System.cpp:334-392).

        Each frame pose is reconstructed as Tcr * Trw with the CURRENT
        (loop-corrected / BA-refined) reference keyframe pose, so global
        corrections propagate into the exported trajectory like the
        reference's mlRelativeFramePoses chain."""
        self.tracker.flush_pipeline()
        out_ts, out_poses = [], []
        for entry in self.tracker.trajectory:
            ts, Tcw, ref_kf, lost, rel, ref_gen = entry
            if lost:
                continue
            T = np.asarray(Tcw, np.float64)
            # the generation stamp rejects a reference row that was culled
            # and RECYCLED for a different keyframe since this frame passed
            if rel is not None and ref_kf is not None and ref_kf >= 0 and \
                    self.map.kf_alive[ref_kf] and \
                    int(self.map.kf_gen[ref_kf]) == ref_gen:
                T = np.asarray(rel, np.float64) @ \
                    np.asarray(self.map.kf_pose[ref_kf], np.float64)
            out_ts.append(ts)
            out_poses.append(np.linalg.inv(T))
        return out_ts, out_poses

    def camera_trajectory(self):
        """(timestamps, Twc list) with loop/BA corrections applied."""
        return self._camera_trajectory()

    def save_trajectory_tum(self, path):
        ts, poses = self._camera_trajectory()
        save_trajectory_tum(path, ts, poses)

    def save_trajectory_kitti(self, path):
        _, poses = self._camera_trajectory()
        save_trajectory_kitti(path, poses)

    def save_keyframe_trajectory_tum(self, path):
        ids = self.map.keyframe_ids()
        poses = [np.linalg.inv(self.map.kf_pose[k].astype(np.float64))
                 for k in ids]
        save_trajectory_tum(path, self.map.kf_timestamp[ids], poses)
