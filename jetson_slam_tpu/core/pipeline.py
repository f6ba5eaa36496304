"""Async tracking ∥ mapping pipeline.

The reference runs Tracking on the caller's thread and LocalMapping /
LoopClosing on their own threads (System.cpp:97-111), coordinated by
keyframe queues (LocalMapping.h:111,117), an mbAbortBA interrupt
(LocalMapping.cpp:120-125) and the global map mutex (Map.h:68).  This module
is the TPU-host analog: a worker thread drains the keyframe queue and runs
the mapping stages (point culling, triangulation, fuse, local BA, KF
culling) and loop closing, while the tracker keeps grabbing frames.

Concurrency model: one shared RLock plays Map::mMutexMapUpdate.  The tracker
holds it for the graph-read/write part of Track() (core/tracking.py _track);
frame CONSTRUCTION — the device-heavy fused ORB+stereo program — runs
outside it, and the worker releases it between mapping stages.  JAX device
dispatch releases the GIL, so the tracker's front-end program genuinely
overlaps mapper host work and the mapper's jitted BA overlaps tracker host
work — the same stage overlap the reference gets from CUDA streams + CPU
threads.
"""
from __future__ import annotations

import threading


class AsyncMappingPipeline:
    """Drop-in for the Tracker's `local_mapper` handle: same protocol
    (insert_keyframe / tick / accepting / interrupt_ba / queue_len), but the
    work happens on a daemon worker thread (LocalMapping::Run,
    LocalMapping.cpp:53-114, fused with LoopClosing::Run)."""

    def __init__(self, mapper, loop_closer=None, lock: threading.RLock | None = None):
        self.mapper = mapper
        self.loop_closer = loop_closer
        self.lock = lock if lock is not None else threading.RLock()
        self._cond = threading.Condition(self.lock)
        self._queue: list[int] = []
        self._processing = False
        self._stop = False
        self._error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="local-mapping", daemon=True)
        self._thread.start()

    # ---- Tracker-facing protocol (mirrors LocalMapper's) ----
    def insert_keyframe(self, kid: int):
        self._reraise()
        with self._cond:
            self._queue.append(kid)
            # LocalMapping::InsertKeyFrame sets mbAbortBA (LocalMapping.cpp:120)
            self.mapper.interrupt_ba()
            self._cond.notify()

    def tick(self):  # synchronous-mode frame countdown: no-op here
        self._reraise()

    def accepting(self):
        with self.lock:
            return not self._queue and not self._processing

    def interrupt_ba(self):
        self.mapper.interrupt_ba()

    def queue_len(self):
        with self.lock:
            return len(self._queue) + (1 if self._processing else 0)

    # -------------------------------------------------------------- worker
    def _run(self):
        m = self.mapper
        while True:
            with self._cond:
                while not self._queue and not self._stop:
                    self._cond.wait(timeout=0.05)
                if self._stop and not self._queue:
                    return
                kid = self._queue.pop(0)
                self._processing = True
                # expose backlog to the mapper's "skip BA when backed up"
                # check (LocalMapping::Run only runs BA on an empty queue)
                m.queue = self._queue
            try:
                # per-stage lock scope: the tracker can interleave between
                # stages, like the reference's finer-grained mutexes.  All
                # mapping device programs run on the mapper's chip when a
                # stage-pipeline device is set (multi-chip: tracking on chip
                # 0 overlaps mapping/BA on chip 1).
                with m.device_ctx():
                    with self.lock:
                        m._register_new_points(kid)
                        m.cull_map_points(kid)
                    with self.lock:
                        m.create_new_map_points(kid)
                    with self.lock:
                        if not self._queue:
                            m.search_in_neighbors(kid)
                    # local BA: prepare under the lock, run the device LM
                    # WITHOUT it (the tracker keeps going), commit under it.
                    # If a keyframe arrived during the solve the tracker set
                    # abort-BA — discard the stale solution, the reference's
                    # mbAbortBA semantics (Optimizer.cpp:577-580).
                    prep = None
                    with self.lock:
                        if not self._queue and m.run_ba and \
                                m.map.n_keyframes() > 2:
                            m._abort_ba = False
                            prep = m._lba_prepare(kid)
                    if prep is not None:
                        sol = m._lba_solve(prep)
                        with self.lock:
                            if not m._abort_ba:
                                m._lba_commit(prep, sol)
                    with self.lock:
                        if not self._queue:
                            m.cull_keyframes(kid)
                    if self.loop_closer is not None:
                        with self.lock:
                            if m.map.kf_alive[kid]:
                                self.loop_closer.process_keyframe(kid)
            except BaseException as e:  # surfaced on the tracker thread
                self._error = e
            finally:
                with self._cond:
                    self._processing = False
                    self._cond.notify_all()

    # ----------------------------------------------------------- lifecycle
    def drain(self, timeout: float = 60.0):
        """Block until the queue is empty and the worker is idle."""
        import time
        deadline = time.monotonic() + timeout
        with self._cond:
            while (self._queue or self._processing) and \
                    time.monotonic() < deadline:
                self._cond.wait(timeout=0.05)
        self._reraise()

    def shutdown(self, timeout: float = 60.0):
        self.drain(timeout)
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join(timeout=5.0)
        self._reraise()

    def _reraise(self):
        if self._error is not None:
            e, self._error = self._error, None
            raise e
