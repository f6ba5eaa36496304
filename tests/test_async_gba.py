"""Async global BA with catch-up correction
(LoopClosing::RunGlobalBundleAdjustment, LoopClosing.cpp:650-754).
"""
import threading
import time

import numpy as np
import pytest

from jetson_slam_tpu.config import CameraConfig
from jetson_slam_tpu.core.loop_closing import LoopCloser
from jetson_slam_tpu.core.map import MapStore
from jetson_slam_tpu.ops import tables
from tests.test_loop_parity import (_add_kf, _cam, _geom, _project,
                                    _shared_map)


def _loop_closer(m):
    return LoopCloser(m, database=None, cam=_cam(), geom=_geom(),
                      run_gba=True)


def test_gba_catchup_corrects_keyframes_created_during_solve():
    """A keyframe inserted between prepare and commit inherits its
    spanning-tree ancestor's old->new correction; a point created in that
    window moves with its reference keyframe."""
    m, pts, descs, pids = _shared_map(n_kf=4, n_pts=80)
    for k in (1, 2, 3):
        m.update_spanning_tree(k)
    lc = _loop_closer(m)
    prep = lc._gba_prepare()
    assert prep is not None

    # simulate concurrent mapping: new KF (child of 3) + new point
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.2
    new_kid = _add_kf(m, pose, _project(pts, pose), descs, pids)
    m.kf_parent[new_kid] = 3
    new_pid = m.add_point(np.array([0.5, 0.5, 6.0], np.float32),
                          descs[0], 3)
    m.pt_ref_kf[new_pid] = 3
    rel_R = pose[:3, :3] @ np.linalg.inv(m.kf_pose[3])[:3, :3]
    p_in_kf3 = m.kf_pose[3, :3, :3] @ m.pt_pos[new_pid] + m.kf_pose[3, :3, 3]

    sol = lc._gba_solve(prep)
    # force a visible correction on KF 3 so catch-up has something to do
    i3 = int(np.flatnonzero(prep["kids"] == 3)[0])
    R2, t2, p2 = (np.array(a) for a in sol)
    t2[i3] = t2[i3] + np.array([0.1, 0.0, 0.0], np.float32)
    lc._gba_commit(prep, (R2, t2, p2))

    # new KF moved with its ancestor: relative pose to KF 3 preserved
    rel_after = m.kf_pose[new_kid, :3, :3] @ \
        np.linalg.inv(m.kf_pose[3])[:3, :3]
    np.testing.assert_allclose(rel_after, rel_R, atol=1e-4)
    t_rel_before = pose[:3, 3] - m.kf_pose[3, :3, 3]  # not invariant; check
    # camera-frame position of the new point w.r.t. KF 3 is preserved
    p_in_kf3_after = m.kf_pose[3, :3, :3] @ m.pt_pos[new_pid] + \
        m.kf_pose[3, :3, 3]
    np.testing.assert_allclose(p_in_kf3_after, p_in_kf3, atol=1e-3)
    # and KF 3 actually moved (the catch-up had a real delta to apply)
    assert np.linalg.norm(m.kf_pose[3, :3, 3] -
                          prep["ts"][i3]) > 0.05


def test_async_gba_runs_off_thread_and_commits():
    m, *_ = _shared_map(n_kf=4, n_pts=80)
    for k in (1, 2, 3):
        m.update_spanning_tree(k)
    lc = _loop_closer(m)
    lock = threading.Lock()
    before = m.kf_pose[2].copy()
    t = lc.launch_async_gba(lock=lock)
    assert t is not None
    # the caller thread is free while the solve runs
    t.join(timeout=120.0)
    assert not t.is_alive()
    assert np.isfinite(m.kf_pose[m.kf_alive]).all()
    # second launch works after the first finished
    t2 = lc.launch_async_gba(lock=lock)
    assert t2 is not None
    t2.join(timeout=120.0)
