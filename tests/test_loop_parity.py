"""Loop-closing parity tests: spanning tree, persisted loop edges,
SetBadFlag surgery, SearchBySim3 enrichment, the >= 40 total-matches
acceptance gate, and rejection of perceptually-aliased candidates.

Reference semantics: KeyFrame.cpp:373-381 (parent assignment), :456-548
(SetBadFlag surgery), ORBmatcher.cpp:1089-1313 (SearchBySim3),
LoopClosing.cpp:236-405 (ComputeSim3 gates), Optimizer.cpp:888-990
(essential graph edge set).
"""
import numpy as np
import pytest

from jetson_slam_tpu.config import CameraConfig
from jetson_slam_tpu.core.loop_closing import LoopCloser
from jetson_slam_tpu.core.map import MapStore
from jetson_slam_tpu.ops import tables

FX = FY = 200.0
CX, CY = 160.0, 120.0


def _cam():
    cam = CameraConfig()
    cam.fx, cam.fy, cam.cx, cam.cy = FX, FY, CX, CY
    cam.bf = 0.1 * FX
    return cam


def _geom():
    return tables.pyramid_geometry(240, 320, 3, 1.2, 16, 16)


def _project(pts_w, pose):
    pc = pts_w @ pose[:3, :3].T + pose[:3, 3]
    u = FX * pc[:, 0] / pc[:, 2] + CX
    v = FY * pc[:, 1] / pc[:, 2] + CY
    return np.stack([u, v], 1).astype(np.float32)


def _add_kf(m, pose, xy, descs, pids=None):
    """Insert a keyframe row directly into the SoA tables."""
    kid = m._next_kf
    m._next_kf += 1
    n = len(xy)
    m.kf_alive[kid] = True
    m.kf_pose[kid] = pose
    m.kf_kp_xy[kid, :n] = xy
    m.kf_desc[kid, :n] = descs
    m.kf_kp_valid[kid, :n] = True
    m.kf_kp_octave[kid, :n] = 0
    if pids is not None:
        for slot, pid in enumerate(pids):
            if pid >= 0:
                m.add_observation(kid, slot, int(pid))
    return kid


def _shared_map(n_kf=4, n_pts=80, seed=0):
    """n_kf keyframes along a line, all observing the same n_pts points."""
    rng = np.random.default_rng(seed)
    m = MapStore(max_points=1024, max_keyframes=16, n_slots=256)
    pts = rng.uniform([-2.0, -1.5, 4.0], [2.0, 1.5, 8.0], (n_pts, 3)).astype(
        np.float32)
    descs = rng.integers(0, 256, (n_pts, 32)).astype(np.uint8)
    pids = [m.add_point(pts[i], descs[i], 0) for i in range(n_pts)]
    for pid in pids:
        # realistic scale invariance: observed at octave 0 from the origin
        # (MapPoint::UpdateNormalAndDepth semantics)
        d = float(np.linalg.norm(m.pt_pos[pid]))
        m.pt_max_dist[pid] = d
        m.pt_min_dist[pid] = d / 1.2 ** 2
        m.pt_normal[pid] = m.pt_pos[pid] / max(d, 1e-9)  # away from camera
    for k in range(n_kf):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05 * k
        _add_kf(m, pose, _project(pts, pose), descs, pids)
    return m, pts, descs, pids


# --------------------------------------------------------------- spanning tree
def test_parent_assignment_first_connection():
    m, *_ = _shared_map(n_kf=3)
    m.update_spanning_tree(1)
    m.update_spanning_tree(2)
    assert m.kf_parent[0] == -1          # root has no parent
    assert m.kf_parent[1] == 0           # best (only) earlier covisible
    assert m.kf_parent[2] in (0, 1)
    assert not m.kf_first_connection[1]
    # re-running must not change an assigned parent
    p = m.kf_parent[2]
    m.update_spanning_tree(2)
    assert m.kf_parent[2] == p


def test_erase_keyframe_reassigns_children():
    m, *_ = _shared_map(n_kf=4)
    for k in (1, 2, 3):
        m.update_spanning_tree(k)
    # force a chain 0 <- 1 <- 2 <- 3 so erasing 1 exercises the surgery
    m.kf_parent[2] = 1
    m.kf_parent[3] = 2
    m.erase_keyframe(1)
    assert not m.kf_alive[1]
    # child 2 must have been adopted by the candidate set rooted at 1's
    # parent (KeyFrame.cpp:484-539); with full covisibility that is KF 0
    assert m.kf_parent[2] == 0
    assert m.kf_parent[3] == 2           # untouched: its parent survived


def test_loop_edge_blocks_erase_and_persists():
    m, *_ = _shared_map(n_kf=4)
    m.add_loop_edge(3, 1)
    assert (1, 3) in m.loop_edges
    m.erase_keyframe(1)
    assert m.kf_alive[1]                 # SetErase: loop-edge KFs stay
    m.erase_keyframe(2)
    assert not m.kf_alive[2]


def test_essential_edges_carry_tree_loop_and_covis():
    m, *_ = _shared_map(n_kf=4)
    for k in (1, 2, 3):
        m.update_spanning_tree(k)
    m.add_loop_edge(0, 3)                # a past loop event
    cam, geom = _cam(), _geom()
    lc = LoopCloser(m, database=None, cam=cam, geom=geom, run_gba=False)
    kids = m.keyframe_ids()
    edges = lc._essential_edges(kids)
    kinds = {(a, b): kind for a, b, kind in edges}
    pos = {int(k): i for i, k in enumerate(kids)}
    assert (pos[0], pos[3]) in kinds and kinds[(pos[0], pos[3])] == "loop"
    assert (pos[0], pos[1]) in kinds     # spanning-tree edge
    # all KFs share all 80 points -> covis weight 80 < 100: no covis edges
    assert all(k != "covis" for k in kinds.values())


# ------------------------------------------------------------- SearchBySim3
def test_search_by_sim3_identity_recovers_matches():
    m, pts, descs, pids = _shared_map(n_kf=2)
    cam, geom = _cam(), _geom()
    lc = LoopCloser(m, database=None, cam=cam, geom=geom, run_gba=False)
    already = np.zeros(m.n_slots, bool)
    match = np.asarray(lc._search_by_sim3(
        0, 1, 1.0, np.eye(3), np.zeros(3), already, already))
    found = np.flatnonzero(match >= 0)
    # both KFs observe identical points with identical descriptors at the
    # projected locations: nearly every slot must mutually agree slot->slot
    assert len(found) > 0.9 * len(pts)
    assert (match[found] == found).all()


def test_search_by_sim3_skips_already_matched():
    m, pts, descs, pids = _shared_map(n_kf=2)
    cam, geom = _cam(), _geom()
    lc = LoopCloser(m, database=None, cam=cam, geom=geom, run_gba=False)
    already = np.zeros(m.n_slots, bool)
    already[: len(pts) // 2] = True
    match = np.asarray(lc._search_by_sim3(
        0, 1, 1.0, np.eye(3), np.zeros(3), already, already))
    assert (match[: len(pts) // 2] == -1).all()
    assert (match[len(pts) // 2: len(pts)] >= 0).sum() > 0.8 * (len(pts) // 2)


# ------------------------------------------------- ComputeSim3 acceptance
def _loop_closer_for(m):
    return LoopCloser(m, database=None, cam=_cam(), geom=_geom(),
                      run_gba=False)


def test_compute_sim3_accepts_true_loop():
    m, *_ = _shared_map(n_kf=2, n_pts=80)
    lc = _loop_closer_for(m)
    ok, loop_kf, s, R, t, matched = lc.compute_sim3(1, [0])
    assert ok and loop_kf == 0
    assert len(matched) >= 40            # the reference's total-match gate
    assert s == pytest.approx(1.0, abs=0.05)
    # recovered relative translation ~ the 0.05 m x-offset between the KFs
    assert np.linalg.norm(t) < 0.2


def test_compute_sim3_rejects_aliased_geometry():
    """Perceptual aliasing: same descriptors, different 3-D structure.
    Brute-force matching fires (>= 20 matches) but no Sim3 explains the
    geometry, so the candidate must be REJECTED."""
    rng = np.random.default_rng(5)
    m = MapStore(max_points=1024, max_keyframes=16, n_slots=256)
    n = 80
    descs = rng.integers(0, 256, (n, 32)).astype(np.uint8)
    pts_a = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (n, 3)).astype(np.float32)
    # aliased scene: identical appearance, scrambled depth/layout
    pts_b = pts_a[rng.permutation(n)].copy()
    pts_b[:, 2] = rng.uniform(4, 8, n)
    pids_a, pids_b = [], []
    for i in range(n):
        pa = m.add_point(pts_a[i], descs[i], 0)
        m.pt_min_dist[pa] = 0.5
        m.pt_max_dist[pa] = 50.0
        pids_a.append(pa)
    for i in range(n):
        pb = m.add_point(pts_b[i], descs[i], 1)
        m.pt_min_dist[pb] = 0.5
        m.pt_max_dist[pb] = 50.0
        pids_b.append(pb)
    eye = np.eye(4, dtype=np.float32)
    _add_kf(m, eye, _project(pts_a, eye), descs, pids_a)
    _add_kf(m, eye, _project(pts_b, eye), descs, pids_b)
    lc = _loop_closer_for(m)
    ok, *_ = lc.compute_sim3(1, [0])
    assert not ok


def test_compute_sim3_enforces_40_total_gate():
    """Geometry consistent but only 30 shared points: Sim3 RANSAC/LM pass
    (>= 20 inliers) yet the total falls short of the reference's >= 40
    acceptance gate (LoopClosing.cpp:389) -> rejected."""
    m, *_ = _shared_map(n_kf=2, n_pts=30)
    lc = _loop_closer_for(m)
    ok, *_ = lc.compute_sim3(1, [0])
    assert not ok


def test_second_loop_reuses_first_loop_edge():
    """After a first loop event persists its edge, the next essential-graph
    solve must still constrain that pair (KeyFrame::GetLoopEdges feeding
    Optimizer.cpp:931-950)."""
    m, *_ = _shared_map(n_kf=6)
    for k in range(1, 6):
        m.update_spanning_tree(k)
    lc = _loop_closer_for(m)
    m.add_loop_edge(4, 0)                # first loop event
    m.add_loop_edge(5, 1)                # second loop event
    edges = lc._essential_edges(m.keyframe_ids())
    loops = {(a, b) for a, b, kind in edges if kind == "loop"}
    assert (0, 4) in loops and (1, 5) in loops


def test_mono_sim3_recovers_scale_drift():
    """Monocular scale drift: the current region's geometry is scaled by
    lambda relative to the loop region (identical image projections, so
    appearance matches), and ComputeSim3 with fix_scale=False must recover
    the corrective Sim3 scale s ~= 1/lambda (Sim3Solver.cpp mbFixScale
    semantics; stereo/RGB-D pin s = 1)."""
    lam = 1.3
    rng = np.random.default_rng(8)
    m = MapStore(max_points=1024, max_keyframes=16, n_slots=256)
    n = 80
    pts = rng.uniform([-2.0, -1.5, 4.0], [2.0, 1.5, 8.0], (n, 3)).astype(
        np.float32)
    descs = rng.integers(0, 256, (n, 32)).astype(np.uint8)

    def add_points(P, ref):
        out = []
        for i in range(n):
            pid = m.add_point(P[i], descs[i], ref)
            d = float(np.linalg.norm(P[i]))
            m.pt_max_dist[pid] = d
            m.pt_min_dist[pid] = d / 1.2 ** 2
            m.pt_normal[pid] = P[i] / max(d, 1e-9)
            out.append(pid)
        return out

    eye = np.eye(4, dtype=np.float32)
    xy = _project(pts, eye)          # scale-invariant: same pixels for both
    pids_loop = add_points(pts, 0)
    pids_cur = add_points((lam * pts).astype(np.float32), 1)
    _add_kf(m, eye, xy, descs, pids_loop)    # loop keyframe (true scale)
    _add_kf(m, eye, xy, descs, pids_cur)     # current keyframe (drifted)
    lc = LoopCloser(m, database=None, cam=_cam(), geom=_geom(),
                    sensor="mono", run_gba=False)
    ok, loop_kf, s, R, t, matched = lc.compute_sim3(1, [0])
    assert ok and loop_kf == 0
    # current -> loop transform: p_loop = s R p_cur + t with p_cur = lam*p
    assert s == pytest.approx(1.0 / lam, rel=0.05), s
    assert len(matched) >= 40
