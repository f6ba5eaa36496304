"""Aux subsystems: viewer rendering, map checkpoint/resume, profiling.

The reference has none of these as testable units (SURVEY.md §5: Pangolin
GUI, SaveMap TODO, tictoc prints); here each is a headless library feature.
"""
import numpy as np

from jetson_slam_tpu.core.map import MapStore
from jetson_slam_tpu.io.checkpoint import load_map, save_map
from jetson_slam_tpu.utils.profiling import TicToc
from jetson_slam_tpu.viz import FrameDrawer, MapDrawer


def _tiny_map():
    m = MapStore(max_points=64, max_keyframes=8, n_slots=16)

    class FakeFrame:
        timestamp = 1.5
        frame_id = 3
        Tcw = np.eye(4, dtype=np.float32)
        kp_xy = np.random.default_rng(0).uniform(0, 100, (16, 2)).astype(np.float32)
        octave = np.zeros(16, np.int32)
        angle = np.zeros(16, np.float32)
        u_right = np.full(16, -1.0, np.float32)
        depth = np.full(16, -1.0, np.float32)
        desc = np.arange(16 * 32, dtype=np.uint8).reshape(16, 32)
        valid = np.ones(16, bool)
        map_points = np.full(16, -1, np.int32)

    kid = m.add_keyframe(FakeFrame())
    for i in range(5):
        pid = m.add_point(np.array([i, 0, 5.0], np.float32),
                          np.full(32, i, np.uint8), ref_kf=kid)
        m.add_observation(kid, i, pid)
    return m


def test_checkpoint_roundtrip(tmp_path):
    m = _tiny_map()
    p = str(tmp_path / "map.npz")
    save_map(m, p)
    m2 = load_map(p)
    assert m2.n_keyframes() == m.n_keyframes()
    assert m2.n_points() == m.n_points()
    assert np.array_equal(m2.kf_obs, m.kf_obs)
    assert np.array_equal(m2.pt_pos, m.pt_pos)
    assert m2._next_pt == m._next_pt and m2._next_kf == m._next_kf
    # mutating the copy must not touch the original (real arrays, not views)
    m2.pt_pos[0] += 1
    assert not np.array_equal(m2.pt_pos, m.pt_pos)


def test_frame_drawer_renders():
    img = np.random.default_rng(1).integers(0, 255, (120, 160), np.uint8)

    class F:
        valid = np.array([True, True, False])
        kp_xy_raw = np.array([[30.0, 40.0], [100.0, 80.0], [0, 0]], np.float32)
        map_points = np.array([5, -1, -1], np.int32)
        outlier = np.zeros(3, bool)

    out = FrameDrawer(16, 16).draw(img, F(), state_name="OK", n_kfs=2, n_pts=10)
    assert out.shape == (140, 160, 3) and out.dtype == np.uint8
    assert out.any()


def test_map_drawer_renders():
    m = _tiny_map()
    for top_down in (False, True):
        out = MapDrawer(top_down=top_down).draw(
            m, current_Tcw=np.eye(4, dtype=np.float32),
            trajectory=np.tile(np.eye(4, dtype=np.float32), (4, 1, 1)))
        assert out.ndim == 3 and out.shape[2] == 3 and out.any()


def test_tictoc_stats():
    tt = TicToc()
    for _ in range(3):
        tt.tic("a")
        tt.toc("a")
    with tt.scope("b"):
        pass
    sa, sb = tt.stats("a"), tt.stats("b")
    assert sa["count"] == 3 and sb["count"] == 1
    assert sa["total_ms"] >= sa["max_ms"] >= sa["min_ms"] >= 0
    assert "a" in tt.report() and "b" in tt.report()
    tt.reset()
    assert tt.stats("a")["count"] == 0


def test_slam_system_map_save_load(tmp_path):
    """SlamSystem.save_map/load_map rebinds modules and restarts LOST."""
    from jetson_slam_tpu.config import SLAMConfig
    from jetson_slam_tpu.core.tracking import TrackingState
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.models.slam import SlamSystem

    seq = make_stereo_sequence(seed=7, n_frames=4, h=120, w=160, n_points=300)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 160; cfg.camera.height = 120; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.orb.n_levels = 3; cfg.orb.tile_h = 12; cfg.orb.tile_w = 12
    slam = SlamSystem(cfg, sensor="stereo")
    for i in range(4):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
    n_kf, n_pt = slam.map.n_keyframes(), slam.map.n_points()
    assert n_kf >= 1 and n_pt > 0
    p = str(tmp_path / "m.npz")
    slam.save_map(p)
    slam.load_map(p)
    assert slam.map.n_keyframes() == n_kf
    assert slam.map.n_points() == n_pt
    assert slam.get_tracking_state() == TrackingState.LOST


def test_localization_only_freezes_map():
    """ActivateLocalizationMode: tracking continues, map stops growing."""
    from jetson_slam_tpu.config import SLAMConfig
    from jetson_slam_tpu.core.tracking import TrackingState
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.models.slam import SlamSystem

    seq = make_stereo_sequence(seed=13, n_frames=12, h=240, w=320)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 320; cfg.camera.height = 240; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.orb.n_levels = 4; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    slam = SlamSystem(cfg, sensor="stereo")
    for i in range(6):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
    assert state == TrackingState.OK
    slam.activate_localization_mode()
    n_kf, n_pt = slam.map.n_keyframes(), slam.map.n_points()
    for i in range(6, 12):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
    assert state == TrackingState.OK
    assert slam.map.n_keyframes() == n_kf
    assert slam.map.n_points() == n_pt


def test_covisible_neighbors_batch_matches_per_kf():
    """covisible_neighbors_batch (one (B, K, S) pass, used by the per-frame
    local-keyframe vote) must return exactly what covisible_keyframes
    returns per keyframe, including the best-anyway fallback."""
    rng = np.random.default_rng(3)
    m = MapStore(max_points=256, max_keyframes=12, n_slots=32)

    class F:
        timestamp = 0.0
        frame_id = 0
        Tcw = np.eye(4, dtype=np.float32)
        kp_xy = np.zeros((32, 2), np.float32)
        octave = np.zeros(32, np.int32)
        angle = np.zeros(32, np.float32)
        u_right = np.full(32, -1.0, np.float32)
        depth = np.full(32, -1.0, np.float32)
        desc = np.zeros((32, 32), np.uint8)
        valid = np.ones(32, bool)
        map_points = np.full(32, -1, np.int32)

    kids = [m.add_keyframe(F()) for _ in range(8)]
    pids = [m.add_point(np.zeros(3, np.float32), np.zeros(32, np.uint8), 0)
            for _ in range(120)]
    # random observation structure with varying overlap
    for k in kids:
        for slot, pid in enumerate(rng.choice(pids, size=24, replace=False)):
            m.add_observation(k, slot, int(pid))
    m.erase_keyframe(kids[-1])  # dead keyframes must be excluded
    alive = kids[:-1]
    batch = m.covisible_neighbors_batch(alive, n=5)
    for i, k in enumerate(alive):
        single, _ = m.covisible_keyframes(int(k), n=5)
        assert np.array_equal(batch[i], single), (k, batch[i], single)


def test_keyframe_rows_recycle():
    """erase_keyframe frees the row; add_keyframe reuses it.  A lifetime
    allocating >2x capacity must never exhaust the table, generations must
    distinguish the occupants, and erase hooks must fire (the BoW database
    drops its entry via one)."""
    m = MapStore(max_points=256, max_keyframes=8, n_slots=16)
    erased = []
    m.erase_hooks.append(erased.append)

    class F:
        timestamp = 0.0
        frame_id = 0
        Tcw = np.eye(4, dtype=np.float32)
        kp_xy = np.zeros((16, 2), np.float32)
        octave = np.zeros(16, np.int32)
        angle = np.zeros(16, np.float32)
        u_right = np.full(16, -1.0, np.float32)
        depth = np.full(16, -1.0, np.float32)
        desc = np.zeros((16, 32), np.uint8)
        valid = np.ones(16, bool)
        map_points = np.full(16, -1, np.int32)

    k0 = m.add_keyframe(F())          # protected id-0 anchor
    live = [m.add_keyframe(F()) for _ in range(5)]
    gens = {k: int(m.kf_gen[k]) for k in live}
    total_allocs = 6
    for _ in range(20):               # 20 churn rounds >> capacity 8
        victim = live.pop(0)
        # give the victim an observation so erase paths all run
        pid = m.add_point(np.zeros(3, np.float32), np.zeros(32, np.uint8),
                          ref_kf=victim)
        m.add_observation(victim, 0, pid)
        m.erase_keyframe(victim)
        assert not m.kf_alive[victim]
        assert erased[-1] == victim
        # ref re-anchoring: the point's ref must no longer be the dead row
        if m.pt_alive[pid]:
            assert m.pt_ref_kf[pid] != victim
        k = m.add_keyframe(F())
        total_allocs += 1
        assert m.kf_alive[k]
        if k in gens:                 # recycled row -> new generation
            assert int(m.kf_gen[k]) > gens[k]
        gens[k] = int(m.kf_gen[k])
        live.append(k)
    assert total_allocs > 2 * m.max_keyframes
    assert m._next_kf <= m.max_keyframes
    assert m.n_keyframes() == 6       # anchor + 5 live


def test_keyframe_capacity_saturation_degrades_gracefully():
    """With a tiny keyframe table, a long tracked sequence must never raise
    on capacity — keyframe creation degrades to tracking-only until culling
    recycles rows (kf_capacity_left gate in Tracking::NeedNewKeyFrame)."""
    from jetson_slam_tpu.config import SLAMConfig
    from jetson_slam_tpu.core.tracking import TrackingState
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    from jetson_slam_tpu.models.slam import SlamSystem

    seq = make_stereo_sequence(seed=11, n_frames=40, h=120, w=160,
                               trajectory="arc", n_points=500)
    cfg = SLAMConfig()
    c = cfg.camera
    c.fx, c.fy, c.cx, c.cy = seq.fx, seq.fy, seq.cx, seq.cy
    c.width, c.height, c.bf = 160, 120, seq.bf
    c.k1 = c.k2 = c.p1 = c.p2 = 0.0
    c.th_depth = 40.0
    cfg.orb.n_levels = 3
    cfg.orb.tile_h = 12
    cfg.orb.tile_w = 12
    cfg.max_map_points = 8192
    cfg.max_keyframes = 6          # tiny: forces saturation quickly
    slam = SlamSystem(cfg, sensor="stereo")
    states = []
    for i in range(len(seq.lefts)):
        state, _ = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                     seq.timestamps[i])
        states.append(state)
    assert slam.map._next_kf <= cfg.max_keyframes
    ok = sum(s == TrackingState.OK for s in states)
    assert ok > 0.5 * len(states), f"only {ok}/{len(states)} frames OK"
