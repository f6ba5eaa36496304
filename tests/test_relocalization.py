"""End-to-end relocalization: lose tracking on blank frames, recover on a
revisited view (Tracking::Relocalization, Tracking.cpp:1954-2115 — BoW/KF
candidates + PnP RANSAC + pose optimization)."""
import numpy as np
import pytest

from jetson_slam_tpu.config import SLAMConfig
from jetson_slam_tpu.core.tracking import TrackingState
from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.models.slam import SlamSystem


@pytest.mark.slow
def test_lost_then_relocalize():
    seq = make_stereo_sequence(seed=2, n_frames=12, h=240, w=320)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 320; cfg.camera.height = 240; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.orb.n_levels = 4; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    slam = SlamSystem(cfg, sensor="stereo")

    est = {}
    for i in range(len(seq.lefts)):
        state, fr = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                      seq.timestamps[i])
        est[i] = fr.Tcw.copy()
    assert state == TrackingState.OK

    # blind the camera: tracking must drop to LOST, not crash
    blank = np.zeros((240, 320), np.uint8)
    for j in range(3):
        state, _ = slam.track_stereo(blank, blank, 100.0 + j)
    assert state == TrackingState.LOST

    # revisit a mapped view: relocalization should recover a nearby pose
    state, fr = slam.track_stereo(seq.lefts[5], seq.rights[5], 200.0)
    assert state == TrackingState.OK, "relocalization failed"
    dt = np.linalg.norm(fr.Tcw[:3, 3] - est[5][:3, 3])
    assert dt < 0.05, f"relocalized pose off by {dt} m"


def test_projection_orb_dist_gate():
    """The narrow reloc retry searches with ORBdist=64 instead of TH_HIGH
    (Tracking.cpp:2090): a candidate whose best Hamming distance lands in
    (64, 100] must match under the default gate but NOT under orb_dist=64."""
    import jax.numpy as jnp
    from jetson_slam_tpu.core import matcher

    rng = np.random.default_rng(0)
    S = 128
    base = rng.integers(0, 256, 32).astype(np.uint8)
    # descriptor pair with Hamming distance exactly 80: flip 10 whole bytes
    d80 = base.copy()
    d80[:10] ^= 0xFF
    assert np.unpackbits(base ^ d80).sum() == 80
    last_desc = np.tile(base, (S, 1)); last_desc[1:] = 0
    cur_desc = np.tile(d80, (S, 1)); cur_desc[1:] = 255
    pw = np.zeros((S, 3), np.float32); pw[:, 2] = 5.0   # 5 m ahead
    has = np.zeros(S, bool); has[0] = True
    xy = np.full((S, 2), -1e6, np.float32)
    xy[0] = (160.0, 120.0)                               # principal point
    valid = np.zeros(S, bool); valid[0] = True
    args = lambda orb_dist: dict(
        Rcw=jnp.eye(3), tcw=jnp.zeros(3),
        last_pw=jnp.asarray(pw), last_has_pt=jnp.asarray(has),
        last_octave=jnp.zeros(S, jnp.int32),
        last_angle=jnp.zeros(S, jnp.float32),
        last_desc=jnp.asarray(last_desc),
        last_is_stereo=jnp.zeros(S, bool),
        cur_xy=jnp.asarray(xy), cur_octave=jnp.zeros(S, jnp.int32),
        cur_angle=jnp.zeros(S, jnp.float32), cur_desc=jnp.asarray(cur_desc),
        cur_valid=jnp.asarray(valid), cur_ur=jnp.full(S, -1.0),
        th=10.0, scale_factors=jnp.ones(4), n_levels=4,
        fx=260.0, fy=260.0, cx=160.0, cy=120.0, bf=20.0, mb=0.08,
        min_x=0.0, max_x=320.0, min_y=0.0, max_y=240.0,
        forward=jnp.asarray(False), backward=jnp.asarray(False),
        orb_dist=orb_dist)
    wide, _ = matcher._search_by_projection_last_impl(**args(None))
    narrow, _ = matcher._search_by_projection_last_impl(**args(64))
    assert int(np.asarray(wide)[0]) == 0      # TH_HIGH=100 accepts d=80
    assert int(np.asarray(narrow)[0]) == -1   # ORBdist=64 rejects it


@pytest.mark.slow
def test_relocalize_on_degraded_revisit():
    """Relocalization on a photometrically degraded revisit (noise +
    contrast loss): exercises the augmentation + narrow-retry rounds of the
    one-dispatch batched reloc under imperfect matching."""
    seq = make_stereo_sequence(seed=2, n_frames=12, h=240, w=320)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 320; cfg.camera.height = 240; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.orb.n_levels = 4; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    slam = SlamSystem(cfg, sensor="stereo")

    est = {}
    for i in range(len(seq.lefts)):
        state, fr = slam.track_stereo(seq.lefts[i], seq.rights[i],
                                      seq.timestamps[i])
        est[i] = fr.Tcw.copy()
    assert state == TrackingState.OK

    blank = np.zeros((240, 320), np.uint8)
    for j in range(3):
        state, _ = slam.track_stereo(blank, blank, 100.0 + j)
    assert state == TrackingState.LOST

    rng = np.random.default_rng(0)

    def degrade(img):
        f = img.astype(np.float32) * 0.8 + 20.0
        f += rng.normal(0, 6.0, img.shape)
        return np.clip(f, 0, 255).astype(np.uint8)

    state, fr = slam.track_stereo(degrade(seq.lefts[5]),
                                  degrade(seq.rights[5]), 200.0)
    assert state == TrackingState.OK, "relocalization failed on noisy view"
    dt = np.linalg.norm(fr.Tcw[:3, 3] - est[5][:3, 3])
    assert dt < 0.1, f"relocalized pose off by {dt} m"


@pytest.mark.slow
def test_reloc_candidate_rotation_reaches_old_map_regions():
    """Without a vocabulary there is no appearance index; the candidate
    fallback must SWEEP all keyframes across successive LOST frames
    (rotating window), not retry the same most-recent ten forever —
    measured to leave the tracker permanently LOST on multi-lap sequences
    when the camera re-enters EARLY map regions."""
    from jetson_slam_tpu.core.frame import Frame

    seq = make_stereo_sequence(seed=3, n_frames=40, h=240, w=320,
                               trajectory="circle", n_points=1200)
    cfg = SLAMConfig()
    cfg.camera.fx = seq.fx; cfg.camera.fy = seq.fy
    cfg.camera.cx = seq.cx; cfg.camera.cy = seq.cy
    cfg.camera.width = 320; cfg.camera.height = 240; cfg.camera.bf = seq.bf
    cfg.camera.k1 = cfg.camera.k2 = cfg.camera.p1 = cfg.camera.p2 = 0.0
    cfg.camera.th_depth = 40.0
    cfg.orb.n_levels = 3; cfg.orb.tile_h = 16; cfg.orb.tile_w = 16
    cfg.orb.th_fast_max = 15
    slam = SlamSystem(cfg, sensor="stereo")
    for i in range(len(seq.lefts)):
        slam.track_stereo(seq.lefts[i], seq.rights[i], seq.timestamps[i])
    tr = slam.tracker
    assert slam.map.n_keyframes() > tr.RELOC_MAX_CANDIDATES

    # an EARLY view: its keyframes are outside the most-recent window, so
    # the first attempt fails and the rotation must find them
    tr._reloc_rr = 0
    ok = False
    for attempt in range(6):
        fr = Frame(tr.frontend, tr.cam, 200.0 + attempt, seq.lefts[2],
                   seq.rights[2])
        if tr._relocalization(fr):
            ok = True
            break
    assert ok, "rotating candidate sweep never reached the early keyframes"
    # (whether attempt 0 already succeeds depends on how many keyframes the
    # platform's keyframe cadence produced; the property under test is that
    # the sweep EVENTUALLY reaches every region, pinned by the bound above)
    slam.shutdown()
