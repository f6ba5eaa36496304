"""Pallas fused FAST+NMS-L kernel: exact parity with the XLA path.

The kernel runs in interpret mode on CPU (tests force it via
OrbFrontend(use_pallas=True)); on the real TPU the same code compiles
through Mosaic.  Oracle: ops/frontend.fast_score_map + nms_lg, themselves
verified against the scalar NumPy spec in tests/test_frontend.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from jetson_slam_tpu.ops.frontend import OrbFrontend, fast_score_map, nms_lg
from jetson_slam_tpu.ops.pallas_frontend import (_circular_run_ge,
                                                 fast_score_nms_pallas)
from jetson_slam_tpu.ops.tables import BORDER_SKIP, fast_lut


def test_arithmetic_run_test_matches_lut_exhaustively():
    """All 65536 ring masks, several FAST_N_MIN values (FAST_N_MAX=16)."""
    all_masks = np.arange(1 << 16, dtype=np.uint32)
    for n_min in (5, 9, 12):
        lut = fast_lut(n_min, 16).astype(bool)
        got = np.asarray(_circular_run_ge(all_masks, n_min)) & (
            all_masks != 0xFFFF)
        assert np.array_equal(got, lut), f"n_min={n_min}"


def test_kernel_matches_xla_score_and_nms():
    rng = np.random.default_rng(3)
    lut = jnp.asarray(fast_lut(9, 16).astype(np.int32))
    H0, W0 = 120, 160
    sizes = [(120, 160), (100, 133), (83, 111)]
    stack = np.zeros((len(sizes), H0, W0), np.uint8)
    for i, (h, w) in enumerate(sizes):
        stack[i, :h, :w] = rng.integers(0, 256, (h, w), np.uint8)
    roi = np.array([[BORDER_SKIP, h - BORDER_SKIP, BORDER_SKIP, w - BORDER_SKIP]
                    for h, w in sizes], np.int32)
    raw_p, nms_p = fast_score_nms_pallas(
        jnp.asarray(stack), jnp.asarray(roi), 20, 9, interpret=True)
    raw_p, nms_p = np.asarray(raw_p), np.asarray(nms_p)
    for i, (h, w) in enumerate(sizes):
        score = np.asarray(fast_score_map(jnp.asarray(stack[i, :h, :w]),
                                          lut, 20))
        assert np.array_equal(raw_p[i, :h, :w], score)
        assert not raw_p[i, h:, :].any() and not raw_p[i, :, w:].any()
        neigh = [np.roll(score, (-dy, -dx), axis=(0, 1))
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                 if (dy, dx) != (0, 0)]
        nms_ref = np.where(score >= np.max(np.stack(neigh), axis=0), score, 0)
        assert np.array_equal(nms_p[i, :h, :w], nms_ref)


@pytest.mark.slow
def test_full_extract_parity_pallas_vs_xla():
    """End-to-end OrbFrontend.extract with the pallas score path must produce
    the identical FrontendResult to the XLA path."""
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    seq = make_stereo_sequence(seed=5, n_frames=1, h=120, w=160, n_points=300)
    img = seq.lefts[0]
    kw = dict(n_levels=3, scale_factor=1.2, threshold=20, tile_h=12, tile_w=12)
    fe_x = OrbFrontend(120, 160, use_pallas=False, **kw)
    fe_p = OrbFrontend(120, 160, use_pallas=True, **kw)
    rx = fe_x.extract(img)
    rp = fe_p.extract(img)
    assert np.array_equal(np.asarray(rx.valid), np.asarray(rp.valid))
    assert int(np.asarray(rx.valid).sum()) > 20
    for name in ("xs", "ys", "response", "angle", "octave", "desc"):
        a, b = np.asarray(getattr(rx, name)), np.asarray(getattr(rp, name))
        assert np.array_equal(a, b), name


def test_segment_test_matches_lut_all_nmin_nmax():
    """The generalized arithmetic segment test reproduces the quirky LUT
    scan bit-exactly for every (n_min, n_max) pair, all 65536 masks."""
    from jetson_slam_tpu.ops.pallas_frontend import _segment_test
    all_masks = np.arange(1 << 16, dtype=np.uint32)
    for n_min, n_max in ((9, 16), (9, 12), (7, 10), (5, 9), (12, 15),
                         (9, 9), (1, 3)):
        lut = fast_lut(n_min, n_max).astype(bool)
        got = np.asarray(_segment_test(all_masks, n_min, n_max))
        assert np.array_equal(got, lut), (n_min, n_max)


def test_kernel_mask_and_nmax_parity():
    """Masked rig + FAST_N_MAX < 16 keep the pallas path with exact parity
    against the XLA fallback (reference mask semantics orb_gpu.cpp:64-91)."""
    from jetson_slam_tpu.ops.tables import fast_lut as _lut
    rng = np.random.default_rng(7)
    H0, W0 = 120, 160
    img = rng.integers(0, 256, (H0, W0), np.uint8)
    mask = np.zeros((H0, W0), np.uint8)
    mask[20:100, 30:130] = 255          # realsense-style central window
    lut = jnp.asarray(_lut(9, 12).astype(np.int32))
    roi = np.array([[BORDER_SKIP, H0 - BORDER_SKIP,
                     BORDER_SKIP, W0 - BORDER_SKIP]], np.int32)
    mbin = (mask > 10).astype(np.uint8)
    raw_p, nms_p = fast_score_nms_pallas(
        jnp.asarray(img[None]), jnp.asarray(roi), 20, 9, 12,
        mask_u8=jnp.asarray(mbin[None]), interpret=True)
    score = np.asarray(fast_score_map(jnp.asarray(img), lut, 20,
                                      jnp.asarray(mbin.astype(np.int32))))
    assert np.array_equal(np.asarray(raw_p)[0], score)
    assert score[mask == 0].max(initial=0) == 0
    assert score[mask > 0].max() > 0


@pytest.mark.slow
def test_full_extract_parity_masked_rig():
    """End-to-end masked OrbFrontend: the pallas path (previously silently
    disabled for masked configs) matches the XLA path exactly."""
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    seq = make_stereo_sequence(seed=5, n_frames=1, h=120, w=160, n_points=300)
    img = seq.lefts[0]
    mask = np.zeros((120, 160), np.uint8)
    mask[10:110, 20:140] = 255
    kw = dict(n_levels=3, scale_factor=1.2, threshold=20, tile_h=12,
              tile_w=12, fast_n_max=12, mask=mask)
    fe_x = OrbFrontend(120, 160, use_pallas=False, **kw)
    fe_p = OrbFrontend(120, 160, use_pallas=True, **kw)
    assert fe_p._use_pallas            # masked rig keeps the fast path now
    rx = fe_x.extract(img)
    rp = fe_p.extract(img)
    assert np.array_equal(np.asarray(rx.valid), np.asarray(rp.valid))
    assert int(np.asarray(rx.valid).sum()) > 10
    for name in ("xs", "ys", "response", "angle", "octave", "desc"):
        a, b = np.asarray(getattr(rx, name)), np.asarray(getattr(rp, name))
        assert np.array_equal(a, b), name


@pytest.mark.slow
def test_pallas_descriptor_drift_vs_f32_band_path_bounded():
    """The Pallas descriptor kernel runs its blur at one-pass bf16 (a
    measured-ATE-neutral tradeoff, see ops/pallas_descriptor.py); descriptors
    may differ from the exact-f32 XLA band path by a few bits.  Pin the
    drift so future refactors cannot widen it unnoticed: mean Hamming
    distance <= 6/256 bits and >= 60% of descriptors within 8 bits."""
    from jetson_slam_tpu.io.synthetic import make_stereo_sequence
    seq = make_stereo_sequence(seed=11, n_frames=1, h=120, w=160,
                               n_points=300)
    img = seq.lefts[0]
    kw = dict(n_levels=3, scale_factor=1.2, threshold=20, tile_h=12,
              tile_w=12, use_pallas=False)
    fe_x = OrbFrontend(120, 160, use_pallas_desc=False, **kw)
    fe_p = OrbFrontend(120, 160, use_pallas_desc=True, **kw)
    rx, rp = fe_x.extract(img), fe_p.extract(img)
    vx = np.asarray(rx.valid) & np.asarray(rp.valid)
    assert vx.sum() > 20
    dx = np.asarray(rx.desc)[vx].astype(np.uint8)
    dp = np.asarray(rp.desc)[vx].astype(np.uint8)
    ham = np.unpackbits(dx ^ dp, axis=1).sum(axis=1)
    assert ham.mean() <= 6.0, ham.mean()
    assert (ham <= 8).mean() >= 0.6, (ham <= 8).mean()
