"""Unit tests: JAX front-end kernels vs NumPy oracles (SURVEY.md §4 strategy)."""
import numpy as np
import pytest

from jetson_slam_tpu.ops import tables
from jetson_slam_tpu.ops.frontend import (
    OrbFrontend,
    fast_score_map,
    gaussian_blur,
    ic_angles,
    nms_lg,
    nms_ms,
    orb_descriptors,
)
from tests.oracles import frontend as oracle

import jax.numpy as jnp


def synth_image(rng, h=120, w=160):
    """Textured synthetic image with corners: random blobs + box edges."""
    img = (rng.random((h, w)) * 40).astype(np.float32)
    for _ in range(25):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        s = rng.integers(3, 9)
        img[y:y + s, x:x + s] += rng.integers(60, 200)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def img():
    return synth_image(np.random.default_rng(42))


def test_fast_lut_spot_checks():
    lut = tables.fast_lut(9, 16)
    # contiguous run of 9 -> accepted
    assert lut[0b0000000111111111] == 1
    # run of 8 -> rejected for n_min=9
    assert lut[0b0000000011111111] == 0
    # wraparound run: 5 leading + 4 trailing = 9
    assert lut[0b1111100000001111] == 1
    # all-ones entry is never written by the reference loop (j < 0xFFFF)
    assert lut[0xFFFF] == 0


def test_fast_score_matches_oracle(img):
    th = 20
    want = oracle.fast_score(img, th, 9, 16)
    lut = jnp.asarray(tables.fast_lut(9, 16).astype(np.int32))
    got = np.asarray(fast_score_map(jnp.asarray(img), lut, th))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_fast_score_respects_mask(img):
    th = 20
    mask = np.ones_like(img, dtype=np.int32)
    mask[:, : img.shape[1] // 2] = 0
    want = oracle.fast_score(img, th, 9, 16, mask=mask)
    lut = jnp.asarray(tables.fast_lut(9, 16).astype(np.int32))
    got = np.asarray(fast_score_map(jnp.asarray(img), lut, th, jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_nms_lg_matches_oracle(img):
    th = 20
    score = oracle.fast_score(img, th, 9, 16)
    wx, wy, ws = oracle.nms_lg(score, 30, 30)
    gx, gy, gs = (np.asarray(a) for a in nms_lg(jnp.asarray(score), 30, 30))
    np.testing.assert_array_equal(gs, ws)
    nz = ws > 0
    np.testing.assert_array_equal(gx[nz], wx[nz])
    np.testing.assert_array_equal(gy[nz], wy[nz])


def test_ic_angle_matches_oracle(img):
    rng = np.random.default_rng(3)
    ys = rng.integers(20, img.shape[0] - 21, size=32)
    xs = rng.integers(20, img.shape[1] - 21, size=32)
    want = np.array([oracle.ic_angle(img, x, y) for x, y in zip(xs, ys)], dtype=np.float32)
    got = np.asarray(ic_angles(jnp.asarray(img), jnp.asarray(xs.astype(np.int32)),
                               jnp.asarray(ys.astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gaussian_blur_close_to_oracle(img):
    want = oracle.gaussian_blur(img)
    got = np.asarray(gaussian_blur(jnp.asarray(img), jnp.asarray(tables.gaussian_weights())))
    # float summation order differs from the scalar oracle; uint8 truncation
    # may flip by 1 on near-integer values
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_descriptor_matches_oracle(img):
    blur = oracle.gaussian_blur(img)
    rng = np.random.default_rng(5)
    ys = rng.integers(21, img.shape[0] - 22, size=16)
    xs = rng.integers(21, img.shape[1] - 22, size=16)
    angles = rng.uniform(-np.pi, np.pi, size=16).astype(np.float32)
    want = np.stack([oracle.orb_descriptor(blur, x, y, a) for x, y, a in zip(xs, ys, angles)])
    got = np.asarray(orb_descriptors(jnp.asarray(blur), jnp.asarray(xs.astype(np.int32)),
                                     jnp.asarray(ys.astype(np.int32)), jnp.asarray(angles)))
    np.testing.assert_array_equal(got, want)


def test_nms_ms_matches_oracle(img):
    # build a 3-level synthetic slot set
    geom = tables.pyramid_geometry(img.shape[0], img.shape[1], 3, 1.2, 20, 20)
    rng = np.random.default_rng(7)
    K = geom.total_slots
    lvl = np.zeros(K, np.int32)
    scl = np.ones(K, np.float32)
    for i in range(geom.n_levels):
        o = geom.level_offsets[i]
        n = geom.n_tiles_h[i] * geom.n_tiles_w[i]
        lvl[o:o + n] = i
        scl[o:o + n] = np.float32(geom.scales[i])
    kp_s = np.where(rng.random(K) < 0.5, rng.integers(1, 500, K), 0).astype(np.int32)
    kp_y = np.zeros(K, np.int32)
    kp_x = np.zeros(K, np.int32)
    for i in range(geom.n_levels):
        o = geom.level_offsets[i]
        for t in range(geom.n_tiles_h[i] * geom.n_tiles_w[i]):
            ty, tx = t // geom.n_tiles_w[i], t % geom.n_tiles_w[i]
            hi = geom.heights[i]
            wi = geom.widths[i]
            y = min(max(ty * geom.tile_h[i] + int(rng.integers(0, geom.tile_h[i])), 20), hi - 21)
            x = min(max(tx * geom.tile_w[i] + int(rng.integers(0, geom.tile_w[i])), 20), wi - 21)
            kp_y[o + t] = y
            kp_x[o + t] = x
    want = oracle.nms_ms(kp_x, kp_y, kp_s.copy(), lvl, scl, geom.n_levels,
                         geom.heights[0], geom.widths[0])
    got = np.asarray(nms_ms(jnp.asarray(kp_x), jnp.asarray(kp_y), jnp.asarray(kp_s),
                            jnp.asarray(lvl), jnp.asarray(scl), geom.n_levels,
                            geom.heights[0], geom.widths[0]))
    np.testing.assert_array_equal(got, want)


def test_extractor_end_to_end(img):
    fe = OrbFrontend(img.shape[0], img.shape[1], n_levels=3, scale_factor=1.2,
                     threshold=20, tile_h=20, tile_w=20)
    res = fe.extract(img)
    valid = np.asarray(res.valid)
    assert valid.sum() > 10, "expected some keypoints on the synthetic image"
    xs = np.asarray(res.xs)[valid]
    ys = np.asarray(res.ys)[valid]
    assert xs.min() >= 0 and xs.max() < img.shape[1]
    assert ys.min() >= 0 and ys.max() < img.shape[0]
    # level-0 keypoints must match the oracle pipeline exactly
    score = oracle.fast_score(img, 20, 9, 16)
    ox, oy, os_ = oracle.nms_lg(score, 20, 20)
    o = fe.geom.level_offsets[0]
    n = fe.geom.n_tiles_h[0] * fe.geom.n_tiles_w[0]
    np.testing.assert_array_equal(np.asarray(res.response)[o:o + n], os_)
    # descriptors at level 0: validate a few against the oracle
    blur = oracle.gaussian_blur(img)
    got_desc = np.asarray(res.desc)
    got_angle = np.asarray(res.angle)
    idxs = np.flatnonzero(os_ > 0)[:5]
    for t in idxs:
        ang = oracle.ic_angle(img, ox[t], oy[t])
        np.testing.assert_allclose(got_angle[o + t], np.degrees(ang), atol=1e-4)
        want = oracle.orb_descriptor(blur, ox[t], oy[t], ang)
        d = oracle.hamming_distance(want, got_desc[o + t])
        assert d <= 8, f"descriptor mismatch {d} bits (blur truncation tolerance)"
