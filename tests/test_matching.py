"""Tests for Hamming matching and the stereo matcher."""
import numpy as np
import jax.numpy as jnp

from jetson_slam_tpu.ops.hamming import hamming_matrix, hamming_pairs
from jetson_slam_tpu.ops.frontend import OrbFrontend
from jetson_slam_tpu.ops.stereo import stereo_match, stack_pyramid
from tests.oracles.frontend import hamming_distance


def test_hamming_matrix_exact(rng):
    a = rng.integers(0, 256, (37, 32)).astype(np.uint8)
    b = rng.integers(0, 256, (53, 32)).astype(np.uint8)
    got = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(0, 37, 7):
        for j in range(0, 53, 11):
            assert got[i, j] == hamming_distance(a[i], b[j])


def test_hamming_pairs_exact(rng):
    a = rng.integers(0, 256, (64, 32)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 32)).astype(np.uint8)
    got = np.asarray(hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
    want = [hamming_distance(a[i], b[i]) for i in range(64)]
    np.testing.assert_array_equal(got, want)


def _render_stereo_pair(rng, h=120, w=160, disparity=8):
    """Left image = textured blobs; right image = left shifted by `disparity`."""
    img = (rng.random((h, w + disparity)) * 40).astype(np.float32)
    for _ in range(30):
        y, x = rng.integers(12, h - 12), rng.integers(12, w + disparity - 12)
        s = int(rng.integers(4, 9))
        img[y:y + s, x:x + s] += rng.integers(60, 200)
    # a feature at texture column X appears at u_left = X, u_right = X - d.
    # Independent per-eye sensor noise keeps window-correlation costs > 0
    # (the reference's median prune drops everything when median cost == 0).
    left = np.clip(img[:, :w] + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
    right = np.clip(img[:, disparity:] + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
    return left, right


def test_stereo_match_recovers_constant_disparity():
    rng = np.random.default_rng(11)
    disparity = 8
    left_img, right_img = _render_stereo_pair(rng, disparity=disparity)
    h, w = left_img.shape
    fe = OrbFrontend(h, w, n_levels=2, scale_factor=1.2, threshold=20,
                     tile_h=16, tile_w=16)
    L = fe.extract(left_img)
    R = fe.extract(right_img)
    pyrL = stack_pyramid(fe.compute_pyramid(jnp.asarray(left_img)), h, w)
    pyrR = stack_pyramid(fe.compute_pyramid(jnp.asarray(right_img)), h, w)
    mbf, mb = 40.0, 0.5  # fx*b=40 -> depth at disparity 8 = 5.0
    u_right, depth, _ = stereo_match(
        L, R, pyrL, pyrR, np.asarray(fe.geom.widths, np.int32),
        np.asarray(fe.geom.scales, np.float32),
        np.asarray(fe.geom.inv_scales, np.float32),
        mbf, mb, fe.geom.n_levels)
    u_right = np.asarray(u_right)
    depth = np.asarray(depth)
    valid = np.asarray(L.valid)
    matched = depth > 0
    assert matched.sum() >= 5, f"too few stereo matches: {matched.sum()}"
    assert not np.any(matched & ~valid)
    # recovered disparity should be near the ground truth for most matches
    disp = np.asarray(L.xs)[matched] - u_right[matched]
    err = np.abs(disp - disparity)
    assert np.median(err) < 1.0, f"median disparity error {np.median(err)}"
    got_depth = depth[matched]
    assert np.median(np.abs(got_depth - mbf / disparity)) < 1.0
