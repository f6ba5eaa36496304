"""Oracle parity for the Pallas stereo window-correlation kernel
(ops/pallas_stereo.py) against the XLA band path (ops/stereo.py
stereo_match_bands).  Runs in interpret mode on CPU; the cost arithmetic is
integer-exact in f32, so outputs must agree bit-for-bit up to float
round-trip of identical values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jetson_slam_tpu.io.synthetic import make_stereo_sequence
from jetson_slam_tpu.ops.frontend import OrbFrontend
from jetson_slam_tpu.ops.stereo import (stereo_match_bands,
                                        stereo_match_bands_batch_pallas)


@pytest.fixture(scope="module")
def setup():
    seq = make_stereo_sequence(seed=5, n_frames=3, h=120, w=160, n_points=300)
    fe = OrbFrontend(120, 160, n_levels=3, scale_factor=1.2, threshold=20,
                     tile_h=12, tile_w=12)
    return seq, fe


def test_pallas_stereo_matches_band_path(setup):
    seq, fe = setup
    T = fe._tables
    B = 3
    lefts = jnp.asarray(np.stack(seq.lefts[:B]))
    rights = jnp.asarray(np.stack(seq.rights[:B]))
    mbf = jnp.float32(seq.bf)
    min_z = jnp.float32(seq.baseline)

    @jax.jit
    def front(l, r):
        res, _raw, bands = fe._extract_batch_core(
            T, jnp.concatenate([l, r], axis=0))
        L = jax.tree_util.tree_map(lambda a: a[:B], res)
        R = jax.tree_util.tree_map(lambda a: a[B:], res)
        return L, R, bands[:B], bands[B:]

    L, R, bl, br = front(lefts, rights)

    br128 = fe._extract_bands_r128(T, rights)
    assert np.array_equal(np.asarray(br128)[..., :br.shape[-1]],
                          np.asarray(br))
    u_p, d_p, dist_p = stereo_match_bands_batch_pallas(
        L, R, bl, br128, T["band_y0"], T["band_x0"],
        T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
        T["widths"], T["scales"], T["inv_scales"], mbf, min_z,
        fe._max_tiles_w, int(max(fe.geom.tile_h)), int(max(fe.geom.tile_w)),
        interpret=True)

    for i in range(B):
        li = jax.tree_util.tree_map(lambda a: a[i], L)
        ri = jax.tree_util.tree_map(lambda a: a[i], R)
        u_b, d_b, dist_b = stereo_match_bands(
            li, ri, bl[i], br[i], T["band_y0"], T["band_x0"],
            T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
            T["widths"], T["scales"], T["inv_scales"], mbf, min_z)
        np.testing.assert_allclose(np.asarray(u_p[i]), np.asarray(u_b),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d_p[i]), np.asarray(d_b),
                                   atol=1e-4)
        assert np.array_equal(np.asarray(dist_p[i]), np.asarray(dist_b))
        matched = (np.asarray(d_p[i]) > 0).sum()
        assert matched >= 20, f"frame {i}: only {matched} stereo matches"


def test_pallas_stereo_other_tile_geometry():
    """KITTI-style config (single level, larger tiles): the kernel's static
    span/window arithmetic must hold for any tile size, not just 12/16."""
    seq = make_stereo_sequence(seed=8, n_frames=2, h=160, w=240, n_points=400)
    fe = OrbFrontend(160, 240, n_levels=1, scale_factor=1.2, threshold=20,
                     tile_h=25, tile_w=25)
    T = fe._tables
    B = 2
    lefts = jnp.asarray(np.stack(seq.lefts[:B]))
    rights = jnp.asarray(np.stack(seq.rights[:B]))
    mbf = jnp.float32(seq.bf)
    min_z = jnp.float32(seq.baseline)

    @jax.jit
    def front(l, r):
        res, _raw, bands = fe._extract_batch_core(
            T, jnp.concatenate([l, r], axis=0))
        L = jax.tree_util.tree_map(lambda a: a[:B], res)
        R = jax.tree_util.tree_map(lambda a: a[B:], res)
        return L, R, bands[:B], bands[B:]

    L, R, bl, br = front(lefts, rights)
    br128 = fe._extract_bands_r128(T, rights)
    u_p, d_p, dist_p = stereo_match_bands_batch_pallas(
        L, R, bl, br128, T["band_y0"], T["band_x0"],
        T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
        T["widths"], T["scales"], T["inv_scales"], mbf, min_z,
        fe._max_tiles_w, int(max(fe.geom.tile_h)), int(max(fe.geom.tile_w)),
        interpret=True)
    for i in range(B):
        li = jax.tree_util.tree_map(lambda a: a[i], L)
        ri = jax.tree_util.tree_map(lambda a: a[i], R)
        u_b, d_b, _ = stereo_match_bands(
            li, ri, bl[i], br[i], T["band_y0"], T["band_x0"],
            T["lvl_tile_h"], T["lvl_tile_w"], T["lvl_ntw"], T["lvl_off"],
            T["widths"], T["scales"], T["inv_scales"], mbf, min_z)
        np.testing.assert_allclose(np.asarray(u_p[i]), np.asarray(u_b),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d_p[i]), np.asarray(d_b),
                                   atol=1e-4)
        assert (np.asarray(d_p[i]) > 0).sum() >= 10
