"""Second-pass stage timing: isolate what makes ic_angles/descriptors slow."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from jetson_slam_tpu.ops import frontend as F
from jetson_slam_tpu.ops import tables

H, W = 240, 320
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
K = 300
kx = jnp.asarray(rng.integers(20, W - 20, K).astype(np.int32))
ky = jnp.asarray(rng.integers(20, H - 20, K).astype(np.int32))


def bench(name, fn, n=100):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


ang_j = jax.jit(F.ic_angles)
a = jax.block_until_ready(ang_j(img, kx, ky))
bench("ic_angles K=300", lambda: ang_j(img, kx, ky))

# moments without atan2
wu, wv = tables.ic_angle_masks()
wuj = jnp.asarray(wu.astype(np.int32))
wvj = jnp.asarray(wv.astype(np.int32))

@jax.jit
def moments_only(img, kx, ky):
    im = img.astype(jnp.int32)
    def one(x, y):
        patch = jax.lax.dynamic_slice(im, (y - 15, x - 15), (31, 31))
        return jnp.sum(patch * wuj), jnp.sum(patch * wvj)
    return jax.vmap(one)(kx, ky)

bench("moments only (no atan2)", lambda: moments_only(img, kx, ky))

@jax.jit
def atan_only(m01, m10):
    return jnp.arctan2(m01.astype(jnp.float32), m10.astype(jnp.float32))

m10, m01 = jax.block_until_ready(moments_only(img, kx, ky))
bench("atan2 only K=300", lambda: atan_only(m01, m10))

# patches via i32 image first
@jax.jit
def patches_i32(img, kx, ky):
    im = img.astype(jnp.int32)
    def one(x, y):
        return jax.lax.dynamic_slice(im, (y - 15, x - 15), (31, 31))
    return jax.vmap(one)(kx, ky)

bench("vmap dyn_slice i32 31x31 K=300", lambda: patches_i32(img, kx, ky))

# same but K padded to 384 (multiple of 128)
kx2 = jnp.asarray(rng.integers(20, W - 20, 384).astype(np.int32))
ky2 = jnp.asarray(rng.integers(20, H - 20, 384).astype(np.int32))
bench("vmap dyn_slice i32 31x31 K=384", lambda: patches_i32(img, kx2, ky2))

desc_j = jax.jit(F.orb_descriptors)
aa = jnp.zeros(K, jnp.float32)
bench("orb_descriptors K=300", lambda: desc_j(img, kx, ky, aa))

# descriptor WITHOUT bit packing
@jax.jit
def desc_nopack(img_blur_u8, kp_x, kp_y, angles):
    pat = tables.orb_pattern().astype(np.float32)
    px = jnp.asarray(pat[:, 0]); py = jnp.asarray(pat[:, 1])
    a = jnp.cos(angles); b = jnp.sin(angles)
    rows = jnp.round(px[None, :] * b[:, None] + py[None, :] * a[:, None]).astype(jnp.int32)
    cols = jnp.round(px[None, :] * a[:, None] - py[None, :] * b[:, None]).astype(jnp.int32)
    hp = F.DESC_PATCH_HALF
    def patch_of(x, y):
        return jax.lax.dynamic_slice(img_blur_u8, (y - hp, x - hp), (F.DESC_PATCH, F.DESC_PATCH))
    patches = jax.vmap(patch_of)(kp_x, kp_y).reshape(kp_x.shape[0], -1)
    flat = (rows + hp) * F.DESC_PATCH + (cols + hp)
    samples = jnp.take_along_axis(patches, flat, axis=1).astype(jnp.int32)
    return samples

bench("desc sampling only (no packing)", lambda: desc_nopack(img, kx, ky, aa))

# bit packing alone
samples = jax.block_until_ready(desc_nopack(img, kx, ky, aa))

@jax.jit
def pack(samples):
    t0 = samples[:, 0::2]; t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint8).reshape(samples.shape[0], 32, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :].astype(jnp.uint32)
    return jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)

bench("bit packing only", lambda: pack(samples))

# gaussian blur via conv vs separable matmul
gauss = jnp.asarray(tables.gaussian_weights())
blur_j = jax.jit(lambda im: F.gaussian_blur(im, gauss))
bench("gaussian_blur conv", lambda: blur_j(img))

score_j = jax.jit(lambda im: F.fast_score_map(im, jnp.asarray(tables.fast_lut(9, 16).astype(np.int32)), 20))
bench("fast_score", lambda: score_j(img))

# fast score without LUT take
@jax.jit
def score_nolut(img_u8):
    im = img_u8.astype(jnp.int32)
    v = im; vt = v + 20; v_t = v - 20
    ring = [jnp.roll(im, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in np.asarray(F.FAST_RING)]
    ring = jnp.stack(ring)
    bright = ring > vt[None]
    # arc-run >= 9 via AND-rotate on the bool stack
    run = bright
    for _ in range(8):
        run = run & jnp.roll(run, 1, axis=0)
    is_c = jnp.any(run, axis=0)
    sad = jnp.sum(jnp.abs(ring - v[None]), axis=0)
    return jnp.where(is_c, sad, 0)

bench("fast_score arc-run (no LUT)", lambda: score_nolut(img))
