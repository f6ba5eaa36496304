"""Bisect orb_descriptors + fast_score internals."""
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
ang = jnp.asarray(rng.uniform(-3, 3, K).astype(np.float32))

pat = tables.orb_pattern().astype(np.float32)
px = jnp.asarray(pat[:, 0]); py = jnp.asarray(pat[:, 1])
hp = F.DESC_PATCH_HALF


def bench(name, fn, n=50):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


@jax.jit
def rotoff(angles):
    a = jnp.cos(angles); b = jnp.sin(angles)
    rows = jnp.round(px[None, :] * b[:, None] + py[None, :] * a[:, None]).astype(jnp.int32)
    cols = jnp.round(px[None, :] * a[:, None] - py[None, :] * b[:, None]).astype(jnp.int32)
    return rows, cols

bench("rotated offsets (K,512)", lambda: rotoff(ang))

@jax.jit
def patches_u8(img, kx, ky):
    def one(x, y):
        return jax.lax.dynamic_slice(img, (y - hp, x - hp), (F.DESC_PATCH, F.DESC_PATCH))
    return jax.vmap(one)(kx, ky)

bench("u8 patch gather (K,40,40)", lambda: patches_u8(img, kx, ky))

@jax.jit
def patches_reshaped(img, kx, ky):
    return patches_u8(img, kx, ky).reshape(K, -1)

bench("u8 patch gather + reshape (K,1600)", lambda: patches_reshaped(img, kx, ky))

pf_u8 = jax.block_until_ready(patches_reshaped(img, kx, ky))
rows, cols = jax.block_until_ready(rotoff(ang))
flat = jax.block_until_ready(jax.jit(lambda r, c: (r + hp) * F.DESC_PATCH + (c + hp))(rows, cols))

@jax.jit
def taa_u8(pf, flat):
    return jnp.take_along_axis(pf, flat, axis=1)

bench("take_along_axis u8 (K,1600)->(K,512)", lambda: taa_u8(pf_u8, flat))

pf_i32 = jax.block_until_ready(pf_u8.astype(jnp.int32))

@jax.jit
def taa_i32(pf, flat):
    return jnp.take_along_axis(pf, flat, axis=1)

bench("take_along_axis i32 (K,1600)->(K,512)", lambda: taa_i32(pf_i32, flat))

# flat-index variant: gather straight from image
@jax.jit
def flat_gather(img, kx, ky, rows, cols):
    flatim = img.reshape(-1).astype(jnp.int32)
    idx = (ky[:, None] + rows) * W + kx[:, None] + cols
    return jnp.take(flatim, idx)

bench("flat gather from image (K,512)", lambda: flat_gather(img, kx, ky, rows, cols))

# full descriptor via flat gather
@jax.jit
def desc_flat(img, kx, ky, angles):
    a = jnp.cos(angles); b = jnp.sin(angles)
    rows = jnp.round(px[None, :] * b[:, None] + py[None, :] * a[:, None]).astype(jnp.int32)
    cols = jnp.round(px[None, :] * a[:, None] - py[None, :] * b[:, None]).astype(jnp.int32)
    flatim = img.reshape(-1).astype(jnp.int32)
    idx = (ky[:, None] + rows) * W + kx[:, None] + cols
    samples = jnp.take(flatim, idx)
    t0 = samples[:, 0::2]; t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.int32).reshape(K, 32, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)

bench("FULL desc via flat gather", lambda: desc_flat(img, kx, ky, ang))

# fast_score LUT take isolated
lut = jnp.asarray(tables.fast_lut(9, 16).astype(np.int32))
bidx = jnp.asarray(rng.integers(0, 65536, (H, W)).astype(np.int32))

@jax.jit
def lut_take(lut, bidx):
    return jnp.take(lut, bidx) | jnp.take(lut, bidx ^ 21845)

bench("LUT double-take (H,W) from 65536", lambda: lut_take(lut, bidx))

# u8 LUT
lut8 = jnp.asarray(tables.fast_lut(9, 16).astype(np.uint8))
@jax.jit
def lut_take8(lut, bidx):
    return jnp.take(lut, bidx) | jnp.take(lut, bidx ^ 21845)
bench("LUT double-take u8", lambda: lut_take8(lut8, bidx))
