"""Measure gather strategy throughput on the live backend.

K=3200 keypoints (both eyes, all levels), 1024 samples each = 3.3M elems.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 240, 320
K = 3200
S = 1024
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
kx = jnp.asarray(rng.integers(20, W - 20, K).astype(np.int32))
ky = jnp.asarray(rng.integers(20, H - 20, K).astype(np.int32))
doff = jnp.asarray(rng.integers(-19, 19, (K, S)).astype(np.int32))
dxoff = jnp.asarray(rng.integers(-19, 19, (K, S)).astype(np.int32))


def bench(name, fn, n=30):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


# A) flat take: (K, S) indices into flat image
@jax.jit
def flat_take(img, ky, kx, doff, dxoff):
    flat = img.reshape(-1).astype(jnp.int32)
    idx = (ky[:, None] + doff) * W + kx[:, None] + dxoff
    return jnp.take(flat, idx)

bench("A flat take (K,1024) from img", lambda: flat_take(img, ky, kx, doff, dxoff))


# B) patch extraction via vmap dynamic_slice (current approach), 40x40
@jax.jit
def vmap_patches(img, ky, kx):
    def one(y, x):
        return jax.lax.dynamic_slice(img, (y - 19, x - 19), (40, 40))
    return jax.vmap(one)(ky, kx)

bench("B vmap dyn_slice 40x40 patches", lambda: vmap_patches(img, ky, kx))


# C) one-hot matmul patches: rows then cols
@jax.jit
def onehot_patches(img, ky, kx):
    imf = img.astype(jnp.bfloat16)
    ys = ky[:, None] + jnp.arange(-19, 21)[None, :]        # (K, 40)
    oh_y = (ys[:, :, None] == jnp.arange(H)[None, None, :]).astype(jnp.bfloat16)
    band = jnp.einsum("kry,yx->krx", oh_y, imf)            # (K, 40, W)
    xs = kx[:, None] + jnp.arange(-19, 21)[None, :]
    oh_x = (xs[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("krx,kcx->krc", band, oh_x)          # (K, 40, 40)

bench("C one-hot matmul 40x40 patches", lambda: onehot_patches(img, ky, kx))


# D) take_along_axis sampling from patches (K,1600) -> (K,1024)
patches = jax.block_until_ready(vmap_patches(img, ky, kx))
pf = patches.reshape(K, -1).astype(jnp.int32)
sidx = jnp.asarray(rng.integers(0, 1600, (K, S)).astype(np.int32))

@jax.jit
def taa(pf, sidx):
    return jnp.take_along_axis(pf, sidx, axis=1)

bench("D take_along_axis (K,1600)->(K,1024)", lambda: taa(pf, sidx))


# E) in-patch sampling via one-hot row select + col mask
@jax.jit
def onehot_sample(patches, doff, dxoff):
    p = patches.astype(jnp.bfloat16)                       # (K, 40, 40)
    oh_r = (doff[:, :, None] + 19 == jnp.arange(40)[None, None, :]).astype(jnp.bfloat16)
    rows = jnp.einsum("ksr,krc->ksc", oh_r, p)             # (K, S, 40)
    oh_c = (dxoff[:, :, None] + 19 == jnp.arange(40)[None, None, :]).astype(jnp.bfloat16)
    return jnp.sum(rows * oh_c, axis=-1)                   # (K, S)

bench("E one-hot sample from patches", lambda: onehot_sample(patches, doff, dxoff))
