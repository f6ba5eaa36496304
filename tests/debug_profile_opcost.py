"""Estimate fixed per-op overhead inside one jitted program on the backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np

x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (240, 320)).astype(np.int32))


def chain(n_ops):
    @jax.jit
    def f(x):
        y = x
        for i in range(n_ops):
            y = y + (i % 3) - (y // 7)  # 3 ops per iter, non-fusable? they fuse...
        return y
    return f


def rolls(n_ops):
    @jax.jit
    def f(x):
        y = x
        for i in range(n_ops):
            y = y + jnp.roll(x, i + 1, axis=(i % 2))
        return y
    return f


def bench(name, fn, n=50):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


f10, f100 = chain(10), chain(100)
bench("chain elementwise 10 iters", lambda: f10(x))
bench("chain elementwise 100 iters", lambda: f100(x))
r4, r16, r64 = rolls(4), rolls(16), rolls(64)
bench("rolls 4", lambda: r4(x))
bench("rolls 16", lambda: r16(x))
bench("rolls 64", lambda: r64(x))

# atan2 sized
for K in (300, 30000):
    a = jnp.ones(K, jnp.float32)
    g = jax.jit(lambda u, v: jnp.arctan2(u, v))
    jax.block_until_ready(g(a, a))
    t0 = time.perf_counter()
    for _ in range(100):
        out = g(a, a)
    jax.block_until_ready(out)
    print(f"atan2 K={K:6d}                      {(time.perf_counter()-t0)/100*1e3:8.3f} ms")

# dispatch of 3 programs vs 1 fused
h1 = jax.jit(lambda x: x + 1)
h2 = jax.jit(lambda x: x * 2)
h3 = jax.jit(lambda x: x - 3)
hf = jax.jit(lambda x: (x + 1) * 2 - 3)
bench("3 separate dispatches", lambda: h3(h2(h1(x))))
bench("1 fused dispatch", lambda: hf(x))
