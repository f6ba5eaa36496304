"""Probe the tunnel's D2H behavior: per-array latency vs batched pulls,
and whether copy_to_host_async actually overlaps."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

import jetson_slam_tpu
jetson_slam_tpu.enable_compilation_cache()


def t(fn, n=15):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    S = 640
    f = jnp.float32
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make(k):
        ks = jax.random.split(k, 4)
        arrs = [jax.random.normal(ks[0], (S,)) for _ in range(10)]
        big = jax.random.normal(ks[1], (S, 32))
        i32 = jnp.arange(S, dtype=jnp.int32)
        return tuple(arrs) + (big, i32, i32 < 5)

    out = make(key)
    jax.block_until_ready(out)
    print("one small arr   :", t(lambda: jax.device_get(out[0])), "ms")
    print("tuple of 13     :", t(lambda: jax.device_get(out)), "ms")

    @jax.jit
    def make_packed(k):
        o = make(k)
        flat = jnp.concatenate([a.reshape(-1).astype(f) for a in o])
        return flat

    packed = make_packed(key)
    jax.block_until_ready(packed)
    print("packed one arr  :", t(lambda: jax.device_get(packed)), "ms")

    # async copy overlap: dispatch, start async copies, host-sleep, pull
    def pull_after(sleep_s):
        o = make(jax.random.PRNGKey(1))
        for a in o:
            try:
                a.copy_to_host_async()
            except Exception as e:
                print("copy_to_host_async failed:", e)
                break
        time.sleep(sleep_s)
        t0 = time.perf_counter()
        jax.device_get(o)
        return (time.perf_counter() - t0) * 1e3

    pull_after(0.1)
    print("pull right away :", min(pull_after(0.0) for _ in range(10)), "ms")
    print("pull after 50ms :", min(pull_after(0.05) for _ in range(10)), "ms")

    # dispatch-to-dispatch cost of a no-op jitted call (python+enqueue)
    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8,))
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(100):
        x = tiny(x)
    enq = (time.perf_counter() - t0) / 100 * 1e3
    print(f"enqueue cost    : {enq:.3f} ms")
    jax.block_until_ready(x)


if __name__ == "__main__":
    main()
