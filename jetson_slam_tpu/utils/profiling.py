"""Wall-clock + device tracing utilities.

Replaces the reference's `tictoc` (include/tictoc.hpp:7-43) and its CUDA-event
twin (include/tictoc_cuda.hpp) with:

- `tictoc`: the same steady-clock stopwatch, as a context manager / decorator
  with named scopes and aggregate stats (count / total / mean / median ms)
  instead of scattered prints (System.cpp:167-170, Frame.cpp:111-113).
- `device_tictoc`: blocks on the given JAX arrays before stopping the clock
  (the CUDA-event analog — XLA dispatch is async like CUDA streams).
- `trace`: context manager around jax.profiler for real XLA traces (the
  structured-profiler upgrade the reference lacks; SURVEY.md §5 "no NVTX").
"""
from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict


class TicToc:
    """Named stopwatch registry with aggregate statistics."""

    def __init__(self):
        self._samples = defaultdict(list)
        self._open = {}

    def tic(self, name: str = "default"):
        self._open[name] = time.perf_counter()

    def toc(self, name: str = "default") -> float:
        """Returns elapsed ms since tic(name) and records the sample."""
        dt = (time.perf_counter() - self._open.pop(name)) * 1e3
        self._samples[name].append(dt)
        return dt

    @contextlib.contextmanager
    def scope(self, name: str, sync_arrays=None):
        """Time a block; if sync_arrays is given, force completion by
        reading one element back (device work is async like CUDA streams;
        on the tunneled TPU platform `block_until_ready` is optimistic and
        would time dispatch only, so a real D2H readback is required)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_arrays is not None:
                import jax
                leaves = jax.tree_util.tree_leaves(sync_arrays)
                if leaves:
                    jax.device_get(leaves[0].ravel()[:1])
            self._samples[name].append((time.perf_counter() - t0) * 1e3)

    def stats(self, name: str) -> dict:
        s = self._samples[name]
        if not s:
            return {"count": 0}
        return {
            "count": len(s),
            "total_ms": sum(s),
            "mean_ms": sum(s) / len(s),
            "median_ms": statistics.median(s),
            "min_ms": min(s),
            "max_ms": max(s),
        }

    def report(self) -> str:
        lines = []
        for name in sorted(self._samples):
            st = self.stats(name)
            lines.append(
                f"{name:32s} n={st['count']:6d}  mean={st['mean_ms']:8.3f} ms"
                f"  median={st['median_ms']:8.3f} ms  total={st['total_ms']:10.1f} ms")
        return "\n".join(lines)

    def reset(self):
        self._samples.clear()
        self._open.clear()


# module-level default registry, mirroring the reference's global tictoc use
tictoc = TicToc()


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace around a block (view with TensorBoard/Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
