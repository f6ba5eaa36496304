"""jetson_slam_tpu: TPU-native stereo/mono/RGB-D visual SLAM (JAX/XLA/Pallas).

Capability-equivalent re-design of Jetson-SLAM (see SURVEY.md / PARITY.md).
"""


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> None:
    """Enable JAX's persistent compilation cache for the SLAM programs.

    The tracking loop compiles a handful of shape buckets (local-map
    candidate counts, BA problem sizes); caching them makes warm starts and
    repeated benchmark runs skip multi-second compiles.  Safe to call more
    than once; no-op if a cache dir is already configured.
    """
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "jetson_slam_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
