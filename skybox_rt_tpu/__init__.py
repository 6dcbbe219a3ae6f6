"""skybox_rt_tpu — TPU-native differentiable rasterizer & ray tracer.

Importing the package is side-effect-free except for enabling JAX's
persistent compilation cache (first compiles of the tile kernels are tens
of seconds on a TPU tunnel; the cache makes every later process start
warm).  Disable with SKYBOX_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os


def _enable_compile_cache():
    if os.environ.get("SKYBOX_NO_COMPILE_CACHE") == "1":
        return
    # the axon tunnel's remote-compile helper interacts badly with the
    # persistent cache (measured 10-20x slower compiles, zero entries
    # written) — keep the cache for real local TPU/CPU backends only
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return
    cache_dir = os.environ.get(
        "SKYBOX_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "skybox_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass            # cache is an optimization, never a requirement


_enable_compile_cache()
