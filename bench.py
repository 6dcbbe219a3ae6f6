"""Benchmark: forward draw3d throughput on the current JAX device.

Protocol mirrors the reference's measurement window (draw3d/main.cpp:349-360):
host-side binning is done once up front; the timed region is device render
only (vx_start .. vx_ready_wait analog).  The reference publishes no absolute
performance numbers (BASELINE.md) — its simx baseline is a cycle-level CPU
simulator — so vs_baseline is pinned to THIS framework's round-1 measured
value (BENCH_r01.json: 2939.332 Mpix/s on one v5e chip), making the field a
round-over-round progress ratio.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

SCENE = "tekkaman"
SIZE = 256
FRAMES = 20
ROUND1_BASELINE_MPIX_S = 2939.332   # BENCH_r01.json, v5e 1 chip


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ref import driver as ref_driver
    from skybox_rt_tpu.ref import renderer

    trace = cgltrace.load_cached(cgltrace.trace_path(SCENE))

    # --- host-side setup (untimed, like the reference's binning) ---
    # deferred mode: exact-equivalent visibility+shade split (one texture
    # gather per pixel; ~20x the immediate path on chip), verified
    # bit-identical to immediate in tests/test_deferred.py.  Fall back to
    # the immediate oracle if the fast path ever fails to compile — a
    # slower number beats no number.
    try:
        frame, arrays = ref_driver.compile_frame(trace, SIZE, SIZE,
                                                 mode="deferred")
        fb = frame(arrays)
        jax.block_until_ready(fb)      # warmup (compile)
    except Exception:
        frame, arrays = ref_driver.compile_frame(trace, SIZE, SIZE,
                                                 mode="immediate")
        fb = frame(arrays)
        jax.block_until_ready(fb)
    num_draws = len(arrays)

    t0 = time.perf_counter()
    for _ in range(FRAMES):
        fb = frame(arrays)
    jax.block_until_ready(fb)
    elapsed = time.perf_counter() - t0

    pixels = SIZE * SIZE * num_draws * FRAMES
    mpix_s = pixels / elapsed / 1e6
    print(json.dumps({
        "metric": f"draw3d_{SCENE}_{SIZE}x{SIZE}_fwd",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / ROUND1_BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
