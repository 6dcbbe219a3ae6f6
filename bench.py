"""Benchmark: forward draw3d throughput on the current JAX device.

Protocol mirrors the reference's measurement window (draw3d/main.cpp:349-360):
host-side binning is done once up front; the timed region is device render
only (vx_start .. vx_ready_wait analog).  The reference publishes no absolute
performance numbers (BASELINE.md) — its simx baseline is a cycle-level CPU
simulator.  vs_baseline is reported against a nominal 1.0 Mpix/s simx-class
throughput so the number stays comparable across rounds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

SCENE = "tekkaman"
SIZE = 256
FRAMES = 5
NOMINAL_BASELINE_MPIX_S = 1.0


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ref import driver as ref_driver
    from skybox_rt_tpu.ref import renderer

    trace = cgltrace.load_cached(cgltrace.trace_path(SCENE))

    # --- host-side setup (untimed, like the reference's binning) ---
    draws = []
    for dc in trace.drawcalls:
        binned = binning.bin_drawcall(
            dc.pos, dc.indices, dc.color, dc.texcoord,
            SIZE, SIZE, dc.near, dc.far, tile_logsize=5,
        )
        if binned is None:
            continue
        flags = state_mod.make_shader_flags(
            dc.states.depth_test, dc.states.color_enabled,
            dc.states.texture_enabled, dc.states.texture_envmode,
        )
        om_state = state_mod.make_om_state(dc.states)
        if dc.states.texture_enabled:
            tex_state, texels = ref_driver.make_texture_binding(
                trace, dc, dc.states)
        else:
            tex_state, texels = None, jnp.zeros((1,), jnp.uint32)
        rs = state_mod.RenderState(flags=flags, om=om_state, tex=tex_state,
                                   scissor=(0, 0, SIZE, SIZE))
        draws.append((rs, texels, binned))

    def render_frame():
        fbc = jnp.full((SIZE, SIZE), np.uint32(0xFF000000), jnp.uint32)
        fbd = jnp.full((SIZE, SIZE), np.uint32(0xFFFFFFFF), jnp.uint32)
        for rs, texels, binned in draws:
            fbc, fbd = renderer.render_drawcall(rs, texels, binned, fbc, fbd)
        return fbc

    # warmup (compile)
    fb = render_frame()
    jax.block_until_ready(fb)

    t0 = time.perf_counter()
    for _ in range(FRAMES):
        fb = render_frame()
    jax.block_until_ready(fb)
    elapsed = time.perf_counter() - t0

    pixels = SIZE * SIZE * len(draws) * FRAMES
    mpix_s = pixels / elapsed / 1e6
    print(json.dumps({
        "metric": f"draw3d_{SCENE}_{SIZE}x{SIZE}_fwd",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / NOMINAL_BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
