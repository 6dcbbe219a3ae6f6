"""On-chip benchmark of the fused-gradient Pallas shading path
(VERDICT #5): a single textured tekkaman drawcall rendered at 1024x1024
end-to-end (visibility + shade + OM), XLA deferred vs fused Pallas.
Run exclusively, detached (see rt_chip_bench.py header).

Protocol matches PERF.md's 'single textured drawcall at 1024x1024'
table; per-mode a jitted render of the same binned drawcall, steady
state over n repeats after warmup.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W = H = 1024
DRAW = 0          # tekkaman's first (textured, depth-tested) drawcall


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.core import constants as C
    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ops import deferred as deferred_mod
    from skybox_rt_tpu.ref import driver, renderer

    print("platform:", jax.devices()[0].platform, flush=True)
    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))
    dc = trace.drawcalls[DRAW]
    binned = binning.bin_drawcall(dc.pos, dc.indices, dc.color, dc.texcoord,
                                  W, H, dc.near, dc.far,
                                  C.RASTER_TILE_LOGSIZE)
    flags = state_mod.make_shader_flags(
        dc.states.depth_test, dc.states.color_enabled,
        dc.states.texture_enabled, dc.states.texture_envmode)
    om_state = state_mod.make_om_state(dc.states)
    tex_state, texels = driver.make_texture_binding(trace, dc, dc.states)
    rs = state_mod.RenderState(flags=flags, om=om_state, tex=tex_state,
                               scissor=(0, 0, W, H))
    fbc = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_COLOR, np.uint32),
        C.RASTER_TILE_LOGSIZE))
    fbd = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_DEPTH, np.uint32),
        C.RASTER_TILE_LOGSIZE))
    print(f"draw {DRAW}: {binned.tile_pids.shape[0]} tiles x "
          f"{binned.tile_pids.shape[1]} prim slots", flush=True)

    ref = None
    for vis in ("xla", "pallas"):
        def run(vis=vis):
            return deferred_mod.render_drawcall(rs, texels, binned,
                                                fbc, fbd, visibility=vis)
        t0 = time.perf_counter()
        c, d = run()
        jax.block_until_ready((c, d))
        compile_s = time.perf_counter() - t0
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            c, d = run()
        jax.block_until_ready((c, d))
        dt = (time.perf_counter() - t0) / n
        print(f"{vis}: {dt*1e3:.3f} ms/draw  {W*H/dt/1e6:.0f} Mpix/s  "
              f"(compile {compile_s:.0f}s)", flush=True)
        if ref is None:
            ref = np.asarray(c)
        else:
            same = (np.asarray(c) == ref).all()
            print("bit-exact vs xla:", same, flush=True)
            assert same


if __name__ == "__main__":
    main()
