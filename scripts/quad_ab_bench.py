"""INTERLEAVED quad-vs-flat sampling A/B (round 3) — window-drift-proof.

fwd_r3_bench produced contradictory numbers (quad 6.5x faster in the
sample microbench, 50x slower in the 1024^2 e2e, invisible at the frame
level) consistent with the tunnel window drifting BETWEEN measurements.
This script compiles everything up front, then interleaves timed runs
flat/quad/flat/quad... x3 so any drift hits both arms equally.

Also a compiled-loop trip-count slope check (FRAMES=4 vs 20 vs 100) to
decide whether the 0.003 ms/frame loop numbers are a collapsed loop or
genuine device time.

Run exclusively, detached.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.core import constants as C
    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ops import deferred as deferred_mod
    from skybox_rt_tpu.ref import driver, renderer
    from skybox_rt_tpu.texture import sampler as sampler_mod

    print("platform:", jax.devices()[0].platform, flush=True)
    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))

    # ---------- build both bindings for draw 0 @1024^2 ----------
    W = H = 1024
    dc = trace.drawcalls[0]
    binned = binning.bin_drawcall(dc.pos, dc.indices, dc.color, dc.texcoord,
                                  W, H, dc.near, dc.far,
                                  C.RASTER_TILE_LOGSIZE)
    flags = state_mod.make_shader_flags(
        dc.states.depth_test, dc.states.color_enabled,
        dc.states.texture_enabled, dc.states.texture_envmode)
    om_state = state_mod.make_om_state(dc.states)
    ts_quad, tex_quad = driver.make_texture_binding(trace, dc, dc.states)
    assert ts_quad.quad
    os.environ["SKYBOX_QUAD"] = "0"
    ts_flat, tex_flat = driver.make_texture_binding(trace, dc, dc.states)
    os.environ["SKYBOX_QUAD"] = "1"
    assert not ts_flat.quad
    fbc = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_COLOR, np.uint32),
        C.RASTER_TILE_LOGSIZE))
    fbd = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_DEPTH, np.uint32),
        C.RASTER_TILE_LOGSIZE))

    runners = {}
    for name, tex_state, texels in [("flat", ts_flat, tex_flat),
                                    ("quad", ts_quad, tex_quad)]:
        rs = state_mod.RenderState(flags=flags, om=om_state, tex=tex_state,
                                   scissor=(0, 0, W, H))

        def run(rs=rs, texels=texels):
            return deferred_mod.render_drawcall(rs, texels, binned,
                                                fbc, fbd, visibility="xla")
        out = run()                       # compile
        jax.block_until_ready(out)
        runners[f"e2e1024 {name}"] = run

    # sample-only with COHERENT (screen-interpolated) uv, both layouts
    px = jnp.arange(1 << 20, dtype=jnp.int32)
    u_coh = (px % 1024) * (1 << 13)           # smooth ramp across x
    v_coh = (px // 1024) * (1 << 13)
    key = jax.random.PRNGKey(0)
    u_rnd = jax.random.randint(key, (1 << 20,), 0, 1 << 23, dtype=jnp.int32)
    v_rnd = jax.random.randint(jax.random.PRNGKey(1), (1 << 20,), 0,
                               1 << 23, dtype=jnp.int32)
    for name, tex_state, texels in [("flat", ts_flat, tex_flat),
                                    ("quad", ts_quad, tex_quad)]:
        for iname, (uu, vv) in [("coh", (u_coh, v_coh)),
                                ("rnd", (u_rnd, v_rnd))]:
            f = jax.jit(lambda u, v, tex_state=tex_state, texels=texels:
                        sampler_mod.sample(tex_state, texels, u, v, lod=0))
            jax.block_until_ready(f(uu, vv))
            runners[f"sample {name} {iname}"] = (
                lambda f=f, uu=uu, vv=vv: f(uu, vv))

    # ---------- interleaved timing ----------
    for rep in range(3):
        for name, run in runners.items():
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                out = run()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n
            print(f"rep{rep} {name}: {dt*1e3:.3f} ms", flush=True)

    # ---------- compiled-loop slope check (deferred mode frame) ----------
    SIZE = 256
    frame, arrays = driver.compile_frame(trace, SIZE, SIZE, mode="deferred")
    jax.block_until_ready(frame(arrays))
    leaves, treedef = jax.tree.flatten(arrays)
    for FR in (4, 20, 100):
        @jax.jit
        def loop(arrays, FR=FR):
            lv, _ = jax.tree.flatten(arrays)

            def body(carry, _):
                fb, acc = carry
                tok = fb[0, 0]
                new = []
                for a in lv:
                    a_b, tok_b = jax.lax.optimization_barrier((a, tok))
                    new.append(a_b)
                    acc = acc + tok_b
                return (frame(jax.tree.unflatten(treedef, new)), acc), None

            (fb, acc), _ = jax.lax.scan(
                body, (jnp.zeros((SIZE, SIZE), jnp.uint32),
                       jnp.uint32(0)), None, length=FR)
            return fb, acc

        jax.block_until_ready(loop(arrays))
        t0 = time.perf_counter()
        for _ in range(5):
            out = loop(arrays)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"loop FRAMES={FR}: {dt*1e3:.3f} ms/call "
              f"({dt/FR*1e6:.1f} us/frame)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
