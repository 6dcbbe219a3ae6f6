"""Honest (device-wall loop) pass-level breakdown of the 1024^2 textured
draw — where do the 26 ms (quad) / 52 ms (flat) actually go?

Every number: compiled N-iteration loop with a sentinel-count data
dependence, two loop lengths, difference quotient, D2H barrier
(PERF.md r5 block_until_ready mirage).  Run exclusively, detached:

  PYTHONPATH=/root/repo:/root/.axon_site setsid nohup timeout 5400 \
    python scripts/draw_breakdown_r5.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W = H = 1024
NA, NB = 4, 16


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.core import constants as C
    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ops import deferred as deferred_mod
    from skybox_rt_tpu.ops import pallas_raster
    from skybox_rt_tpu.ref import driver, renderer

    print("platform:", jax.devices()[0].platform, "SKYBOX_QUAD:",
          os.environ.get("SKYBOX_QUAD", "1"), flush=True)
    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))
    dc = trace.drawcalls[0]
    binned = binning.bin_drawcall(dc.pos, dc.indices, dc.color, dc.texcoord,
                                  W, H, dc.near, dc.far,
                                  C.RASTER_TILE_LOGSIZE)
    flags = state_mod.make_shader_flags(
        dc.states.depth_test, dc.states.color_enabled,
        dc.states.texture_enabled, dc.states.texture_envmode)
    rs0 = state_mod.RenderState(
        flags=flags, om=state_mod.make_om_state(dc.states),
        tex=None, scissor=(0, 0, W, H))
    tex_state, texels = driver.make_texture_binding(trace, dc, dc.states)
    rs = state_mod.RenderState(flags=flags, om=rs0.om, tex=tex_state,
                               scissor=(0, 0, W, H))
    fbc = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_COLOR, np.uint32),
        C.RASTER_TILE_LOGSIZE))
    fbd = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_DEPTH, np.uint32),
        C.RASTER_TILE_LOGSIZE))

    e = jnp.asarray(binned.edges)
    a = jnp.asarray(binned.attribs)
    tp = jnp.asarray(binned.tile_pids)
    txy = jnp.asarray(binned.tile_xy)
    tls = binned.tile_logsize
    ts = 1 << tls
    SEN = jnp.uint32(0xDEADBEEF)

    def _sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf[(0,) * leaf.ndim])

    def dq(make_loop, *args):
        la, lb = make_loop(NA), make_loop(NB)
        _sync(la(*args))
        _sync(lb(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(la(*args))
            t1 = time.perf_counter()
            _sync(lb(*args))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (NB - NA))
        return best

    # gather fb tiles once (the per-draw gather/scatter is outside the
    # loops; render_tiles_deferred works on gathered tiles)
    gh = fbd.shape[0] // ts
    gw = fbd.shape[1] // ts
    tiles_d = fbd.reshape(gh, ts, gw, ts).transpose(0, 2, 1, 3) \
                 .reshape(gh * gw, ts, ts)
    tiles_c = fbc.reshape(gh, ts, gw, ts).transpose(0, 2, 1, 3) \
                 .reshape(gh * gw, ts, ts)
    T = np.asarray(txy).shape[0]
    sel = np.asarray(txy)[:, 1] * gw + np.asarray(txy)[:, 0]
    sel_d = tiles_d[jnp.asarray(sel)]
    sel_c = tiles_c[jnp.asarray(sel)]

    # ---- full draw (reference) ----
    def make_full(n):
        @jax.jit
        def loop(fbc, fbd):
            def body(_, carry):
                fbc, fbd = carry
                z = jnp.sum((fbc == SEN).astype(jnp.uint32))
                e2 = e + z.astype(e.dtype)
                a2 = a + z.astype(a.dtype)
                fbc, fbd, _ = deferred_mod._render_deferred_jit.__wrapped__(
                    rs, texels, e2, a2, a2[:, 0], tp, txy, fbc, fbd, tls,
                    visibility="pallas", blend_slots=0)
                return fbc, fbd
            return jax.lax.fori_loop(0, n, body, (fbc, fbd))
        return loop

    dt = dq(make_full, fbc, fbd)
    print(f"full draw (pallas vis): {dt*1e3:.2f} ms  "
          f"{W*H/dt/1e6:.1f} Mpix/s", flush=True)

    # ---- pass 1 only (both engines) ----
    for engine in ("pallas", "xla"):
        def make_vis(n, engine=engine):
            @jax.jit
            def loop(seed):
                def body(_, dsw):
                    z = jnp.sum((dsw == SEN).astype(jnp.uint32))
                    e2 = e + z.astype(e.dtype)
                    a2 = a + z.astype(a.dtype)
                    if engine == "pallas":
                        out = pallas_raster.visibility_tiles(
                            rs, e2, a2[:, 0], tp, txy, dsw, tls,
                            fused=True)
                        return out[0]
                    dsw2, win = deferred_mod._visibility_tiles(
                        rs, e2, a2[:, 0], tp, txy, dsw, tls)
                    return dsw2
                return jax.lax.fori_loop(0, n, body, seed)
            return loop
        dt = dq(make_vis, sel_d)
        print(f"pass1 visibility ({engine}): {dt*1e3:.2f} ms", flush=True)

    # ---- pass 2 only (shade, quad per env) ----
    dsw, win, dxw, dyw = pallas_raster.visibility_tiles(
        rs, e, a[:, 0], tp, txy, sel_d, tls, fused=True)
    origins = txy * ts
    ys = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 1)
          + origins[:, 1][:, None, None])
    xs = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 2)
          + origins[:, 0][:, None, None])

    def make_shade(n):
        @jax.jit
        def loop(seed):
            def body(_, col):
                z = jnp.sum((col == SEN).astype(jnp.uint32))
                win2 = win + z.astype(win.dtype)
                a2 = a + z.astype(a.dtype)
                return deferred_mod._shade_pixels(
                    rs, texels, e, a2, win2, xs, ys)
            return jax.lax.fori_loop(0, n, body, seed)
        return loop

    seed = jnp.zeros((T, ts, ts), jnp.uint32)
    dt = dq(make_shade, seed)
    print(f"pass2 shade (grads off): {dt*1e3:.2f} ms", flush=True)

    def make_shade_g(n):
        @jax.jit
        def loop(seed):
            def body(_, col):
                z = jnp.sum((col == SEN).astype(jnp.uint32))
                win2 = win + z.astype(win.dtype)
                a2 = a + z.astype(a.dtype)
                return deferred_mod._shade_pixels(
                    rs, texels, e, a2, win2, xs, ys, grads=(dxw, dyw))
            return jax.lax.fori_loop(0, n, body, seed)
        return loop

    dt = dq(make_shade_g, seed)
    print(f"pass2 shade (fused grads): {dt*1e3:.2f} ms", flush=True)

    # untextured shade: isolates the texture sampler's share
    rs_nt = state_mod.RenderState(
        flags=state_mod.make_shader_flags(
            dc.states.depth_test, dc.states.color_enabled, False, 0),
        om=rs.om, tex=None, scissor=(0, 0, W, H))
    tex_dummy = jnp.zeros((1,), jnp.uint32)

    def make_shade_nt(n):
        @jax.jit
        def loop(seed):
            def body(_, col):
                z = jnp.sum((col == SEN).astype(jnp.uint32))
                win2 = win + z.astype(win.dtype)
                a2 = a + z.astype(a.dtype)
                return deferred_mod._shade_pixels(
                    rs_nt, tex_dummy, e, a2, win2, xs, ys,
                    grads=(dxw, dyw))
            return jax.lax.fori_loop(0, n, body, seed)
        return loop

    dt = dq(make_shade_nt, seed)
    print(f"pass2 shade (no texture, fused grads): {dt*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
