"""Forward-path characterization (round 3): where does the time go?

One exclusive window measuring, steady-state:
  A. 256x256 tekkaman FULL FRAME (bench.py protocol): deferred-xla vs
     pallas mode, both as 20 dispatched frames (current bench protocol)
     and as ONE compiled 20-frame loop (device-only time).
  B. 1024x1024 single textured drawcall (PERF.md table protocol):
     xla vs pallas end-to-end.
  C. 1024x1024 pass-level breakdown: visibility-only (pallas fused),
     shade-only (pass 2 given precomputed win/grads), sample-only
     (texture gather+filter given u/v), to locate the bottleneck.

Run exclusively, detached:
  setsid nohup timeout 3000 python scripts/fwd_profile_bench.py \
      > /tmp/fwd_profile.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, n=30, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    import jax
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt, compile_s, out


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.core import constants as C
    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ops import deferred as deferred_mod
    from skybox_rt_tpu.ops import pallas_raster
    from skybox_rt_tpu.ref import driver, renderer
    from skybox_rt_tpu.texture import sampler as sampler_mod

    print("platform:", jax.devices()[0].platform, flush=True)
    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))

    # ---------------- A: 256x256 full frame ----------------
    SIZE, FRAMES = 256, 20
    for mode in ("deferred", "pallas"):
        t0 = time.perf_counter()
        frame, arrays = driver.compile_frame(trace, SIZE, SIZE, mode=mode)
        fb = frame(arrays)
        jax.block_until_ready(fb)
        compile_s = time.perf_counter() - t0
        # current bench protocol: FRAMES dispatches
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            fb = frame(arrays)
        jax.block_until_ready(fb)
        disp = (time.perf_counter() - t0) / FRAMES
        mpix = SIZE * SIZE * len(arrays) / disp / 1e6
        print(f"A frame256 {mode}: dispatched {disp*1e3:.3f} ms/frame "
              f"({mpix:.0f} Mpix/s, {len(arrays)} draws, "
              f"compile {compile_s:.0f}s)", flush=True)

        # compiled loop: scan FRAMES times inside one jit.  The frame fn
        # is loop-invariant, so thread the previous fb through an
        # optimization_barrier into the inputs to defeat hoisting/CSE.
        # BOTH barrier outputs must stay live (the tok side feeds an
        # accumulator returned from the jit), otherwise XLA drops the dead
        # tuple element and hoists the whole frame out of the loop
        # (observed: 0.003 ms/frame == a copy loop).
        leaves, treedef = jax.tree.flatten(arrays)

        @jax.jit
        def loop(arrays):
            leaves, _ = jax.tree.flatten(arrays)

            def body(carry, _):
                fb, acc = carry
                tok = fb[0, 0]
                new_leaves = []
                for a in leaves:
                    a_b, tok_b = jax.lax.optimization_barrier((a, tok))
                    new_leaves.append(a_b)
                    acc = acc + tok_b
                fb2 = frame(jax.tree.unflatten(treedef, new_leaves))
                return (fb2, acc), None

            (fb, acc), _ = jax.lax.scan(
                body, (jnp.zeros((SIZE, SIZE), jnp.uint32),
                       jnp.uint32(0)), None, length=FRAMES)
            return fb, acc
        try:
            dt, compile_s, _ = timed(loop, arrays, n=5)
            per_frame = dt / FRAMES
            mpix = SIZE * SIZE * len(arrays) / per_frame / 1e6
            print(f"A frame256 {mode}: compiled-loop {per_frame*1e3:.3f} "
                  f"ms/frame ({mpix:.0f} Mpix/s, compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"A frame256 {mode}: compiled-loop failed: {e}",
                  flush=True)

    # ---------------- B/C: 1024x1024 single draw ----------------
    W = H = 1024
    dc = trace.drawcalls[0]
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
    T, M = binned.tile_pids.shape
    print(f"B draw0@1024: {T} tiles x {M} prim slots, "
          f"{binned.num_prims} prims, texels {texels.shape}", flush=True)

    ref = None
    for vis in ("xla", "pallas"):
        def run(vis=vis):
            return deferred_mod.render_drawcall(rs, texels, binned,
                                                fbc, fbd, visibility=vis)
        dt, compile_s, (c, d) = timed(run, n=30)
        print(f"B e2e {vis}: {dt*1e3:.3f} ms/draw  {W*H/dt/1e6:.0f} Mpix/s"
              f"  (compile {compile_s:.0f}s)", flush=True)
        if ref is None:
            ref = np.asarray(c)
        else:
            same = (np.asarray(c) == ref).all()
            print("B bit-exact pallas vs xla:", same, flush=True)

    # C: pass-level breakdown
    ts = 1 << binned.tile_logsize
    edges = jnp.asarray(binned.edges)
    attribs = jnp.asarray(binned.attribs)
    zattr = attribs[:, 0]
    tile_pids = jnp.asarray(binned.tile_pids)
    tile_xy = jnp.asarray(binned.tile_xy)
    Hp, Wp = fbd.shape
    gh, gw = Hp // ts, Wp // ts
    fbd_t = fbd.reshape(gh, ts, gw, ts).transpose(0, 2, 1, 3)
    sel_d = fbd_t[tile_xy[:, 1], tile_xy[:, 0]]

    import functools

    @jax.jit
    def vis_only(sel_d):
        return pallas_raster.visibility_tiles(
            rs, edges, zattr, tile_pids, tile_xy, sel_d,
            binned.tile_logsize, fused=True)

    dt, compile_s, out = timed(vis_only, sel_d, n=30)
    dsw, win, dxw, dyw = out
    print(f"C pass1 pallas-fused: {dt*1e3:.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)

    origins = tile_xy * ts
    ys = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 1)
          + origins[:, 1][:, None, None])
    xs = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 2)
          + origins[:, 0][:, None, None])

    @jax.jit
    def shade_only(win, dxw, dyw):
        return deferred_mod._shade_pixels(rs, texels, edges, attribs,
                                          win, xs, ys, grads=(dxw, dyw))

    dt, compile_s, color = timed(shade_only, win, dxw, dyw, n=30)
    print(f"C pass2 shade(+grads): {dt*1e3:.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)

    @jax.jit
    def shade_nograds(win):
        return deferred_mod._shade_pixels(rs, texels, edges, attribs,
                                          win, xs, ys, grads=None)

    dt, compile_s, _ = timed(shade_nograds, win, n=30)
    print(f"C pass2 shade(no grads): {dt*1e3:.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)

    # sample-only: u/v from the shaded winners (uniform random plausible)
    key = jax.random.PRNGKey(0)
    u = jax.random.randint(key, win.shape, 0, 1 << 23, dtype=jnp.int32)
    v = jax.random.randint(key, win.shape, 0, 1 << 23, dtype=jnp.int32)

    @jax.jit
    def sample_only(u, v):
        return sampler_mod.sample(rs.tex, texels, u, v, lod=0)

    dt, compile_s, _ = timed(sample_only, u, v, n=30)
    print(f"C sample-only (bilinear, {win.size} px): {dt*1e3:.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
