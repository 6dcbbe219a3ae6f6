"""Round-3 forward-path chip bench: quad-table sampling A/B, pallas-mode
frame, and the slotted (blend) Pallas kernel on real TPU.

One exclusive window:
  A. 256^2 tekkaman frame: deferred vs pallas — dispatched AND a compiled
     20-frame loop (optimization-barrier-hardened; see fwd_profile_bench).
  B. 1024^2 single textured draw: xla-flat vs xla-quad vs pallas-quad
     (same window => the quad-table gather win is attributable).
  C. sample-only at 1M px: flat vs quad.
  D. blended scenes (vase, carnival) full frame @128: deferred vs pallas
     (exercises the K-slot Mosaic kernel) — bit-exact + timing.

Run exclusively, detached:
  setsid nohup timeout 3000 python scripts/fwd_r3_bench.py \
      > /tmp/fwd_r3.log 2>&1 &
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, n=30):
    import jax
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, compile_s, out


def main():
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

    # ---------------- A: 256^2 full frame ----------------
    SIZE, FRAMES = 256, 20
    for mode in ("deferred", "pallas"):
        t0 = time.perf_counter()
        frame, arrays = driver.compile_frame(trace, SIZE, SIZE, mode=mode)
        fb = frame(arrays)
        jax.block_until_ready(fb)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            fb = frame(arrays)
        jax.block_until_ready(fb)
        disp = (time.perf_counter() - t0) / FRAMES
        mpix = SIZE * SIZE * len(arrays) / disp / 1e6
        print(f"A frame256 {mode}: dispatched {disp*1e3:.3f} ms/frame "
              f"({mpix:.0f} Mpix/s, compile {compile_s:.0f}s)", flush=True)

        leaves, treedef = jax.tree.flatten(arrays)

        @jax.jit
        def loop(arrays):
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
                       jnp.uint32(0)), None, length=FRAMES)
            return fb, acc

        dt, compile_s, _ = timed(loop, arrays, n=5)
        per_frame = dt / FRAMES
        mpix = SIZE * SIZE * len(arrays) / per_frame / 1e6
        print(f"A frame256 {mode}: compiled-loop {per_frame*1e3:.3f} "
              f"ms/frame ({mpix:.0f} Mpix/s, compile {compile_s:.0f}s)",
              flush=True)

    # ---------------- B: 1024^2 single draw ----------------
    W = H = 1024
    dc = trace.drawcalls[0]
    binned = binning.bin_drawcall(dc.pos, dc.indices, dc.color, dc.texcoord,
                                  W, H, dc.near, dc.far,
                                  C.RASTER_TILE_LOGSIZE)
    flags = state_mod.make_shader_flags(
        dc.states.depth_test, dc.states.color_enabled,
        dc.states.texture_enabled, dc.states.texture_envmode)
    om_state = state_mod.make_om_state(dc.states)
    os.environ["SKYBOX_QUAD"] = "1"       # quad arm is opt-in since r3
    ts_quad, tex_quad = driver.make_texture_binding(trace, dc, dc.states)
    del os.environ["SKYBOX_QUAD"]
    assert ts_quad.quad, "expected the quad-table binding"
    # flat variant for the A/B
    texture = trace.textures[dc.texture_id]
    from skybox_rt_tpu.texture.mipmap import generate_mipmaps
    vx_format = C.CGL_TO_VX_FORMAT[texture.format]
    chain, offs = generate_mipmaps(texture.pixels, vx_format,
                                   texture.width, texture.height)
    ts_flat = dataclasses.replace(ts_quad, quad=False)
    tex_flat = jnp.asarray(sampler_mod.make_texel_array(vx_format, chain))

    fbc = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_COLOR, np.uint32),
        C.RASTER_TILE_LOGSIZE))
    fbd = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_DEPTH, np.uint32),
        C.RASTER_TILE_LOGSIZE))

    ref = None
    for name, tex_state, texels, vis in [
            ("xla flat", ts_flat, tex_flat, "xla"),
            ("xla quad", ts_quad, tex_quad, "xla"),
            ("pallas quad", ts_quad, tex_quad, "pallas")]:
        rs = state_mod.RenderState(flags=flags, om=om_state, tex=tex_state,
                                   scissor=(0, 0, W, H))

        def run(rs=rs, texels=texels, vis=vis):
            return deferred_mod.render_drawcall(rs, texels, binned,
                                                fbc, fbd, visibility=vis)
        dt, compile_s, (c, d) = timed(run, n=30)
        print(f"B e2e {name}: {dt*1e3:.3f} ms/draw  {W*H/dt/1e6:.0f} Mpix/s"
              f"  (compile {compile_s:.0f}s)", flush=True)
        if ref is None:
            ref = np.asarray(c)
        else:
            same = (np.asarray(c) == ref).all()
            print(f"B bit-exact {name} vs flat:", same, flush=True)
            assert same

    # ---------------- C: sample-only ----------------
    key = jax.random.PRNGKey(0)
    u = jax.random.randint(key, (1 << 20,), 0, 1 << 23, dtype=jnp.int32)
    v = jax.random.randint(jax.random.PRNGKey(1), (1 << 20,), 0, 1 << 23,
                           dtype=jnp.int32)

    for name, tex_state, texels in [("flat", ts_flat, tex_flat),
                                    ("quad", ts_quad, tex_quad)]:
        @jax.jit
        def sample_only(u, v, tex_state=tex_state, texels=texels):
            return sampler_mod.sample(tex_state, texels, u, v, lod=0)
        dt, compile_s, out = timed(sample_only, u, v, n=30)
        print(f"C sample-only {name}: {dt*1e3:.3f} ms /1Mpx "
              f"(compile {compile_s:.0f}s)", flush=True)
        if name == "flat":
            sref = np.asarray(out)
        else:
            assert (np.asarray(out) == sref).all(), "quad sample mismatch"

    # ---------------- D: blended scenes through the K-slot kernel -------
    for scene in ("vase", "carnival"):
        tr = cgltrace.load_cached(cgltrace.trace_path(scene))
        ref_fb = None
        for mode in ("deferred", "pallas"):
            t0 = time.perf_counter()
            frame, arrays = driver.compile_frame(tr, 128, 128, mode=mode)
            fb = frame(arrays)
            jax.block_until_ready(fb)
            compile_s = time.perf_counter() - t0
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                fb = frame(arrays)
            jax.block_until_ready(fb)
            dt = (time.perf_counter() - t0) / n
            print(f"D {scene}128 {mode}: {dt*1e3:.3f} ms/frame "
                  f"({len(arrays)} draws, compile {compile_s:.0f}s)",
                  flush=True)
            if ref_fb is None:
                ref_fb = np.asarray(fb)
            else:
                same = (np.asarray(fb) == ref_fb).all()
                print(f"D {scene}128 bit-exact pallas vs deferred:", same,
                      flush=True)
                assert same

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
