"""Shade-pass sub-stage profile (round 3): where do shade fwd's ~5 ms go?

Stages at the diff_chip_bench scene (512^2, 5120 prims, 172 tiles,
M=104), each a compiled 20-iter loop with barrier-held inputs:
  a. p-gather        take_along_axis(tile_pids, steps) -> pids
  b. rec-gather      rec[(P,27)][p] per pixel
  c. texel-sample    quad bilinear given fixed uv
  d. arith-only      full shade math with gathers replaced by fixed data
  e. full shade fwd  (= breakdown stage 2)

Run exclusively, detached:
  setsid nohup timeout 3000 python scripts/shade_profile_bench.py \
      > /tmp/shade_profile.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes

SIZE = 512
ITERS = 20
TILE_LOG = 5


def build(subdiv=4):
    verts, faces = scenes.icosphere(subdiv=subdiv, radius=0.85)
    V = verts.shape[0]
    pos = np.concatenate([verts.astype(np.float32),
                          np.ones((V, 1), np.float32)], axis=1)
    pos[:, 2] = pos[:, 2] * 0.4 + 0.5
    rng = np.random.default_rng(0)
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(rng.uniform(0.2, 1.0, (V, 4)).astype(np.float32)),
        "uv": jnp.asarray(rng.uniform(0.0, 1.0, (V, 2)).astype(np.float32)),
        "tex": jnp.asarray(scenes.checkerboard_texture(64, 8)),
    }
    cfg = pipeline.DiffRenderConfig(width=SIZE, height=SIZE,
                                    tile_logsize=TILE_LOG, depth_test=True,
                                    textured=True, modulate=True)
    static = dbin.bin_static(pos, faces.astype(np.int32), SIZE, SIZE,
                             tile_logsize=TILE_LOG)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    return params, static, cfg


def timed_loop(name, fn, *args, iters=ITERS):
    @jax.jit
    def loop(args):
        def body(carry, _):
            tok, acc = carry
            args_b = []
            for a in jax.tree.leaves(args):
                a_b, tok_b = jax.lax.optimization_barrier((a, tok))
                args_b.append(a_b)
                acc = acc + tok_b
            out = fn(*jax.tree.unflatten(jax.tree.structure(args), args_b))
            tok2 = jnp.float32(0)
            for l in jax.tree.leaves(out):
                tok2 = tok2 + jnp.asarray(l).ravel()[0].astype(jnp.float32)
            return (tok2, acc), None
        (tok, acc), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                                     None, length=iters)
        return tok, acc

    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(args))
    wall = (time.perf_counter() - t0) / iters
    print(f"{name}: {wall*1e3:.2f} ms/iter (compile {compile_s:.0f}s)",
          flush=True)
    return wall


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    params, static, cfg = build()
    ts = 1 << TILE_LOG
    tile_pids = static["tile_pids"]
    origins = static["tile_xy"] * ts
    T, M = tile_pids.shape
    print(f"tiles={T} M={M}", flush=True)

    setup0 = pipeline.prim_setup(params, static["indices"], cfg)
    slots0, _ = jax.jit(lambda s: pipeline.visibility_slots(
        s, tile_pids, origins, cfg, 8, engine="pallas"))(setup0)
    slots0 = jax.block_until_ready(slots0)
    s0 = slots0[..., 0]                                   # (T, ts, ts)
    p0 = jax.jit(lambda s: jnp.take_along_axis(
        tile_pids, jnp.maximum(s, 0).reshape(T, -1), axis=1
    ).reshape(s.shape))(s0)
    p0 = jax.block_until_ready(p0)
    P = setup0["edges"].shape[0]
    rec0 = jax.block_until_ready(jax.jit(lambda s: jnp.concatenate(
        [s["edges"].reshape(P, 9), s["color"].reshape(P, 12),
         s["uv"].reshape(P, 6)], axis=1))(setup0))
    tq0 = jax.block_until_ready(
        jax.jit(pipeline._quad_texture)(params["tex"]))
    rng = np.random.default_rng(1)
    uv0 = jnp.asarray(rng.uniform(0, 1, (T, ts, ts, 2)).astype(np.float32))
    r_fix = jnp.asarray(rng.uniform(0, 1, (27,)).astype(np.float32))

    # a. p-gather
    def p_gather(s):
        return jnp.take_along_axis(
            tile_pids, jnp.maximum(s, 0).reshape(T, -1), axis=1
        ).reshape(s.shape).sum()
    timed_loop("a p-gather     ", p_gather, s0)

    # b. rec-gather
    def rec_gather(p, rec):
        return rec[p].sum()
    timed_loop("b rec-gather   ", rec_gather, p0, rec0)

    # c. texel-sample: quad vs flat, random vs COHERENT uv (the real
    # winner-interpolated stream — fwd_r3_bench found coherent flat
    # gathers ~100x faster than random in the exact-int path)
    def uv_coherent():
        setup = setup0
        rec = jnp.concatenate([setup["edges"].reshape(P, 9),
                               setup["color"].reshape(P, 12),
                               setup["uv"].reshape(P, 6)], axis=1)
        rec_tile = rec[jnp.maximum(tile_pids, 0)]
        r = jnp.take_along_axis(
            rec_tile, jnp.maximum(s0, 0).reshape(T, -1)[..., None], axis=1
        ).reshape(T, ts, ts, 27)
        ys = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 1)
              + origins[:, 1][:, None, None]).astype(jnp.float32)
        xs = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 2)
              + origins[:, 0][:, None, None]).astype(jnp.float32)
        e = r[..., :9].reshape(T, ts, ts, 3, 3)
        e0 = e[..., 0, 0] * xs + e[..., 0, 1] * ys + e[..., 0, 2]
        e1 = e[..., 1, 0] * xs + e[..., 1, 1] * ys + e[..., 1, 2]
        e2 = e[..., 2, 0] * xs + e[..., 2, 1] * ys + e[..., 2, 2]
        b0, b1, b2 = pipeline._barycentrics(e0, e1, e2)
        t = r[..., 21:27].reshape(T, ts, ts, 3, 2)
        return (t[..., 0, :] * b0[..., None] + t[..., 1, :] * b1[..., None]
                + t[..., 2, :] * b2[..., None])
    uvc = jax.block_until_ready(jax.jit(uv_coherent)())
    tex0 = params["tex"]

    def tex_sample_quad(tq, uv):
        return pipeline.sample_texture_bilinear_quad(
            tq, uv[..., 0], uv[..., 1]).sum()

    def tex_sample_flat(tex, uv):
        return pipeline.sample_texture_bilinear(
            tex, uv[..., 0], uv[..., 1]).sum()

    timed_loop("c quad random  ", tex_sample_quad, tq0, uv0)
    timed_loop("c quad coherent", tex_sample_quad, tq0, uvc)
    timed_loop("c flat random  ", tex_sample_flat, tex0, uv0)
    timed_loop("c flat coherent", tex_sample_flat, tex0, uvc)

    # c5: the same quad lerp but with SIXTEEN 1-D scalar gathers — the
    # exact-int path's 4 B scalar gathers hit a fast path the 64 B row
    # gather misses; does that hold for f32 scalars?
    th, tw = tex0.shape[0], tex0.shape[1]
    tq_cols = tuple(jnp.asarray(np.asarray(tq0).reshape(th * tw, 16)[:, j])
                    for j in range(16))

    def tex_sample_scalar(cols, uv):
        u, v = uv[..., 0], uv[..., 1]
        uu = (u % 1.0) * tw - 0.5
        vv = (v % 1.0) * th - 0.5
        x0 = jnp.floor(uu)
        y0 = jnp.floor(vv)
        fx = (uu - x0)[..., None]
        fy = (vv - y0)[..., None]
        idx = (jnp.mod(y0.astype(jnp.int32), th) * tw
               + jnp.mod(x0.astype(jnp.int32), tw))
        taps = [jnp.stack([cols[k * 4 + c][idx] for c in range(4)], -1)
                for k in range(4)]
        cx0 = taps[0] + fx * (taps[1] - taps[0])
        cx1 = taps[2] + fx * (taps[3] - taps[2])
        return (cx0 + fy * (cx1 - cx0)).sum()

    timed_loop("c 16xscalar rnd", tex_sample_scalar, tq_cols, uv0)
    timed_loop("c 16xscalar coh", tex_sample_scalar, tq_cols, uvc)

    # d. arith-only: shade math with r fixed (broadcast), real xs/ys
    def arith_only(s):
        ys = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 1)
              + origins[:, 1][:, None, None]).astype(jnp.float32)
        xs = (jax.lax.broadcasted_iota(jnp.int32, (1, ts, ts), 2)
              + origins[:, 0][:, None, None]).astype(jnp.float32)
        live = s >= 0
        r = jnp.broadcast_to(r_fix, (T, ts, ts, 27))
        e = r[..., :9].reshape(T, ts, ts, 3, 3)
        e0 = e[..., 0, 0] * xs + e[..., 0, 1] * ys + e[..., 0, 2]
        e1 = e[..., 1, 0] * xs + e[..., 1, 1] * ys + e[..., 1, 2]
        e2 = e[..., 2, 0] * xs + e[..., 2, 1] * ys + e[..., 2, 2]
        b0, b1, b2 = pipeline._barycentrics(e0, e1, e2)
        c = r[..., 9:21].reshape(T, ts, ts, 3, 4)
        col = (c[..., 0, :] * b0[..., None] + c[..., 1, :] * b1[..., None]
               + c[..., 2, :] * b2[..., None])
        t = r[..., 21:27].reshape(T, ts, ts, 3, 2)
        uvp = (t[..., 0, :] * b0[..., None] + t[..., 1, :] * b1[..., None]
               + t[..., 2, :] * b2[..., None])
        cov = live.astype(jnp.float32)
        return (col * cov[..., None]).sum() + uvp.sum()
    timed_loop("d arith-only   ", arith_only, s0)

    # e. full shade fwd
    def shade_fwd(params):
        setup = pipeline.prim_setup(params, static["indices"], cfg)
        tiles = pipeline.shade_slots(setup, tile_pids, slots0, origins, cfg)
        return tiles.sum()
    timed_loop("e full shade   ", shade_fwd, params)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
