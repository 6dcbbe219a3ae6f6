"""Round-5 chip probes, part 2 (honest D2H-barriered timings).

1. config-3 stage costs: one after-walk / winner walk / scan-step on the
   vase draws at 512^2, + fused-frame A/B over _SCAN_MAX_PRIMS.
2. northstar bounce launches + shade gather attribution.
3. 1.31M-tri kernel sweeps (eager calls — jit-wrapping the block arrays
   ships them as compile-request constants and trips HTTP 413).

  PYTHONPATH=/root/repo:/root/.axon_site setsid nohup timeout 7200 \
    python scripts/rt_probe2_r5.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timed(fn, *args, reps=3):
    _sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def config3_probes():
    import jax
    import jax.numpy as jnp
    from skybox_rt_tpu.geom import cgltrace
    from skybox_rt_tpu.rt import frame as frame_mod

    trace = cgltrace.load_cached(cgltrace.trace_path("vase"))

    # fused frame under scan-cutoff sweep
    for cutoff in (0, 2, 64):
        frame_mod._SCAN_MAX_PRIMS = cutoff
        frame_mod._FRAME_CACHE.clear()
        img = frame_mod.render_trace_rt_fused(trace, 512, 512)
        assert np.isfinite(img).all()
        fn, arrays, rays, metas = frame_mod.make_frame_fn(trace, 512, 512)
        dt = timed(fn, arrays, *rays, reps=3)
        modes = [(m["draw_index"], m["mode"], m["K"]) for m in metas]
        print(f"config3 cutoff={cutoff}: {dt*1e3:.1f} ms  {modes}",
              flush=True)
    frame_mod._SCAN_MAX_PRIMS = 64


def northstar_bounces():
    import jax
    import jax.numpy as jnp
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import tracer

    W = H = 1024
    verts, faces, colors = scenes.sphere_field(copies=9, subdiv=5)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35)
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    cfg = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True)
    sc = scene.finalize()
    closest, occluded = tracer.make_intersectors(sc, cfg)
    sa = tracer.scene_shade_arrays(sc, cfg)
    o, d = tracer.camera_rays(cam, W, H)

    jc = jax.jit(lambda o, d: closest(o, d))
    prim, t, u, v = jc(o, d)
    _, hit, pt, n = tracer.shade_hits(sa, cfg, occluded, o, d,
                                      prim, t, u, v)
    # bounce-1 rays (uncompacted layout for the probe)
    rd = d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
    ro = pt + n * 1e-3
    dt = timed(jc, ro, rd)
    print(f"bounce closest (uncompacted): {dt*1e3:.1f} ms", flush=True)
    p2, t2, u2, v2 = jc(ro, rd)
    jsh = jax.jit(lambda o, d, p, t, u, v: tracer.shade_hits(
        sa, cfg, occluded, o, d, p, t, u, v))
    dt = timed(jsh, ro, rd, p2, t2, u2, v2)
    print(f"bounce shade+shadow: {dt*1e3:.1f} ms", flush=True)

    # shade gather attribution: same shade math with the rec row gather
    # made degenerate-coherent (all rays read row 0)
    rec = sa["rec"]

    def shade_row0(o, d, p, t, u, v):
        p0 = jnp.zeros_like(p)          # degenerate COHERENT gather
        return tracer.shade_hits(sa, cfg, occluded, o, d, p0, t, u, v)

    dt = timed(jax.jit(shade_row0), ro, rd, p2, t2, u2, v2)
    print(f"bounce shade+shadow (row-0 coherent gather): {dt*1e3:.1f} ms",
          flush=True)

    # bf16 record A/B: halves the gathered bytes (gather bf16 rows, widen
    # AFTER the gather; shading math stays f32).  Probe only — parity
    # impact (~3 decimal digits of albedo/normal) assessed separately.
    rec_bf = rec.astype(jnp.bfloat16)

    def shade_bf2(o, d, p, t, u, v):
        r = rec_bf[jnp.maximum(p, 0)].astype(jnp.float32)
        # inline the shade math on r (tracer.shade_hits body)
        R = r.shape[0]
        n_ = tracer._interp3(r[:, 0:9].reshape(R, 3, 3), u, v)
        n_ = n_ / jnp.maximum(jnp.linalg.norm(n_, axis=-1, keepdims=True),
                              1e-20)
        n_ = jnp.where(jnp.sum(n_ * d, -1, keepdims=True) > 0, -n_, n_)
        alb = tracer._interp3(r[:, 9:21].reshape(R, 3, 4), u, v)[..., :3]
        ldir = jnp.asarray(cfg.light_dir, jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        ndl = jnp.maximum(jnp.sum(n_ * ldir, -1), 0.0)
        hit_ = p >= 0
        pt_ = o + d * jnp.where(hit_, t, 0.0)[..., None]
        park_o = jnp.asarray([3e7, 3e7, 3e7], jnp.float32)
        sh_o = jnp.where(hit_[..., None], pt_ + n_ * 1e-3, park_o)
        sh_d = jnp.broadcast_to(ldir, sh_o.shape)
        blocked = occluded(sh_o, sh_d, 1e8)
        ndl = jnp.where(blocked, 0.0, ndl)
        return alb * (cfg.ambient + ndl[..., None])

    dt = timed(jax.jit(shade_bf2), ro, rd, p2, t2, u2, v2)
    print(f"bounce shade+shadow (bf16 rec gather): {dt*1e3:.1f} ms",
          flush=True)


def tri13m():
    import jax
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import tracer, wavefront, intersect
    from skybox_rt_tpu.ops import pallas_rt

    W = H = 1024
    verts, faces, colors = scenes.sphere_field(copies=4, subdiv=7)
    print("probe tris:", faces.shape[0], flush=True)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors)
    sc = scene.finalize()
    tri = intersect.triangle_arrays(np.asarray(sc.verts),
                                    np.asarray(sc.faces))
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    o, d = tracer.camera_rays(cam, W, H)
    perm, _ = wavefront.tile_order_perm(W, H, 32)
    import jax.numpy as jnp
    o = jnp.asarray(np.asarray(o)[perm])
    d = jnp.asarray(np.asarray(d)[perm])
    R = o.shape[0]

    bs = bvh_mod.build_block_set(sc.bvh, tri_block=256)
    blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)

    def run(sub, L, blk=None):
        b = blk or blocks
        def f(o, d):
            return pallas_rt.closest_hit_bvh(o, d, b, sub=sub, L=L)
        try:
            dt = timed(f, o, d)
            print(f"  bvh sub={sub} L={L} tb={b['tri_block']}: "
                  f"{dt*1e3:.1f} ms {R/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"  bvh sub={sub} L={L}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)

    run(2, 256)
    run(2, 320)
    run(1, 128)
    run(1, 192)
    run(4, 256)
    for tb in (128, 512):
        bs2 = bvh_mod.build_block_set(sc.bvh, tri_block=tb)
        blocks2 = pallas_rt.prepare_bvh_blocks(*tri, bs2)
        run(2, 256, blk=blocks2)


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    config3_probes()
    northstar_bounces()
    tri13m()
