"""Round-5 chip probes, part 4: the northstar's bounce launches under
their REAL (compacted) ray distributions — tile shape / L / tri_block
A/Bs per launch class — plus compaction piece costs and unroll=32 at
1.31M tris.

  PYTHONPATH=/root/repo:/root/.axon_site setsid nohup timeout 7200 \
    python scripts/rt_probe4_r5.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W = H = 1024


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


def main():
    import jax
    import jax.numpy as jnp
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import tracer, intersect
    from skybox_rt_tpu.ops import pallas_rt

    verts, faces, colors = scenes.sphere_field(copies=9, subdiv=5)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35)
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    cfg = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True)
    sc = scene.finalize()
    tri = intersect.triangle_arrays(np.asarray(sc.verts),
                                    np.asarray(sc.faces))
    closest, occluded = tracer.make_intersectors(sc, cfg)
    sa = tracer.scene_shade_arrays(sc, cfg)
    o, d = tracer.camera_rays(cam, W, H)

    # primary pass + compacted bounce-1 rays, EXACTLY as trace_rays does
    jc = jax.jit(lambda o, d: closest(o, d))
    prim, t, u, v = jc(o, d)
    _, hit, pt, n = tracer.shade_hits(sa, cfg, occluded, o, d,
                                      prim, t, u, v)
    refl = jnp.float32(scene.reflectivity)
    weight = jnp.where(hit, refl, 0.0)
    rd = d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
    ro = pt + n * 1e-3
    active = weight > 0
    perm = jnp.argsort(tracer._compact_key(active, ro, rd), stable=True)
    park_o = jnp.asarray([3e7, 3e7, 3e7], jnp.float32)
    park_d = jnp.asarray([0.57735, 0.57735, 0.57735], jnp.float32)
    ro_c = jnp.where(active[..., None], ro, park_o)[perm]
    rd_c = jnp.where(active[..., None], rd, park_d)[perm]
    ro_c = jax.block_until_ready(ro_c)
    print("bounce-1 active rays:", int(np.asarray(active).sum()),
          flush=True)

    # compaction piece costs
    def compact_cost(o, d, w):
        act = w > 0
        p = jnp.argsort(tracer._compact_key(act, o, d), stable=True)
        inv = jnp.zeros_like(p).at[p].set(
            jnp.arange(p.shape[0], dtype=p.dtype), unique_indices=True)
        oc = jnp.where(act[..., None], o, park_o)[p]
        dc = jnp.where(act[..., None], d, park_d)[p]
        return oc, dc, inv
    dt = timed(jax.jit(compact_cost), ro, rd, weight)
    print(f"compaction (key+argsort+scatter-inv+2 permutes): "
          f"{dt*1e3:.1f} ms", flush=True)

    # bounce-closest A/B over kernel shapes on the real compacted rays
    R = ro_c.shape[0]
    for tb in (256, 512):
        bs = bvh_mod.build_block_set(sc.bvh, tri_block=tb)
        blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)
        for sub, L in ((2, 256), (1, 128), (1, 256), (4, 256)):
            for unroll in ((8, 16) if tb == 512 else (8,)):
                def f(o, d):
                    return pallas_rt.closest_hit_bvh(
                        o, d, blocks, sub=sub, L=L, unroll=unroll)
                try:
                    dt = timed(f, ro_c, rd_c)
                    print(f"  bounce closest tb={tb} sub={sub} L={L} "
                          f"u={unroll}: {dt*1e3:.1f} ms", flush=True)
                except Exception as e:
                    print(f"  tb={tb} sub={sub} L={L}: FAIL "
                          f"{str(e)[:100]}", flush=True)

    # shadow any-hit on the compacted hit points (bounce shade's shadow)
    p2, t2, u2, v2 = jc(ro_c, rd_c)
    hit2 = p2 >= 0
    r2 = sa["rec"][jnp.maximum(p2, 0)]
    R2 = r2.shape[0]
    n2 = tracer._interp3(r2[:, 0:9].reshape(R2, 3, 3), u2, v2)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True),
                          1e-20)
    pt2 = ro_c + rd_c * jnp.where(hit2, t2, 0.0)[..., None]
    ldir = jnp.asarray(cfg.light_dir, jnp.float32)
    ldir = ldir / jnp.linalg.norm(ldir)
    sh_o = jnp.where(hit2[..., None], pt2 + n2 * 1e-3, park_o)
    sh_d = jnp.broadcast_to(ldir, sh_o.shape)
    sh_o = jax.block_until_ready(sh_o)

    bs = bvh_mod.build_block_set(sc.bvh, tri_block=256)
    blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)
    for sub, L in ((2, 256), (1, 128), (1, 256)):
        def g(o, d):
            return pallas_rt.any_hit_bvh(o, d, blocks, t_max=1e8,
                                         sub=sub, L=L)
        dt = timed(g, sh_o, sh_d)
        print(f"  bounce shadow any-hit sub={sub} L={L}: {dt*1e3:.1f} ms",
              flush=True)

    # 1.31M continuation: unroll=32
    verts, faces, colors = scenes.sphere_field(copies=4, subdiv=7)
    sc2 = tracer.RTScene(verts=verts, faces=faces,
                         colors=colors).finalize()
    tri2 = intersect.triangle_arrays(np.asarray(sc2.verts),
                                     np.asarray(sc2.faces))
    from skybox_rt_tpu.rt import wavefront
    o13, d13 = tracer.camera_rays(cam, W, H)
    pm, _ = wavefront.tile_order_perm(W, H, 32)
    o13 = jnp.asarray(np.asarray(o13)[pm])
    d13 = jnp.asarray(np.asarray(d13)[pm])
    for tb, unroll in ((512, 32), (512, 64)):
        bs2 = bvh_mod.build_block_set(sc2.bvh, tri_block=tb)
        blocks2 = pallas_rt.prepare_bvh_blocks(*tri2, bs2)
        def h(o, d):
            return pallas_rt.closest_hit_bvh(o, d, blocks2, sub=2, L=256,
                                             unroll=unroll)
        try:
            dt = timed(h, o13, d13)
            print(f"  1.31M tb={tb} u={unroll}: {dt*1e3:.1f} ms "
                  f"{o13.shape[0]/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"  1.31M u={unroll}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    main()
