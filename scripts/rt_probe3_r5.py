"""Round-5 chip probes, part 3: tri_block/unroll continuation at 1.31M
tris, and the northstar frame A/B over the tracer's block size.

  PYTHONPATH=/root/repo:/root/.axon_site setsid nohup timeout 7200 \
    python scripts/rt_probe3_r5.py > log 2>&1 &
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


def tri13m():
    import jax.numpy as jnp
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
    o = jnp.asarray(np.asarray(o)[perm])
    d = jnp.asarray(np.asarray(d)[perm])
    R = o.shape[0]

    def run(tb, sub=2, L=256, unroll=8):
        try:
            bs = bvh_mod.build_block_set(sc.bvh, tri_block=tb)
            blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)

            def f(o, d):
                return pallas_rt.closest_hit_bvh(o, d, blocks, sub=sub,
                                                 L=L, unroll=unroll)
            dt = timed(f, o, d)
            print(f"  tb={tb} sub={sub} L={L} unroll={unroll}: "
                  f"{dt*1e3:.1f} ms {R/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"  tb={tb} unroll={unroll}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)

    run(1024)
    run(2048)
    run(512, unroll=16)
    run(1024, unroll=16)


def northstar_tb():
    import jax
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import tracer

    W = H = 1024
    verts, faces, colors = scenes.sphere_field(copies=9, subdiv=5)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35)
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    cfg = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True)

    import skybox_rt_tpu.rt.tracer as tr
    for tb in (256, 512, 1024):
        tr.BVH_TRI_BLOCK = tb
        frame, (o, d) = tracer.make_frame_fn(scene, cam, cfg)
        dt = timed(frame, o, d, reps=3)
        rays = W * H * (2 + 2 * cfg.bounces)
        print(f"northstar tb={tb}: {dt*1e3:.1f} ms "
              f"{rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    tri13m()
    northstar_tb()
