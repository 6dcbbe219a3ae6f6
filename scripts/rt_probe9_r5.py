"""1.31M-tri closest-hit kernel: unroll 32 A/B vs the u=16 early-exit
default (81.3 ms band).  Standalone kernel launches, D2H-barriered."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])

def main():
    import jax, jax.numpy as jnp
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import bvh as bvh_mod, tracer, intersect, wavefront
    from skybox_rt_tpu.ops import pallas_rt
    print("platform:", jax.devices()[0].platform, flush=True)
    W = H = 1024
    verts, faces, colors = scenes.sphere_field(copies=4, subdiv=7)
    sc = tracer.RTScene(verts=verts, faces=faces, colors=colors).finalize()
    tri = intersect.triangle_arrays(np.asarray(sc.verts), np.asarray(sc.faces))
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0), fov_y_deg=55.0)
    o, d = tracer.camera_rays(cam, W, H)
    pm, _ = wavefront.tile_order_perm(W, H, 32)
    o = jnp.asarray(np.asarray(o)[pm]); d = jnp.asarray(np.asarray(d)[pm])
    print(f"P={sc.faces.shape[0]}", flush=True)
    for tb, u, ee in ((512, 16, True), (512, 32, True), (256, 32, True)):
        bs = bvh_mod.build_block_set(sc.bvh, tri_block=tb)
        blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)
        def f(o, d):
            return pallas_rt.closest_hit_bvh(o, d, blocks, sub=2, L=256,
                                             unroll=u, early_exit=ee)
        try:
            _sync(f(o, d))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); _sync(f(o, d))
                best = min(best, time.perf_counter() - t0)
            print(f"tb={tb} u={u} ee={ee}: {best*1e3:.1f} ms "
                  f"{o.shape[0]/best/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"tb={tb} u={u}: FAIL {str(e)[:120]}", flush=True)

main()
