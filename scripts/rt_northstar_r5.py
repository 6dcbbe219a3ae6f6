"""Round-5 north-star work: HONEST (D2H-barriered) re-measurement +
same-window A/Bs for the shade/compaction/bounce levers (VERDICT r4 #4)
and the 1.31M-tri droop probes (VERDICT r4 #7).

All timings: warm compiled fns, min of reps, every timed region ended by
a 4-byte D2H readback (`_sync`) — block_until_ready over the tunnel can
return before the device finishes (PERF.md r5 mirage section).

  setsid nohup timeout 7200 python scripts/rt_northstar_r5.py > log 2>&1 &
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


def build_scene(copies=9, subdiv=5):
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import tracer

    verts, faces, colors = scenes.sphere_field(copies=copies, subdiv=subdiv)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35)
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    cfg = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True)
    return scene, cam, cfg


def frame_bench():
    import jax
    from skybox_rt_tpu.rt import tracer

    scene, cam, cfg = build_scene()
    print("tris:", scene.faces.shape[0], flush=True)
    frame, (o, d) = tracer.make_frame_fn(scene, cam, cfg)
    dt = timed(frame, o, d, reps=4)
    rays = W * H * (2 + 2 * cfg.bounces)
    print(f"northstar frame: {dt*1e3:.1f} ms  {rays/dt/1e6:.1f} Mrays/s e2e",
          flush=True)

    # no-compaction A/B (same window): is the argsort+scatter still
    # paying for itself under honest timing?
    cfg2 = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True,
                           compact_bounces=False)
    frame2, _ = tracer.make_frame_fn(scene, cam, cfg2)
    dt2 = timed(frame2, o, d, reps=3)
    print(f"  no-compaction: {dt2*1e3:.1f} ms", flush=True)

    # launch-level breakdown (separately-jitted stages, honest syncs)
    import jax.numpy as jnp
    sc = scene.finalize()
    closest, occluded = tracer.make_intersectors(sc, cfg)
    sa = tracer.scene_shade_arrays(sc, cfg)
    jc = jax.jit(lambda o, d: closest(o, d))
    dtc = timed(jc, o, d)
    print(f"  primary closest: {dtc*1e3:.1f} ms", flush=True)
    prim, t, u, v = jc(o, d)
    jshade = jax.jit(lambda o, d, p, t, u, v: tracer.shade_hits(
        sa, cfg, occluded, o, d, p, t, u, v))
    dts = timed(jshade, o, d, prim, t, u, v)
    print(f"  primary shade+shadow: {dts*1e3:.1f} ms", flush=True)
    cfg_nosh = tracer.RTConfig(width=W, height=H, bounces=2, shadows=False)
    jshade2 = jax.jit(lambda o, d, p, t, u, v: tracer.shade_hits(
        sa, cfg_nosh, occluded, o, d, p, t, u, v))
    dts2 = timed(jshade2, o, d, prim, t, u, v)
    print(f"  primary shade only:   {dts2*1e3:.1f} ms", flush=True)


def tri13m_probe():
    """1.31M-tri droop probes: L sweep + sub sweep (VERDICT r4 #7)."""
    import jax
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import tracer, wavefront
    from skybox_rt_tpu.ops import pallas_rt
    from skybox_rt_tpu.rt import intersect

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
    o, d = o[perm], d[perm]

    bs = bvh_mod.build_block_set(sc.bvh, tri_block=256)
    blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)
    R = o.shape[0]
    for sub, L in [(2, 256), (2, 320), (1, 128), (1, 192), (4, 256),
                   (2, 192)]:
        try:
            f = jax.jit(lambda o, d, sub=sub, L=L: pallas_rt.closest_hit_bvh(
                o, d, blocks, sub=sub, L=L))
            dt = timed(f, o, d)
            print(f"  bvh sub={sub} L={L}: {dt*1e3:.1f} ms "
                  f"{R/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"  bvh sub={sub} L={L}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)

    # finer treelet cut: smaller tri_block = tighter AABBs, more blocks
    for tb in (128, 512):
        try:
            bs2 = bvh_mod.build_block_set(sc.bvh, tri_block=tb)
            blocks2 = pallas_rt.prepare_bvh_blocks(*tri, bs2)
            f = jax.jit(lambda o, d, b=blocks2: pallas_rt.closest_hit_bvh(
                o, d, b, sub=2, L=256))
            dt = timed(f, o, d)
            print(f"  bvh tri_block={tb} sub=2 L=256: {dt*1e3:.1f} ms "
                  f"{R/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"  bvh tri_block={tb}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    frame_bench()
    tri13m_probe()
