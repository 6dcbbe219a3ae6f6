"""North-star scene-class benchmark (VERDICT r3 #2 / BASELINE.md scaling
row): 1024x1024 multi-bounce RT over a >=100k-tri multi-object scene —
sphere field + ground plane, 2 mirror bounces, shadows — as ONE
make_frame_fn dispatch.  Reports e2e Mrays/s and per-stage survivor
counts.  Run exclusively, detached:

  setsid nohup timeout 5400 python scripts/rt_northstar_bench.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BOUNCES = 2
W = H = 1024


def build_scene():
    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import tracer

    verts, faces, colors = scenes.sphere_field(copies=9, subdiv=5)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35)
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    cfg = tracer.RTConfig(width=W, height=H, bounces=BOUNCES, shadows=True)
    return scene, cam, cfg


def survivor_counts(scene, cam, cfg):
    """Per-stage ray statistics (the reference's per-unit counter report
    analog, runtime/stub/utils.cpp:159-340): hits after the primary pass
    and surviving reflective weight per bounce."""
    import jax.numpy as jnp

    from skybox_rt_tpu.rt import tracer

    scene = scene.finalize()
    closest, occluded = tracer.make_intersectors(scene, cfg)
    o, d = tracer.camera_rays(cam, cfg.width, cfg.height)
    counts = {}
    prim, t, u, v = closest(o, d)
    hit = np.asarray(prim >= 0)
    counts["primary_hits"] = int(hit.sum())
    sa = tracer.scene_shade_arrays(scene, cfg)
    rgb, hitm, pt, n = tracer.shade_hits(sa, cfg, occluded, o, d,
                                         prim, t, u, v)
    weight = np.asarray(hitm) * scene.reflectivity
    cur_o, cur_d, cur_n = pt, d, n
    for b in range(cfg.bounces):
        active = weight > 0
        counts[f"bounce{b+1}_active"] = int(active.sum())
        rd = cur_d - 2.0 * jnp.sum(cur_d * cur_n, -1, keepdims=True) * cur_n
        ro = cur_o + cur_n * 1e-3
        p2, t2, u2, v2 = closest(ro, rd)
        h2 = np.asarray(p2 >= 0) & active
        counts[f"bounce{b+1}_hits"] = int(h2.sum())
        _, _, pt2, n2 = tracer.shade_hits(sa, cfg, occluded, ro, rd,
                                          p2, t2, u2, v2)
        weight = weight * np.asarray(p2 >= 0) * scene.reflectivity
        cur_o, cur_d, cur_n = pt2, rd, n2
    return counts


def main():
    import jax

    from skybox_rt_tpu.rt import tracer

    print("platform:", jax.devices()[0].platform, flush=True)
    scene, cam, cfg = build_scene()
    P = scene.faces.shape[0]
    print(f"scene: {P} tris, {cfg.bounces} bounces, shadows", flush=True)

    t0 = time.perf_counter()
    frame, (o, d) = tracer.make_frame_fn(scene, cam, cfg)

    def _sync(x):
        # D2H barrier: block_until_ready over the tunnel can return
        # before the device finishes (PERF.md r5 mirage) — a readback
        # cannot
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf[(0,) * leaf.ndim])

    img = frame(o, d)
    _sync(img)
    print(f"compile+first frame: {time.perf_counter()-t0:.0f}s", flush=True)

    dt = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        img = frame(o, d)
        _sync(img)
        dt = min(dt, time.perf_counter() - t0)
    img_np = np.asarray(img)
    assert np.isfinite(img_np).all()
    cover = (img_np[..., :3].sum(-1) > 0).mean()
    print(f"coverage: {cover:.3f}", flush=True)
    # ray launches per frame: primary + shadow + bounces*(closest+shadow)
    rays = W * H * (2 + 2 * cfg.bounces)
    print(f"northstar 1024^2 x{cfg.bounces}bounce P={P}: {dt*1e3:.1f} "
          f"ms/frame  {rays/dt/1e6:.1f} Mrays/s e2e", flush=True)

    print("survivors:", survivor_counts(scene, cam, cfg), flush=True)


if __name__ == "__main__":
    main()
