"""Round-5 chip probes, part 5: compaction-method A/B (argsort vs
octant counting sort vs partition) — piece cost and full northstar
frame effect.

  PYTHONPATH=/root/repo:/root/.axon_site setsid nohup timeout 7200 \
    python scripts/rt_probe5_r5.py > log 2>&1 &
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
    from skybox_rt_tpu.rt import tracer

    verts, faces, colors = scenes.sphere_field(copies=9, subdiv=5)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35)
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    sc = scene.finalize()
    cfg0 = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True)
    closest, occluded = tracer.make_intersectors(sc, cfg0)
    sa = tracer.scene_shade_arrays(sc, cfg0)
    o, d = tracer.camera_rays(cam, W, H)
    prim, t, u, v = jax.jit(lambda o, d: closest(o, d))(o, d)
    _, hit, pt, n = tracer.shade_hits(sa, cfg0, occluded, o, d,
                                      prim, t, u, v)
    rd = d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
    ro = pt + n * 1e-3
    active = jax.block_until_ready(hit)

    for method in ("argsort", "octant", "partition"):
        f = jax.jit(lambda a, o, d, m=method: tracer._compact_perm(
            a, o, d, m))
        dt = timed(f, active, ro, rd)
        print(f"compact_perm {method}: {dt*1e3:.1f} ms", flush=True)

    for method in ("octant", "partition", "argsort"):
        cfg = tracer.RTConfig(width=W, height=H, bounces=2, shadows=True,
                              compact_method=method)
        frame, (o2, d2) = tracer.make_frame_fn(scene, cam, cfg)
        dt = timed(frame, o2, d2, reps=3)
        rays = W * H * (2 + 2 * cfg.bounces)
        print(f"northstar frame [{method}]: {dt*1e3:.1f} ms "
              f"{rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    main()
