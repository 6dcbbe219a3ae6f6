"""Round-5 chip probes, part 8: compaction-key order A/B on the
north-star frame — octant-major (default) vs origin-major (argsort_om:
two octree levels of origin above the octant bits).  Same
process/window, D2H-barriered min-of-4, drift re-check.

  setsid nohup timeout 5400 python scripts/rt_probe8_r5.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W = H = 1024
BOUNCES = 2


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import jax

    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.rt import tracer

    print("platform:", jax.devices()[0].platform, flush=True)
    verts, faces, colors = scenes.sphere_field(copies=9, subdiv=5)
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.35).finalize()
    cam = tracer.Camera(eye=(0.0, 2.5, 9.5), look_at=(0.0, -0.4, 0.0),
                        fov_y_deg=55.0)
    rays = W * H * (2 + 2 * BOUNCES)

    arms = [
        ("F octant-major (default)", dict(compact_method="argsort")),
        ("G origin-major", dict(compact_method="argsort_om")),
    ]
    frames = {}
    imgs = {}
    for name, kw in arms:
        cfg = tracer.RTConfig(width=W, height=H, bounces=BOUNCES,
                              shadows=True, **kw)
        t0 = time.perf_counter()
        frame, (o, d) = tracer.make_frame_fn(scene, cam, cfg)
        img = frame(o, d)
        _sync(img)
        print(f"{name}: compile+first {time.perf_counter()-t0:.0f}s",
              flush=True)
        dt = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            img = frame(o, d)
            _sync(img)
            dt = min(dt, time.perf_counter() - t0)
        frames[name] = (frame, o, d)
        imgs[name] = np.asarray(img)
        print(f"{name}: {dt*1e3:.1f} ms/frame  {rays/dt/1e6:.1f} Mrays/s",
              flush=True)

    err = np.abs(imgs[arms[1][0]] - imgs[arms[0][0]]).max()
    print(f"max|diff| G vs F = {err:.2e}", flush=True)

    frame, o, d = frames[arms[0][0]]
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        img = frame(o, d)
        _sync(img)
        dt = min(dt, time.perf_counter() - t0)
    print(f"F re-timed (drift check): {dt*1e3:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
