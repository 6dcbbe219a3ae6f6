"""On-chip A/B: BVH builder (median vs SAH) for the clustered Pallas RT
kernel, and bounce re-compaction on/off for a reflective frame.
Run EXCLUSIVELY and detached (CLAUDE.md):

    setsid nohup timeout 3000 python scripts/rt_sah_bench.py \
        > /tmp/rt_sah_bench.log 2>&1 &

Scene is sphere+plane (mixed triangle scales — the case SAH treelets help)
at 1024x1024, 32x32 pixel-tile ray order, steady-state device walls.
"""
import time

import numpy as np


def timeit(fn, n=10):
    import jax
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.models import scenes
    from skybox_rt_tpu.ops import pallas_rt
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import intersect, tracer, wavefront

    print("platform:", jax.devices()[0].platform, flush=True)

    sv, sf = scenes.icosphere(subdiv=3)
    pv, pf = scenes.mesh_grid_plane(n=16, y=-1.0, half=4.0)
    verts = np.concatenate([sv, pv]).astype(np.float32)
    faces = np.concatenate([sf, pf + sv.shape[0]]).astype(np.int32)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    print(f"P={faces.shape[0]} tris", flush=True)

    W = H = 1024
    R = W * H
    cam = tracer.Camera(eye=(0.0, 0.9, 3.4), look_at=(0.0, -0.2, 0.0))
    o, d = tracer.camera_rays(cam, W, H)
    perm, inv = wavefront.tile_order_perm(W, H, 32)
    o_t = jnp.asarray(np.asarray(o)[perm])
    d_t = jnp.asarray(np.asarray(d)[perm])

    results = {}
    for method in ("median", "sah"):
        bvh = bvh_mod.build(verts, faces, method=method)
        clusters = bvh_mod.build_clusters(bvh, max_tris=64)
        C = len(clusters["first"])
        t0 = time.perf_counter()
        t = timeit(lambda: pallas_rt.closest_hit_clustered(
            o_t, d_t, *tri, clusters))
        results[method] = t
        print(f"closest_hit_clustered[{method}]: C={C}  {t*1e3:.2f} ms  "
              f"{R/t/1e6:.1f} Mrays/s  "
              f"(compile+run1 {time.perf_counter()-t0:.0f}s)", flush=True)
    print(f"SAH speedup vs median: {results['median']/results['sah']:.2f}x",
          flush=True)

    # bounce-compaction A/B: reflective sphere over plane, 2 bounces
    colors = np.concatenate([
        np.tile(np.array([[0.8, 0.3, 0.25, 1.0]], np.float32),
                (sv.shape[0], 1)),
        np.tile(np.array([[0.55, 0.6, 0.65, 1.0]], np.float32),
                (pv.shape[0], 1))])
    scene = tracer.RTScene(verts=verts, faces=faces, colors=colors,
                           reflectivity=0.5)
    for compact in (False, True):
        cfg = tracer.RTConfig(width=W, height=H, shadows=True, bounces=2,
                              engine="pallas", compact_bounces=compact)
        t0 = time.perf_counter()
        frame, (fo, fd) = tracer.make_frame_fn(scene, cam, cfg)
        img = frame(fo, fd)
        jax.block_until_ready(img)
        print(f"bounce frame compile+run1 [compact={compact}]: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        t = timeit(lambda: frame(fo, fd), n=5)
        rays = 4 * R   # primary + shadow + 2 bounce waves (upper bound)
        print(f"bounce frame [compact={compact}]: {t*1e3:.2f} ms  "
              f"{rays/t/1e6:.1f} Mrays/s(launched)", flush=True)


if __name__ == "__main__":
    main()
