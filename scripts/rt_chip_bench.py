"""On-chip RT benchmark: octant-ordered clustered closest-hit + clustered
any-hit occlusion.  Run EXCLUSIVELY and detached (CLAUDE.md):

    setsid nohup timeout 3000 python scripts/rt_chip_bench.py \
        > /tmp/rt_bench.log 2>&1 &

Protocol matches PERF.md's RT table: icosphere subdiv=3 (P=1280),
primary rays at 1024x1024 in 32x32 pixel-tile order, steady-state device
wall over N repeats after a warmup dispatch.
"""
import time

import numpy as np


def timeit(fn, n=10):
    import jax
    r = fn()
    jax.block_until_ready(r)          # compile + warmup
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

    verts, faces = scenes.icosphere(subdiv=3)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=64)
    print(f"P={faces.shape[0]} tris, C={len(clusters['first'])} clusters",
          flush=True)

    W = H = 1024
    R = W * H
    cam = tracer.Camera(eye=(0.0, 0.6, 3.2), look_at=(0.0, -0.1, 0.0))
    o, d = tracer.camera_rays(cam, W, H)
    perm, inv = wavefront.tile_order_perm(W, H, 32)
    o_t = jnp.asarray(np.asarray(o)[perm])
    d_t = jnp.asarray(np.asarray(d)[perm])

    # 1) clustered closest-hit, octant-ordered (new)
    t0 = time.perf_counter()
    t = timeit(lambda: pallas_rt.closest_hit_clustered(o_t, d_t, *tri,
                                                       clusters))
    print(f"closest_hit_clustered(oct): {t*1e3:.2f} ms  "
          f"{R/t/1e6:.1f} Mrays/s  (compile+run1 {time.perf_counter()-t0:.0f}s)",
          flush=True)

    # shadow rays from the primary hits toward the light
    prim, th, u, v = pallas_rt.closest_hit_clustered(o_t, d_t, *tri, clusters)
    hitmask = prim >= 0
    pt = o_t + d_t * jnp.where(hitmask, th, 0.0)[:, None]
    ldir = jnp.asarray([0.4, 0.9, 0.2], jnp.float32)
    ldir = ldir / jnp.linalg.norm(ldir)
    sh_o = pt + 1e-3 * ldir
    sh_d = jnp.broadcast_to(ldir, sh_o.shape)

    # 2) clustered any-hit occlusion (new early-out kernel)
    t0 = time.perf_counter()
    t = timeit(lambda: pallas_rt.any_hit_clustered(sh_o, sh_d, *tri,
                                                   clusters, t_max=1e8))
    print(f"any_hit_clustered:          {t*1e3:.2f} ms  "
          f"{R/t/1e6:.1f} Mrays/s  (compile+run1 {time.perf_counter()-t0:.0f}s)",
          flush=True)

    # 3) old occlusion path = full closest-hit stream (baseline)
    t = timeit(lambda: pallas_rt.closest_hit_clustered(
        sh_o, sh_d, *tri, clusters,
        t_max=jnp.full((R,), 1e8, jnp.float32))[0] >= 0)
    print(f"occlusion-via-closest(old): {t*1e3:.2f} ms  "
          f"{R/t/1e6:.1f} Mrays/s", flush=True)

    # 4) full tracer frame (sphere+plane, shadows) steady state
    pv, pf = scenes.mesh_grid_plane(n=8, y=-1.0, half=4.0)
    colors = np.tile(np.array([[0.8, 0.3, 0.25, 1.0]], np.float32),
                     (verts.shape[0], 1))
    pc = np.tile(np.array([[0.55, 0.6, 0.65, 1.0]], np.float32),
                 (pv.shape[0], 1))
    sfaces = np.concatenate([faces, pf + verts.shape[0]])
    sverts = np.concatenate([verts, pv])
    scolors = np.concatenate([colors, pc])
    scene = tracer.RTScene(verts=sverts.astype(np.float32),
                           faces=sfaces.astype(np.int32), colors=scolors)
    cfg = tracer.RTConfig(width=W, height=H, shadows=True, engine="pallas")

    t0 = time.perf_counter()
    frame, (fo, fd) = tracer.make_frame_fn(scene, cam, cfg)
    img = frame(fo, fd)
    jax.block_until_ready(img)
    print(f"tracer frame compile+run1: {time.perf_counter()-t0:.0f}s",
          flush=True)
    t = timeit(lambda: frame(fo, fd), n=5)
    rays = 2 * R      # primary + shadow
    print(f"tracer frame (primary+shadow, 1 dispatch): {t*1e3:.2f} ms  "
          f"{rays/t/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
