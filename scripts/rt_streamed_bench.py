"""On-chip benchmark of the HBM-streamed large-scene RT kernel.
Run exclusively, detached (see rt_chip_bench.py header)."""
import time

import numpy as np


def timeit(fn, n=5):
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
    W = H = 1024
    R = W * H
    cam = tracer.Camera(eye=(0.0, 0.6, 3.2), look_at=(0.0, -0.1, 0.0))
    o, d = tracer.camera_rays(cam, W, H)
    perm, _ = wavefront.tile_order_perm(W, H, 32)
    o_t = jnp.asarray(np.asarray(o)[perm])
    d_t = jnp.asarray(np.asarray(d)[perm])

    for subdiv in (5, 6):
        verts, faces = scenes.icosphere(subdiv=subdiv)
        P = faces.shape[0]
        tri = intersect.triangle_arrays(jnp.asarray(verts),
                                        jnp.asarray(faces))
        bvh = bvh_mod.build(verts, faces)
        order = bvh_mod.build_clusters(bvh, max_tris=64)["order"]
        t0 = time.perf_counter()
        t = timeit(lambda: pallas_rt.closest_hit_streamed(
            o_t, d_t, *tri, order=order))
        print(f"streamed P={P}: {t*1e3:.2f} ms  {R/t/1e6:.1f} Mrays/s  "
              f"(compile+run1 {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
