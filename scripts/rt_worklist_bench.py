"""On-chip benchmark: worklist-driven large-scene RT kernel vs the dense
(G, NB)-grid streamed kernel (VERDICT #4 — target >= 10 Mrays/s @ 100k
tris @ 1024^2).  Run exclusively, detached (see rt_chip_bench.py header)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=5):
    import jax
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def multi_sphere(subdiv, copies):
    """`copies` translated icospheres — scales triangle count without
    changing the per-triangle geometry statistics."""
    from skybox_rt_tpu.models import scenes
    verts, faces = scenes.icosphere(subdiv=subdiv)
    vs, fs = [], []
    grid = int(np.ceil(np.sqrt(copies)))
    for i in range(copies):
        dx = (i % grid - (grid - 1) / 2) * 2.4
        dy = (i // grid - (grid - 1) / 2) * 2.4
        vs.append(verts + np.asarray([dx, dy, 0], np.float32))
        fs.append(faces + i * verts.shape[0])
    return np.concatenate(vs), np.concatenate(fs)


def main():
    import jax
    import jax.numpy as jnp

    from skybox_rt_tpu.ops import pallas_rt
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import intersect, tracer, wavefront

    print("platform:", jax.devices()[0].platform, flush=True)
    W = H = 1024
    R = W * H
    cam = tracer.Camera(eye=(0.0, 0.6, 9.0), look_at=(0.0, 0.0, 0.0))
    o, d = tracer.camera_rays(cam, W, H)
    perm, _ = wavefront.tile_order_perm(W, H, 32)
    o_t = jnp.asarray(np.asarray(o)[perm])
    d_t = jnp.asarray(np.asarray(d)[perm])

    cases = [
        ("ico5x1", 5, 1),     # 20,480 tris
        ("ico5x5", 5, 5),     # 102,400 tris — the VERDICT target size
        ("ico6x1", 6, 1),     # 81,920 tris
        ("ico6x4", 6, 4),     # 327,680 tris
    ]
    for name, subdiv, copies in cases:
        verts, faces = multi_sphere(subdiv, copies)
        P = faces.shape[0]
        tri = intersect.triangle_arrays(jnp.asarray(verts),
                                        jnp.asarray(faces))
        bvh = bvh_mod.build(verts, faces)
        order = bvh_mod.build_clusters(bvh, max_tris=64)["order"]

        # diagnostics: worklist occupancy + pre-pass cost in isolation
        rays, _, _, G = pallas_rt._pack_rays(o_t, d_t, sub=4)
        trec = pallas_rt._pack_tris(*tri, order=order)
        trec = jnp.pad(trec, ((0, (-trec.shape[0]) % 512), (0, 0)))
        aabb = pallas_rt._block_aabbs(trec, 512)
        tm = pallas_rt._pack_tmax(None, G, sub=4)
        pre = jax.jit(pallas_rt._active_block_lists)
        _, cnt = pre(rays, aabb, tm)
        jax.block_until_ready(cnt)
        tp = timeit(lambda: pre(rays, aabb, tm))
        cnt = np.asarray(cnt)
        print(f"  prepass {name}: {tp*1e3:.2f} ms; NB={aabb.shape[0]} "
              f"active/rayblock mean={cnt.mean():.1f} max={cnt.max()}",
              flush=True)

        for f2b in (False, True):
            t0 = time.perf_counter()
            t = timeit(lambda: pallas_rt.closest_hit_worklist(
                o_t, d_t, *tri, order=order, front_to_back=f2b))
            tag = "f2b" if f2b else "id-order"
            print(f"worklist {name} P={P} [{tag}]: {t*1e3:.2f} ms  "
                  f"{R/t/1e6:.1f} Mrays/s  "
                  f"(compile+run1 {time.perf_counter()-t0:.0f}s)",
                  flush=True)

        # correctness: strided ray subsample vs the stackless BVH oracle
        # (independent XLA path) — hit masks must match, t's must agree
        sl = slice(0, None, 64)                      # 16,384 rays
        pw, tw, _, _ = pallas_rt.closest_hit_worklist(
            o_t[sl], d_t[sl], *tri, order=order)
        pb, tb, _, _ = bvh_mod.closest_hit_stackless(
            bvh.as_stackless_arrays(), tri, o_t[sl], d_t[sl],
            t_min=1e-4, leaf_size=bvh.leaf_size)
        pw_, pb_ = np.asarray(pw), np.asarray(pb)
        hit_agree = ((pw_ >= 0) == (pb_ >= 0)).mean()
        hits = (pw_ >= 0) & (pb_ >= 0)
        t_ok = np.allclose(np.asarray(tw)[hits], np.asarray(tb)[hits],
                           rtol=1e-4)
        print(f"  parity {name}: hit-mask agree {hit_agree:.4f}, "
              f"t allclose {t_ok}", flush=True)
        assert hit_agree > 0.9999 and t_ok, "worklist parity FAILED"

        if P <= 90000:     # streamed comparison in the same window
            t0 = time.perf_counter()
            t = timeit(lambda: pallas_rt.closest_hit_streamed(
                o_t, d_t, *tri, order=order))
            print(f"streamed {name} P={P}: {t*1e3:.2f} ms  "
                  f"{R/t/1e6:.1f} Mrays/s  "
                  f"(compile+run1 {time.perf_counter()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
