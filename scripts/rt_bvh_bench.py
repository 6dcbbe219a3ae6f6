"""On-chip benchmark: hierarchical BVH-treelet worklist kernel
(ops.pallas_rt.closest_hit_bvh) vs the round-3 flat-prepass worklist,
same window (VERDICT r3 #1 — target: rays/s curve flattens, >=15 M @327k
tris, plus a >=1M-tri point).  Run exclusively, detached:

  setsid nohup timeout 3000 python scripts/rt_bvh_bench.py > log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rt_worklist_bench import multi_sphere, timeit   # noqa: E402


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
        ("ico5x1", 5, 1, "sah"),      # 20,480 tris
        ("ico5x5", 5, 5, "sah"),      # 102,400
        ("ico6x4", 6, 4, "sah"),      # 327,680
        ("ico7x4", 7, 4, "lbvh"),     # 1,310,720 — the 1M-tri point
    ]
    tri_blocks = [int(x) for x in
                  os.environ.get("TRI_BLOCKS", "256").split(",")]
    L = int(os.environ.get("WORKLIST_L", "256"))
    SUB = int(os.environ.get("SUB", "4"))
    only = os.environ.get("CASES")
    for name, subdiv, copies, method in cases:
        if only and name not in only.split(","):
            continue
        verts, faces = multi_sphere(subdiv, copies)
        P = faces.shape[0]
        tri = intersect.triangle_arrays(jnp.asarray(verts),
                                        jnp.asarray(faces))
        t0 = time.perf_counter()
        bvh = bvh_mod.build(verts, faces, method=method)
        t_build = time.perf_counter() - t0

        for tb in tri_blocks:
            t0 = time.perf_counter()
            bs = bvh_mod.build_block_set(bvh, tri_block=tb)
            blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)
            t_cut = time.perf_counter() - t0
            C = bs["num_blocks"]

            # prepass diagnostics: conservative entry lists in isolation
            rays, _, _, G = pallas_rt._pack_rays(o_t, d_t, sub=SUB)
            tm = pallas_rt._pack_tmax(None, G, sub=SUB)
            levels = tuple(blocks["levels"])
            pre = jax.jit(lambda r, t: pallas_rt._conservative_entry_lists(
                r, t, levels, L))
            _, ec, tot = pre(rays, tm)
            jax.block_until_ready(tot)
            tp = timeit(lambda: pre(rays, tm))
            ec, tot = np.asarray(ec), np.asarray(tot)
            print(f"  prepass {name} tb={tb}: {tp*1e3:.2f} ms; C={C} "
                  f"entries/rb mean={ec.mean():.1f} max={ec.max()} "
                  f"blocks/rb mean={tot.mean():.1f} max={tot.max()} "
                  f"(bvh {t_build:.1f}s cut {t_cut:.1f}s)", flush=True)

            t0 = time.perf_counter()
            t = timeit(lambda: pallas_rt.closest_hit_bvh(o_t, d_t, blocks,
                                                         L=L, sub=SUB))
            print(f"bvh-worklist {name} P={P} tb={tb} L={L} sub={SUB}: "
                  f"{t*1e3:.2f} ms  "
                  f"{R/t/1e6:.1f} Mrays/s  "
                  f"(compile+run1 {time.perf_counter()-t0:.0f}s)",
                  flush=True)

        # round-3 flat worklist, same window (skip at 1M: its SMEM cap
        # forces 2560-tri blocks and it was already losing at 327k)
        if P <= 400000:
            order = bvh_mod.build_clusters(bvh, max_tris=64)["order"]
            t0 = time.perf_counter()
            t = timeit(lambda: pallas_rt.closest_hit_worklist(
                o_t, d_t, *tri, order=order))
            print(f"flat-worklist {name} P={P}: {t*1e3:.2f} ms  "
                  f"{R/t/1e6:.1f} Mrays/s  "
                  f"(compile+run1 {time.perf_counter()-t0:.0f}s)",
                  flush=True)

        # parity: strided subsample vs the stackless BVH oracle
        sl = slice(0, None, 64)
        bs = bvh_mod.build_block_set(bvh, tri_block=tri_blocks[0])
        blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)
        pw, tw, _, _ = pallas_rt.closest_hit_bvh(o_t[sl], d_t[sl], blocks)
        pb, tb_, _, _ = bvh_mod.closest_hit_stackless(
            bvh.as_stackless_arrays(), tri, o_t[sl], d_t[sl],
            t_min=1e-4, leaf_size=bvh.leaf_size)
        pw_, pb_ = np.asarray(pw), np.asarray(pb)
        hit_agree = ((pw_ >= 0) == (pb_ >= 0)).mean()
        hits = (pw_ >= 0) & (pb_ >= 0)
        t_ok = np.allclose(np.asarray(tw)[hits], np.asarray(tb_)[hits],
                           rtol=1e-4)
        print(f"  parity {name}: hit-mask agree {hit_agree:.4f}, "
              f"t allclose {t_ok}", flush=True)
        assert hit_agree > 0.9999 and t_ok, "bvh-worklist parity FAILED"


if __name__ == "__main__":
    main()
