"""Pallas blocked closest-hit kernel parity vs the brute-force oracle
(interpret mode on the CPU mesh; compiles for real on TPU under
SKYBOX_TEST_PLATFORM=axon)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.models import scenes
from skybox_rt_tpu.ops import pallas_rt
from skybox_rt_tpu.rt import intersect

INTERPRET = os.environ.get("SKYBOX_TEST_PLATFORM", "cpu") == "cpu"


def _rays(R, seed=3, aimed=True):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(R, 3)).astype(np.float32) * 3.0
    d = (-o if aimed else 0.0) + rng.normal(size=(R, 3)).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("R", [128, 1000])   # aligned + ragged batch
def test_pallas_rt_matches_bruteforce(R):
    verts, faces = scenes.icosphere(subdiv=2)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    o, d = _rays(R)
    p_b, t_b, u_b, v_b = intersect.closest_hit_bruteforce(o, d, *tri)
    p_p, t_p, u_p, v_p = pallas_rt.closest_hit_pallas(
        o, d, *tri, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_p))
    hits = np.asarray(p_b) >= 0
    assert hits.mean() > 0.9
    np.testing.assert_allclose(np.asarray(t_b)[hits], np.asarray(t_p)[hits],
                               rtol=1e-5)
    # barycentrics: f32 op-ordering noise between jnp.cross and the
    # per-component kernel math
    np.testing.assert_allclose(np.asarray(u_b)[hits], np.asarray(u_p)[hits],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_b)[hits], np.asarray(v_p)[hits],
                               atol=1e-5)


def test_pallas_rt_tmax_occlusion():
    verts, faces = scenes.icosphere(subdiv=1)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    o, d = _rays(512)
    occ_b = intersect.any_hit_bruteforce(o, d, *tri, t_max=2.0)
    occ_p = pallas_rt.any_hit_pallas(o, d, *tri, t_max=2.0,
                                     interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_p))


def test_pallas_rt_all_miss():
    verts, faces = scenes.icosphere(subdiv=1)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    o, d = _rays(256, aimed=False)
    # rays starting at |o| ~ 3 pointing randomly: mark the miss set
    p_b, _, _, _ = intersect.closest_hit_bruteforce(o, d, *tri)
    p_p, t_p, _, _ = pallas_rt.closest_hit_pallas(o, d, *tri,
                                                  interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_p))
    misses = np.asarray(p_p) < 0
    assert misses.any()
    assert np.all(np.isinf(np.asarray(t_p)[misses]))


def test_clustered_matches_bruteforce():
    """Cluster-culled kernel vs brute force: same hits, modulo exact-t ties
    (shared triangle edges can register equal-t hits whose winner depends
    on test order — both answers are valid intersections)."""
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scenes.icosphere(subdiv=3)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=64)

    o, d = _rays(2000, seed=5)
    p_b, t_b, u_b, v_b = intersect.closest_hit_bruteforce(o, d, *tri)
    p_c, t_c, u_c, v_c = pallas_rt.closest_hit_clustered(
        o, d, *tri, clusters, interpret=INTERPRET)

    p_b_, p_c_ = np.asarray(p_b), np.asarray(p_c)
    t_b_, t_c_ = np.asarray(t_b), np.asarray(t_c)
    same_hit = (p_b_ >= 0) == (p_c_ >= 0)
    assert same_hit.all()
    hits = p_b_ >= 0
    np.testing.assert_allclose(t_c_[hits], t_b_[hits], rtol=1e-5)
    diff = hits & (p_b_ != p_c_)
    # tie pixels only, and rare
    assert diff.mean() < 0.01
    np.testing.assert_allclose(t_c_[diff], t_b_[diff], rtol=1e-5)


def test_build_clusters_structure():
    from skybox_rt_tpu.models import scenes as scn
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scn.icosphere(subdiv=2)
    bvh = bvh_mod.build(verts, faces)
    cl = bvh_mod.build_clusters(bvh, max_tris=64)
    P = faces.shape[0]
    assert (cl["count"] <= 64).all() or (bvh.node_count > 64).any()
    # ranges tile [0, P) exactly
    spans = sorted(zip(cl["first"].tolist(), cl["count"].tolist()))
    pos = 0
    for f, c in spans:
        assert f == pos
        pos += c
    assert pos == P


def test_anyhit_clustered_matches_bruteforce():
    """Clustered occlusion kernel (per-tile early-out) vs brute force."""
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scenes.icosphere(subdiv=2)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=64)

    o, d = _rays(1500, seed=11)
    for t_max in (0.5, 2.0, 1e8):
        occ_b = intersect.any_hit_bruteforce(o, d, *tri, t_max=t_max)
        occ_c = pallas_rt.any_hit_clustered(o, d, *tri, clusters,
                                            t_max=t_max, interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_c))


def test_anyhit_clustered_per_ray_tmax():
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scenes.icosphere(subdiv=1)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=32)

    o, d = _rays(700, seed=13)
    rng = np.random.default_rng(17)
    tm = jnp.asarray(rng.uniform(0.1, 5.0, size=700).astype(np.float32))
    occ_b = intersect.any_hit_bruteforce(o, d, *tri, t_max=tm[:, None])
    occ_c = pallas_rt.any_hit_clustered(o, d, *tri, clusters, t_max=tm,
                                        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_c))


def test_streamed_matches_bruteforce():
    """HBM-streamed large-scene kernel vs brute force (small scene so the
    oracle is cheap; block gating exercised via the treelet order)."""
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scenes.icosphere(subdiv=3)      # 1280 tris, NB=3
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=64)

    o, d = _rays(1500, seed=21)
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri)
    p_s, t_s, _, _ = pallas_rt.closest_hit_streamed(
        o, d, *tri, order=clusters["order"], interpret=INTERPRET)
    p_b_, p_s_ = np.asarray(p_b), np.asarray(p_s)
    assert ((p_b_ >= 0) == (p_s_ >= 0)).all()
    hits = p_b_ >= 0
    np.testing.assert_allclose(np.asarray(t_s)[hits], np.asarray(t_b)[hits],
                               rtol=1e-5)
    diff = hits & (p_b_ != p_s_)
    assert diff.mean() < 0.01          # exact-t ties only
    np.testing.assert_allclose(np.asarray(t_s)[diff], np.asarray(t_b)[diff],
                               rtol=1e-5)


def test_streamed_no_order_and_tmax():
    verts, faces = scenes.icosphere(subdiv=1)      # 80 tris: single block,
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    o, d = _rays(300, seed=23)                     # heavy padding path
    tm = jnp.full((300,), 2.0, jnp.float32)
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri, t_max=2.0)
    p_s, t_s, _, _ = pallas_rt.closest_hit_streamed(o, d, *tri, t_max=tm,
                                                    interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_s))


def test_worklist_matches_bruteforce():
    """Worklist-driven large-scene kernel (in-kernel HBM DMA) vs brute
    force; treelet order exercises the compacted per-ray-block lists."""
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scenes.icosphere(subdiv=3)      # 1280 tris
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=64)

    o, d = _rays(1500, seed=21)
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri)
    p_w, t_w, _, _ = pallas_rt.closest_hit_worklist(
        o, d, *tri, order=clusters["order"], interpret=INTERPRET)
    p_b_, p_w_ = np.asarray(p_b), np.asarray(p_w)
    assert ((p_b_ >= 0) == (p_w_ >= 0)).all()
    hits = p_b_ >= 0
    np.testing.assert_allclose(np.asarray(t_w)[hits], np.asarray(t_b)[hits],
                               rtol=1e-5)
    diff = hits & (p_b_ != p_w_)
    assert diff.mean() < 0.01          # exact-t ties only
    np.testing.assert_allclose(np.asarray(t_w)[diff], np.asarray(t_b)[diff],
                               rtol=1e-5)


def test_worklist_no_order_and_tmax():
    verts, faces = scenes.icosphere(subdiv=1)      # 80 tris: single block,
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    o, d = _rays(300, seed=23)                     # heavy padding path
    tm = jnp.full((300,), 2.0, jnp.float32)
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri, t_max=2.0)
    p_w, t_w, _, _ = pallas_rt.closest_hit_worklist(o, d, *tri, t_max=tm,
                                                    interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_w))


def test_worklist_multiblock_small_block():
    """Force several triangle blocks (tri_block=512 floor) so the
    double-buffer loop runs multiple iterations per ray block."""
    from skybox_rt_tpu.rt import bvh as bvh_mod

    verts, faces = scenes.icosphere(subdiv=3)      # 1280 tris -> NB=3
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    clusters = bvh_mod.build_clusters(bvh, max_tris=64)
    o, d = _rays(900, seed=29)
    p_s, t_s, _, _ = pallas_rt.closest_hit_streamed(
        o, d, *tri, order=clusters["order"], interpret=INTERPRET)
    p_w, t_w, _, _ = pallas_rt.closest_hit_worklist(
        o, d, *tri, order=clusters["order"], interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(p_s), np.asarray(p_w))
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_w), rtol=1e-6)


def _bvh_blocks(verts, faces, tri_block=32):
    from skybox_rt_tpu.rt import bvh as bvh_mod

    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))
    bvh = bvh_mod.build(verts, faces)
    bs = bvh_mod.build_block_set(bvh, tri_block=tri_block)
    return tri, pallas_rt.prepare_bvh_blocks(*tri, bs), bs


def _multi_sphere(n=4, subdiv=2, seed=5):
    rng = np.random.default_rng(seed)
    vs, fs = [], []
    off = 0
    for i in range(n):
        v, f = scenes.icosphere(subdiv=subdiv,
                                radius=0.4 + 0.2 * rng.random())
        v = v + rng.normal(size=(1, 3)) * 1.2
        vs.append(v.astype(np.float32))
        fs.append(f + off)
        off += v.shape[0]
    v = np.concatenate(vs)
    return (v - v.mean(0, keepdims=True)).astype(np.float32), \
        np.concatenate(fs).astype(np.int64)


def test_bvh_worklist_matches_bruteforce():
    """Hierarchical (BVH-treelet) worklist kernel vs brute force on a
    multi-object scene with many small blocks (tri_block=32 -> dozens of
    blocks, several DMA iterations per ray block)."""
    verts, faces = _multi_sphere(n=4, subdiv=2)       # 1280 tris
    tri, blocks, _ = _bvh_blocks(verts, faces, tri_block=32)
    o, d = _rays(1500, seed=31)
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri)
    p_w, t_w, _, _ = pallas_rt.closest_hit_bvh(o, d, blocks,
                                               interpret=INTERPRET)
    p_b_, p_w_ = np.asarray(p_b), np.asarray(p_w)
    assert ((p_b_ >= 0) == (p_w_ >= 0)).all()
    hits = p_b_ >= 0
    assert hits.mean() > 0.2
    np.testing.assert_allclose(np.asarray(t_w)[hits], np.asarray(t_b)[hits],
                               rtol=1e-5)
    diff = hits & (p_b_ != p_w_)
    assert diff.mean() < 0.01          # exact-t ties only
    np.testing.assert_allclose(np.asarray(t_w)[diff], np.asarray(t_b)[diff],
                               rtol=1e-5)


def test_bvh_worklist_level_fallback():
    """Incoherent ray bundles activate more blocks than the L-entry table
    holds, forcing coarser 8^l range entries — parity must hold through
    the fallback (L=64 with ~80 blocks active per bundle)."""
    verts, faces = _multi_sphere(n=6, subdiv=2, seed=11)   # 1920 tris
    tri, blocks, bs = _bvh_blocks(verts, faces, tri_block=16)
    assert bs["num_blocks"] > 64                # level-0 can overflow L
    assert len(bs["aabb_levels"]) >= 2
    o, d = _rays(1200, seed=37)                 # random -> huge cone
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri)
    p_w, t_w, _, _ = pallas_rt.closest_hit_bvh(o, d, blocks, L=64,
                                               interpret=INTERPRET)
    p_b_, p_w_ = np.asarray(p_b), np.asarray(p_w)
    assert ((p_b_ >= 0) == (p_w_ >= 0)).all()
    hits = p_b_ >= 0
    np.testing.assert_allclose(np.asarray(t_w)[hits], np.asarray(t_b)[hits],
                               rtol=1e-5)


def test_bvh_worklist_tmax_and_parked():
    """Per-ray t_max plus parked dead rays (origin 3e7, the bounce
    re-compaction convention): parked rays must neither hit nor blow up
    the conservative ray-block bounds for live rays in the same block."""
    verts, faces = _multi_sphere(n=3, subdiv=2, seed=13)
    tri, blocks, _ = _bvh_blocks(verts, faces, tri_block=32)
    o, d = _rays(600, seed=41)
    o_np, d_np = np.array(o), np.array(d)
    park = np.arange(600) % 3 == 0              # interleave parked rays
    o_np[park] = 3e7
    d_np[park] = 0.57735
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    tm = jnp.full((600,), 2.5, jnp.float32)
    p_b, t_b, _, _ = intersect.closest_hit_bruteforce(o, d, *tri, t_max=2.5)
    p_w, t_w, _, _ = pallas_rt.closest_hit_bvh(o, d, blocks, t_max=tm,
                                               interpret=INTERPRET)
    p_b_, p_w_ = np.asarray(p_b), np.asarray(p_w)
    assert (p_w_[park] < 0).all()
    assert ((p_b_ >= 0) == (p_w_ >= 0)).all()
    hits = p_b_ >= 0
    np.testing.assert_allclose(np.asarray(t_w)[hits], np.asarray(t_b)[hits],
                               rtol=1e-5)


def test_bvh_worklist_id_order_parity():
    """front_to_back=False (id-order entries) is exact too."""
    verts, faces = _multi_sphere(n=3, subdiv=2, seed=17)
    tri, blocks, _ = _bvh_blocks(verts, faces, tri_block=32)
    o, d = _rays(500, seed=43)
    p_f, t_f, _, _ = pallas_rt.closest_hit_bvh(o, d, blocks,
                                               interpret=INTERPRET)
    p_i, t_i, _, _ = pallas_rt.closest_hit_bvh(o, d, blocks,
                                               front_to_back=False,
                                               interpret=INTERPRET)
    p_b, _, _, _ = intersect.closest_hit_bruteforce(o, d, *tri)
    hits = np.asarray(p_b) >= 0
    assert ((np.asarray(p_f) >= 0) == hits).all()
    assert ((np.asarray(p_i) >= 0) == hits).all()
    np.testing.assert_allclose(np.asarray(t_f)[hits], np.asarray(t_i)[hits],
                               rtol=1e-6)


def test_bvh_anyhit_matches_bruteforce():
    """any_hit_bvh (collapsed-window early-out) vs the brute-force
    occlusion oracle, scalar and per-ray t_max, incl. parked rays."""
    verts, faces = _multi_sphere(n=4, subdiv=2, seed=19)
    tri, blocks, _ = _bvh_blocks(verts, faces, tri_block=32)
    o, d = _rays(900, seed=47)
    occ_b = intersect.any_hit_bruteforce(o, d, *tri, t_max=2.0)
    occ_w = pallas_rt.any_hit_bvh(o, d, blocks, t_max=2.0,
                                  interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_w))
    # per-ray t_max + parked rays
    o_np, d_np = np.array(o), np.array(d)
    park = np.arange(900) % 4 == 0
    o_np[park] = 3e7
    d_np[park] = 0.57735
    o2, d2 = jnp.asarray(o_np), jnp.asarray(d_np)
    tm = jnp.asarray((np.arange(900) % 3 + 1).astype(np.float32))
    occ_b2 = intersect.any_hit_bruteforce(o2, d2, *tri, t_max=tm[:, None])
    occ_w2 = pallas_rt.any_hit_bvh(o2, d2, blocks, t_max=tm,
                                   interpret=INTERPRET)
    assert not np.asarray(occ_w2)[park].any()
    np.testing.assert_array_equal(np.asarray(occ_b2), np.asarray(occ_w2))


def test_bvh_early_exit_parity_depth_stacked():
    """Front-to-back early exit (round 5): a depth-stacked scene whose
    rays see MANY active blocks (mean >> 2, so the prepass picks
    entry-distance order and emits real etn keys) must return the exact
    brute-force winner — the exit may only skip provably-occluded
    tails."""
    import jax.numpy as jnp

    from skybox_rt_tpu.models import scenes as scn
    from skybox_rt_tpu.rt import bvh as bvh_mod
    from skybox_rt_tpu.rt import intersect

    rng = np.random.default_rng(7)
    vs, fs = [], []
    # 12 icospheres stacked along +z: every ray crosses many treelets
    for i in range(12):
        v, f = scn.icosphere(subdiv=2, radius=0.8)
        v = v + np.asarray([0.0, 0.0, 2.0 * i], np.float32)
        fs.append(f + sum(x.shape[0] for x in vs))
        vs.append(v)
    verts = np.concatenate(vs).astype(np.float32)
    faces = np.concatenate(fs).astype(np.int64)
    tri = intersect.triangle_arrays(jnp.asarray(verts), jnp.asarray(faces))

    bvh = bvh_mod.build_sah(verts, faces)
    bs = bvh_mod.build_block_set(bvh, tri_block=64)
    blocks = pallas_rt.prepare_bvh_blocks(*tri, bs)

    R = 4096
    o = np.zeros((R, 3), np.float32)
    o[:, 0] = rng.uniform(-0.7, 0.7, R)
    o[:, 1] = rng.uniform(-0.7, 0.7, R)
    o[:, 2] = -3.0
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    d[:, 0] += rng.uniform(-0.05, 0.05, R).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    prim, t, u, v = pallas_rt.closest_hit_bvh(
        jnp.asarray(o), jnp.asarray(d), blocks, sub=2, interpret=True)
    p_ref, t_ref, _, _ = intersect.closest_hit_bruteforce(
        jnp.asarray(o), jnp.asarray(d), *tri, t_min=1e-4)
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(p_ref))
    hits = np.asarray(p_ref) >= 0
    assert hits.mean() > 0.8          # the scene really is depth-stacked
    np.testing.assert_allclose(np.asarray(t)[hits],
                               np.asarray(t_ref)[hits], rtol=1e-5)
