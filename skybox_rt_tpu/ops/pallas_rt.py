"""Pallas TPU ray-tracing kernel — blocked closest-hit (SURVEY §7 step 5).

Measured on-chip (v5e), the XLA formulations of closest-hit are both wrong
for the hardware: per-ray BVH traversal is gather-bound (~0.1 M rays/s),
and all-pairs brute force materializes (R, P) intermediates in HBM
(~3 M rays/s, OOM at 1M rays).  This kernel is the flash-attention-style
reformulation: stream triangle blocks through VMEM against a resident ray
block, keeping the running (best_t, best_prim, u, v) in registers — zero
HBM intermediates, dense VPU math, no gathers.

Layout:
  rays      (G, 8, 128) per component — 1024 rays per grid program
            (one native (8, 128) VPU tile; G = ceil(R/1024))
  triangles (Pp, 16) f32 records      — [v0.xyz e1.xyz e2.xyz pad...]
            rows; the inner loop splat-broadcasts one triangle per step
            against the whole ray tile

Whole-array VMEM residency bounds the scene at roughly P <= 15k triangles
(records pad to 128 lanes); larger scenes use the BVH paths (rt.bvh).
Ties resolve to the lowest prim id (strict-< accumulation in ascending
prim order) — identical to brute-force argmin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

LANES = 128
TRI_SUB = 8          # triangles per inner step (sublane dim)
EPS = 1e-9           # intersect.py MT epsilon


def _pad_to(x, m, axis=0, fill=0.0):
    n = x.shape[axis]
    target = -(-n // m) * m
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad, constant_values=fill)


def _mt_one(ox, oy, oz, dx, dy, dz, rec, t_min, best_t):
    """One-triangle Möller–Trumbore splat against a ray tile
    (intersect.py semantics).  rec: (16,) record row.
    Returns (hit, t, u, v) with hit already bounded by (t_min, best_t)."""
    v0x, v0y, v0z = rec[0], rec[1], rec[2]
    e1x, e1y, e1z = rec[3], rec[4], rec[5]
    e2x, e2y, e2z = rec[6], rec[7], rec[8]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    valid = jnp.abs(det) > EPS
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t < best_t))
    return hit, t, u, v


def _pack_rays(orig, direction, sub: int = 1):
    """(R, 3) rays -> six (G, sub*8, 128) component arrays + (R, Rp, G).
    sub > 1 packs several native (8, 128) subtiles per grid block."""
    R = orig.shape[0]
    BLK = sub * 8 * LANES
    Rp = -(-R // BLK) * BLK
    G = Rp // BLK

    def comp(x, k):
        return _pad_to(x[:, k], BLK).reshape(G, sub * 8, LANES)

    rays = [comp(orig, 0), comp(orig, 1), comp(orig, 2),
            comp(direction, 0), comp(direction, 1), comp(direction, 2)]
    return rays, R, Rp, G


def _pack_tris(v0, e1, e2, order=None):
    """(P, 3) triangle arrays -> (Pp, 16) records (optionally reordered)."""
    tri = jnp.stack([v0[:, 0], v0[:, 1], v0[:, 2],
                     e1[:, 0], e1[:, 1], e1[:, 2],
                     e2[:, 0], e2[:, 1], e2[:, 2]], 1)       # (P, 9)
    if order is not None:
        tri = tri[order]
    tri = jnp.pad(tri, ((0, 0), (0, 16 - 9)))
    return _pad_to(tri, TRI_SUB, axis=0)                     # (Pp, 16)


def _pack_tmax(t_max, G, sub: int = 1):
    if t_max is None:
        return jnp.full((G, sub * 8, LANES), jnp.inf, F32)
    # padded rays get t_max = -inf so they can never hit
    return _pad_to(jnp.asarray(t_max, F32), sub * 8 * LANES,
                   fill=-jnp.inf).reshape(G, sub * 8, LANES)


def _make_kernel(num_tri_steps: int, t_min: float):
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tri_ref,          # (Pp, 16) triangle records
               tmax_ref,
               bt_ref, bp_ref, bu_ref, bv_ref):
        # 1024 rays per program as one native (8, 128) tile; one triangle
        # per step splat against the whole tile.  (Wider designs — 8-tri
        # record tiles with slice broadcasts, or per-row (8 tri x 128 ray)
        # blocking — compile pathologically in Mosaic today; this shape
        # compiles in ~30 s and runs ~2x the XLA brute-force path.)
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]

        def step(j, carry):
            best_t, best_p, best_u, best_v = carry
            hit, t, u, v = _mt_one(ox, oy, oz, dx, dy, dz, tri_ref[j],
                                   t_min, best_t)
            best_p = jnp.where(hit, j, best_p)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
            best_t = jnp.where(hit, t, best_t)
            return best_t, best_p, best_u, best_v

        carry = (tmax_ref[0], jnp.full(ox.shape, -1, I32),
                 jnp.zeros(ox.shape, F32), jnp.zeros(ox.shape, F32))
        best_t, best_p, best_u, best_v = jax.lax.fori_loop(
            0, num_tri_steps, step, carry)

        bt_ref[0] = best_t
        bp_ref[0] = best_p
        bu_ref[0] = best_u
        bv_ref[0] = best_v

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def closest_hit_pallas(orig, direction, v0, e1, e2, t_max=None,
                       t_min: float = 1e-4, interpret: bool = False):
    """Blocked closest hit.  orig/direction (R, 3); v0/e1/e2 (P, 3).
    t_max: optional (R,) per-ray upper bound (default +inf).
    Returns (prim (R,) i32 [-1 miss], t, u, v), matching
    intersect.closest_hit_bruteforce (see tie-break note above)."""
    P = v0.shape[0]
    rays, R, Rp, G = _pack_rays(orig, direction)
    tri = _pack_tris(v0, e1, e2)
    Pp = tri.shape[0]
    tmax_arr = _pack_tmax(t_max, G)

    kernel = _make_kernel(P, t_min)      # loop real prims only
    ray_spec = pl.BlockSpec((1, 8, LANES), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    bt, bp, bu, bv = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec((Pp, 16), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec,
        ],
        out_specs=(ray_spec,) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((G, 8, LANES), F32),
            jax.ShapeDtypeStruct((G, 8, LANES), I32),
            jax.ShapeDtypeStruct((G, 8, LANES), F32),
            jax.ShapeDtypeStruct((G, 8, LANES), F32),
        ),
        interpret=interpret,
    )(*rays, tri, tmax_arr)

    prim = bp.reshape(Rp)[:R]
    # padded tri rows are all-zero => det == 0 => never valid
    miss = (prim < 0) | (prim >= P)
    prim = jnp.where(miss, jnp.int32(-1), prim)
    t = jnp.where(miss, jnp.inf, bt.reshape(Rp)[:R])
    u = jnp.where(miss, 0.0, bu.reshape(Rp)[:R])
    v = jnp.where(miss, 0.0, bv.reshape(Rp)[:R])
    return prim, t, u, v


def _mt_update(ox, oy, oz, dx, dy, dz, rec, slot, t_min,
               st_ref, sp_ref, su_ref, sv_ref):
    """_mt_one with running-best update into the scratch refs."""
    best_t = st_ref[:]
    hit, t, u, v = _mt_one(ox, oy, oz, dx, dy, dz, rec, t_min, best_t)
    st_ref[:] = jnp.where(hit, t, best_t)
    sp_ref[:] = jnp.where(hit, slot, sp_ref[:])
    su_ref[:] = jnp.where(hit, u, su_ref[:])
    sv_ref[:] = jnp.where(hit, v, sv_ref[:])


def _inv_dir(d):
    safe = jnp.abs(d) > 1e-12
    return jnp.where(safe, 1.0 / jnp.where(safe, d, 1.0), 1e30)


def _slab(ca_ref, c, ox, oy, oz, inv_dx, inv_dy, inv_dz, far):
    """Cluster-AABB slab test vs the whole ray tile (SMEM scalars).
    Returns (tn, tf) with tf already clipped to `far`."""
    t0x = (ca_ref[c, 0] - ox) * inv_dx
    t1x = (ca_ref[c, 3] - ox) * inv_dx
    t0y = (ca_ref[c, 1] - oy) * inv_dy
    t1y = (ca_ref[c, 4] - oy) * inv_dy
    t0z = (ca_ref[c, 2] - oz) * inv_dz
    t1z = (ca_ref[c, 5] - oz) * inv_dz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), far))
    return tn, tf


def _make_clustered_kernel(num_clusters: int, t_min: float):
    def kernel(perm_ref, oct_ref, cf_ref, cc_ref, ca_ref,  # SMEM prefetch
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tri_ref, tmax_ref,
               bt_ref, bp_ref, bu_ref, bv_ref,
               st_ref, sp_ref, su_ref, sv_ref):   # VMEM scratch
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]

        st_ref[:] = tmax_ref[0]
        sp_ref[:] = jnp.full(ox.shape, -1, I32)
        su_ref[:] = jnp.zeros(ox.shape, F32)
        sv_ref[:] = jnp.zeros(ox.shape, F32)

        inv_dx = _inv_dir(dx)
        inv_dy = _inv_dir(dy)
        inv_dz = _inv_dir(dz)
        # front-to-back cluster visitation for this block's direction
        # octant: best_t shrinks early, so the slab far-bound prunes the
        # far clusters without touching their triangles
        oct = oct_ref[pl.program_id(0)]

        def cstep(k, _):
            c = perm_ref[oct, k]
            tn, tf = _slab(ca_ref, c, ox, oy, oz,
                           inv_dx, inv_dy, inv_dz, st_ref[:])
            any_hit = jnp.any(tn <= tf)

            @pl.when(any_hit)
            def _():
                first = cf_ref[c]

                def tstep(k, _):
                    slot = first + k
                    _mt_update(ox, oy, oz, dx, dy, dz, tri_ref[slot],
                               slot, t_min, st_ref, sp_ref, su_ref, sv_ref)
                    return 0

                jax.lax.fori_loop(0, cc_ref[c], tstep, 0)
            return 0

        jax.lax.fori_loop(0, num_clusters, cstep, 0)

        bt_ref[0] = st_ref[:]
        bp_ref[0] = sp_ref[:]
        bu_ref[0] = su_ref[:]
        bv_ref[0] = sv_ref[:]

    return kernel


def _octant_perms(cl_aabb):
    """(8, C) i32: cluster visit order per direction octant — ascending
    centroid projection along the octant's sign vector = near-to-far."""
    cen = (cl_aabb[:, 0:3] + cl_aabb[:, 3:6]) * 0.5        # (C, 3)
    signs = jnp.asarray([[1 if o & (1 << k) else -1 for k in range(3)]
                         for o in range(8)], F32)           # (8, 3)
    keys = signs @ cen.T                                    # (8, C)
    return jnp.argsort(keys, axis=1).astype(jnp.int32)


def _block_octants(rays):
    """(G,) i32 dominant direction octant per 1024-ray block
    (bit k set <=> mean d[k] > 0)."""
    dx, dy, dz = rays[3], rays[4], rays[5]                  # (G, 8, 128)
    oct = ((jnp.sum(dx, (1, 2)) > 0).astype(jnp.int32)
           | ((jnp.sum(dy, (1, 2)) > 0).astype(jnp.int32) << 1)
           | ((jnp.sum(dz, (1, 2)) > 0).astype(jnp.int32) << 2))
    return oct


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def _clustered_call(rays, tri, tmax_arr, cl_first, cl_count, cl_aabb,
                    t_min, interpret):
    G = rays[0].shape[0]
    Pp = tri.shape[0]
    C = cl_first.shape[0]
    perm = _octant_perms(cl_aabb)
    octs = _block_octants(rays)
    kernel = _make_clustered_kernel(C, t_min)
    ray_spec = pl.BlockSpec((1, 8, LANES), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,           # perm, oct, first, count, aabb
        grid=(G,),
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec((Pp, 16), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec,
        ],
        out_specs=(ray_spec,) * 4,
        scratch_shapes=[pltpu.VMEM((8, LANES), F32),
                        pltpu.VMEM((8, LANES), I32),
                        pltpu.VMEM((8, LANES), F32),
                        pltpu.VMEM((8, LANES), F32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, 8, LANES), F32),
            jax.ShapeDtypeStruct((G, 8, LANES), I32),
            jax.ShapeDtypeStruct((G, 8, LANES), F32),
            jax.ShapeDtypeStruct((G, 8, LANES), F32),
        ),
        interpret=interpret,
    )(perm, octs, cl_first, cl_count, cl_aabb, *rays, tri, tmax_arr)


def closest_hit_clustered(orig, direction, v0, e1, e2, clusters,
                          t_max=None, t_min: float = 1e-4,
                          interpret: bool = False):
    """Cluster-culled closest hit: BVH treelets (rt.bvh.build_clusters)
    gate whole triangle ranges behind a per-ray-block AABB test with a
    whole-tile skip — the algorithmic lever the flat kernel lacks.
    Clusters are visited front-to-back per ray-block direction octant so
    best_t tightens early and the slab far-bound prunes far clusters.
    Ray blocks should be spatially coherent (camera tiles or
    rt.wavefront-sorted) for the skips to fire.

    clusters: dict from rt.bvh.build_clusters.
    Returns (prim (R,) i32 in ORIGINAL prim ids, t, u, v).  Exact-tie
    winners (two prims at identical t) follow visit order, which is
    octant-dependent — unlike the flat kernel's lowest-prim-id rule."""
    P = v0.shape[0]
    rays, R, Rp, G = _pack_rays(orig, direction)
    order = jnp.asarray(clusters["order"])
    tri = _pack_tris(v0, e1, e2, order=order)     # treelet-contiguous
    tmax_arr = _pack_tmax(t_max, G)

    bt, bp, bu, bv = _clustered_call(
        rays, tri, tmax_arr,
        jnp.asarray(clusters["first"], jnp.int32),
        jnp.asarray(clusters["count"], jnp.int32),
        jnp.asarray(clusters["aabb"], F32),
        t_min, interpret)

    slot = bp.reshape(Rp)[:R]
    miss = (slot < 0) | (slot >= P)
    prim = jnp.where(miss, jnp.int32(-1),
                     order[jnp.clip(slot, 0, P - 1)])
    t = jnp.where(miss, jnp.inf, bt.reshape(Rp)[:R])
    u = jnp.where(miss, 0.0, bu.reshape(Rp)[:R])
    v = jnp.where(miss, 0.0, bv.reshape(Rp)[:R])
    return prim, t, u, v


TRI_BLOCK = 512      # triangles per streamed HBM->VMEM block


def _make_streamed_kernel(t_min: float, tri_block: int, sub: int):
    def kernel(bi_ref, bc_ref, ba_ref,            # SMEM prefetch:
               # bi (G, NB) compacted active block ids, bc (G,) counts,
               # ba (NB, 8) block AABBs
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tri_ref,                           # (tri_block, 16) VMEM
               tmax_ref,
               bt_ref, bp_ref, bu_ref, bv_ref):
        g = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            bt_ref[0] = tmax_ref[0]
            bp_ref[0] = jnp.full(bt_ref.shape[1:], -1, I32)
            bu_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)
            bv_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)

        # compacted-list gate: steps beyond this ray block's active count
        # cost one scalar compare (the XLA pre-pass already proved no ray
        # in the block touches any remaining triangle block)
        @pl.when(k < bc_ref[g])
        def _active():
            nb = bi_ref[g, k]
            base = nb * tri_block

            # several native (8, 128) ray subtiles per grid step: fewer
            # grid steps (each costs ~10 us fixed — PERF.md), while the
            # slab gate stays per-subtile
            def sub_body(s, _):
                r = pl.ds(s * 8, 8)
                ox = ox_ref[0, r]
                oy = oy_ref[0, r]
                oz = oz_ref[0, r]
                dx = dx_ref[0, r]
                dy = dy_ref[0, r]
                dz = dz_ref[0, r]

                # in-kernel slab re-test: the pre-pass can't know best_t,
                # so this prunes blocks behind already-found hits
                tn, tf = _slab(ba_ref, nb, ox, oy, oz,
                               _inv_dir(dx), _inv_dir(dy), _inv_dir(dz),
                               bt_ref[0, r])

                @pl.when(jnp.any(tn <= tf))
                def _():
                    def step(j, _):
                        best_t = bt_ref[0, r]
                        hit, t, u, v = _mt_one(ox, oy, oz, dx, dy, dz,
                                               tri_ref[j], t_min, best_t)
                        bt_ref[0, r] = jnp.where(hit, t, best_t)
                        bp_ref[0, r] = jnp.where(hit, base + j,
                                                 bp_ref[0, r])
                        bu_ref[0, r] = jnp.where(hit, u, bu_ref[0, r])
                        bv_ref[0, r] = jnp.where(hit, v, bv_ref[0, r])
                        return 0

                    jax.lax.fori_loop(0, tri_block, step, 0)
                return 0

            jax.lax.fori_loop(0, sub, sub_body, 0)

    return kernel


def _active_block_lists(rays, blk_aabb, tmax_arr, front_to_back=True):
    """XLA pre-pass: exact per-ray slab tests, any-reduced per 1024-ray
    block -> (blkidx (G, NB) i32 active ids compacted to the front IN
    FRONT-TO-BACK ORDER, blkcnt (G,) i32).  Chunked over NB to bound the
    (G, chunk, 8, 128) temporaries.

    Front-to-back: active blocks are ordered by their minimum slab entry
    distance over the ray block, so the worklist kernel's running-best_t
    slab re-test (the analog of the raster unit's extent reject,
    graphics.cpp:743-797) prunes occluded blocks — the dominant cost in
    multi-object scenes, where most of a ray block's active blocks lie
    behind the nearest hit."""
    ox, oy, oz, dx, dy, dz = rays
    G = ox.shape[0]
    NB = blk_aabb.shape[0]
    inv_dx = _inv_dir(dx)[:, None]        # (G, 1, 8, 128)
    inv_dy = _inv_dir(dy)[:, None]
    inv_dz = _inv_dir(dz)[:, None]
    oxb, oyb, ozb = ox[:, None], oy[:, None], oz[:, None]
    far = tmax_arr[:, None]
    INF = jnp.float32(float("inf"))

    def chunk(a):                         # a: (nc, 8) AABBs
        lox = a[None, :, 0, None, None]
        loy = a[None, :, 1, None, None]
        loz = a[None, :, 2, None, None]
        hix = a[None, :, 3, None, None]
        hiy = a[None, :, 4, None, None]
        hiz = a[None, :, 5, None, None]
        t0x = (lox - oxb) * inv_dx
        t1x = (hix - oxb) * inv_dx
        t0y = (loy - oyb) * inv_dy
        t1y = (hiy - oyb) * inv_dy
        t0z = (loz - ozb) * inv_dz
        t1z = (hiz - ozb) * inv_dz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), far))
        hit = tn <= tf
        # per-(ray block, tri block): any hit + nearest entry distance
        tn_min = jnp.min(jnp.where(hit, tn, INF), axis=(2, 3))  # (G, nc)
        return jnp.any(hit, axis=(2, 3)), tn_min

    CH = 32
    NBp = -(-NB // CH) * CH
    aabb_p = jnp.pad(blk_aabb, ((0, NBp - NB), (0, 0)))
    act, tnm = jax.lax.map(chunk, aabb_p.reshape(NBp // CH, CH, 8))
    active = jnp.moveaxis(act, 1, 0).reshape(G, NBp)[:, :NB]
    tn_min = jnp.moveaxis(tnm, 1, 0).reshape(G, NBp)[:, :NB]
    if front_to_back:
        # sort by (inactive, entry distance): active ids first, near-to-far
        key = jnp.where(active, tn_min, INF)
        blkidx = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    else:
        # active ids first in ascending block id (round-2 behavior)
        blkidx = jnp.argsort(~active, axis=1, stable=True).astype(jnp.int32)
    blkcnt = jnp.sum(active, axis=1).astype(jnp.int32)
    return blkidx, blkcnt


@functools.partial(jax.jit, static_argnames=("t_min", "tri_block", "sub",
                                             "interpret"))
def _streamed_call(rays, tri, tmax_arr, blk_aabb, t_min, tri_block, sub,
                   interpret):
    G = rays[0].shape[0]
    NB = blk_aabb.shape[0]
    blkidx, blkcnt = _active_block_lists(rays, blk_aabb, tmax_arr)
    kernel = _make_streamed_kernel(t_min, tri_block, sub)
    ray_spec = pl.BlockSpec((1, sub * 8, LANES), lambda g, k, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,               # blkidx, blkcnt, aabbs (SMEM)
        grid=(G, NB),                        # k fastest: output revisiting
        in_specs=[ray_spec] * 6 + [
            # the DMA follows the compacted list: only active blocks (and
            # the repeated last-active block for gated-off steps) stream in
            pl.BlockSpec(
                (tri_block, 16),
                lambda g, k, bi, bc, ba: (bi[g, jnp.minimum(k, bc[g])], 0),
                memory_space=pltpu.VMEM),
            ray_spec,
        ],
        out_specs=(ray_spec,) * 4,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), I32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(blkidx, blkcnt, blk_aabb, *rays, tri, tmax_arr)


def _block_aabbs(tri, tri_block):
    """(Pp, 16) records -> (NB, 8) [min.xyz max.xyz 0 0] per block.
    Zero padding rows are degenerate points at the origin; pad with the
    first real vertex instead so they never widen the box."""
    Pp = tri.shape[0]
    NB = Pp // tri_block
    v0 = tri[:, 0:3]
    v1 = v0 + tri[:, 3:6]
    v2 = v0 + tri[:, 6:9]
    pts = jnp.stack([v0, v1, v2], 1).reshape(NB, tri_block * 3, 3)
    lo = jnp.min(pts, axis=1)
    hi = jnp.max(pts, axis=1)
    return jnp.concatenate([lo, hi, jnp.zeros((NB, 2), F32)], 1)


def closest_hit_streamed(orig, direction, v0, e1, e2, order=None,
                         t_max=None, t_min: float = 1e-4,
                         tri_block: int = TRI_BLOCK, sub: int = 4,
                         interpret: bool = False):
    """Large-scene closest hit: triangle blocks are PIPELINED from HBM
    through VMEM over a second grid axis (flash-attention-style streaming),
    so the scene is NOT VMEM-resident — scales to ~1M triangles where
    closest_hit_pallas/_clustered cap at ~15k.  Per-block AABBs (SMEM)
    gate the intersection loop; pass `order` (e.g. rt.bvh.build_clusters'
    Morton/treelet order) so blocks are spatially tight and the gates fire.

    Returns (prim (R,) i32 in ORIGINAL ids, t, u, v)."""
    P = v0.shape[0]
    rays, R, Rp, G = _pack_rays(orig, direction, sub=sub)
    order = None if order is None else jnp.asarray(order)
    tri = _pack_tris(v0, e1, e2, order=order)
    # cap the block count: the (G, NB) compacted-list table lives in SMEM
    # (~1 MB total) and every grid step costs ~10 us of fixed overhead
    # (measured; see PERF.md), so huge scenes take coarser blocks rather
    # than more of them
    NB_MAX = 64
    needed = -(-tri.shape[0] // NB_MAX)           # ceil(Pp / NB_MAX)
    tri_block = max(tri_block, -(-needed // 512) * 512)
    # pad rows to a tri_block multiple with copies of row 0 shifted to the
    # first real vertex (degenerate => det 0, and AABB-neutral)
    Pp0 = tri.shape[0]
    if Pp0 % tri_block:
        padn = tri_block - Pp0 % tri_block
        padrow = jnp.zeros((padn, 16), F32).at[:, 0:3].set(tri[0, 0:3])
        tri = jnp.concatenate([tri, padrow], 0)
    else:
        # TRI_SUB padding rows from _pack_tris are all-zero: make them
        # AABB-neutral too
        pass
    nzpad = tri.shape[0] - P
    if nzpad:
        fix = jnp.broadcast_to(tri[0, 0:3], (nzpad, 3))
        tri = tri.at[P:, 0:3].set(fix)
    tmax_arr = _pack_tmax(t_max, G, sub=sub)
    blk_aabb = _block_aabbs(tri, tri_block)

    bt, bp, bu, bv = _streamed_call(rays, tri, tmax_arr, blk_aabb,
                                    t_min, tri_block, sub, interpret)

    slot = bp.reshape(Rp)[:R]
    miss = (slot < 0) | (slot >= P)
    if order is None:
        prim = jnp.where(miss, jnp.int32(-1), slot)
    else:
        prim = jnp.where(miss, jnp.int32(-1),
                         order[jnp.clip(slot, 0, P - 1)])
    t = jnp.where(miss, jnp.inf, bt.reshape(Rp)[:R])
    u = jnp.where(miss, 0.0, bu.reshape(Rp)[:R])
    v = jnp.where(miss, 0.0, bv.reshape(Rp)[:R])
    return prim, t, u, v


# ---------------------------------------------------------------------------
# Worklist-driven large-scene closest hit.
#
# The streamed kernel above pays ~10 us of fixed cost per grid step over a
# DENSE (G, NB) grid, so even fully-gated-off steps dominate at large NB
# (PERF.md: 0.8 Mrays/s @82k tris).  This kernel's grid is over ray blocks
# ONLY; each program walks its own compacted active-block worklist with
# in-kernel double-buffered HBM->VMEM DMA of the triangle blocks, so cost
# scales with ACTIVE (ray block, tri block) pairs and the per-block step is
# a cheap fori iteration instead of a grid step.  Plays the role of the
# reference's per-unit tile worklist (raster_unit.cpp:221-227: each unit
# drains only the tiles assigned to it).
# ---------------------------------------------------------------------------


def _make_worklist_kernel(t_min: float, tri_block: int, sub: int):
    def kernel(bi_ref, bc_ref, ba_ref,            # scalar prefetch (SMEM)
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmax_ref,                          # VMEM ray tiles
               tri_hbm,                           # (Pp, 128) resident in HBM
               bt_ref, bp_ref, bu_ref, bv_ref,    # outs (1, sub*8, 128)
               tri_vmem, sem):                    # scratch: (2, TB, 128) + DMA
        g = pl.program_id(0)
        cnt = bc_ref[g]
        bt_ref[0] = tmax_ref[0]
        bp_ref[0] = jnp.full(bt_ref.shape[1:], -1, I32)
        bu_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)
        bv_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)

        def get_dma(slot, i):
            nb = bi_ref[g, i]
            return pltpu.make_async_copy(
                tri_hbm.at[pl.ds(nb * tri_block, tri_block), :],
                tri_vmem.at[slot],
                sem.at[slot])

        @pl.when(cnt > 0)
        def _warm():
            get_dma(0, 0).start()

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            # overlap: next block's DMA in flight while this one computes
            @pl.when(i + 1 < cnt)
            def _next():
                get_dma(1 - slot, i + 1).start()

            get_dma(slot, i).wait()
            nb = bi_ref[g, i]
            base = nb * tri_block
            trs = tri_vmem.at[slot]

            # the whole (sub*8, 128) ray tile advances per triangle step:
            # the single-tri splat loop is loop-overhead-bound at (8, 128)
            # (measured ~146 ns/step regardless of tile height — the 6 G
            # tests/s ceiling in PERF.md), so 4x the vector work per step
            # amortizes the scalar loads and loop bookkeeping 4x
            ox = ox_ref[0]
            oy = oy_ref[0]
            oz = oz_ref[0]
            dx = dx_ref[0]
            dy = dy_ref[0]
            dz = dz_ref[0]

            # slab re-test vs the running best_t: the pre-pass used the
            # static t_max, so this prunes blocks behind hits already
            # found earlier in the worklist
            tn, tf = _slab(ba_ref, nb, ox, oy, oz,
                           _inv_dir(dx), _inv_dir(dy), _inv_dir(dz),
                           bt_ref[0])

            @pl.when(jnp.any(tn <= tf))
            def _():
                # 8-way unrolled single-tri splats: cuts the loop
                # bookkeeping that bounds the 6 G tests/s ceiling
                # (2-way 1.4-1.5x, 4-way another ~1.3x measured)
                def step(h, _):
                    for s in range(8):
                        j = h * 8 + s
                        best_t = bt_ref[0]
                        hit, t, u, v = _mt_one(ox, oy, oz, dx, dy, dz,
                                               trs[j], t_min, best_t)
                        bt_ref[0] = jnp.where(hit, t, best_t)
                        bp_ref[0] = jnp.where(hit, base + j, bp_ref[0])
                        bu_ref[0] = jnp.where(hit, u, bu_ref[0])
                        bv_ref[0] = jnp.where(hit, v, bv_ref[0])
                    return 0

                jax.lax.fori_loop(0, tri_block // 8, step, 0)
            return 0

        jax.lax.fori_loop(0, cnt, loop, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "tri_block", "sub",
                                             "interpret", "front_to_back"))
def _worklist_call(rays, tri, tmax_arr, blk_aabb, t_min, tri_block, sub,
                   interpret, front_to_back=True):
    G = rays[0].shape[0]
    NB = blk_aabb.shape[0]
    blkidx, blkcnt = _active_block_lists(rays, blk_aabb, tmax_arr,
                                         front_to_back=front_to_back)
    kernel = _make_worklist_kernel(t_min, tri_block, sub)
    ray_spec = pl.BlockSpec((1, sub * 8, LANES), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # blkidx, blkcnt, aabbs (SMEM)
        grid=(G,),
        in_specs=[ray_spec] * 7 + [
            pl.BlockSpec(memory_space=pl.ANY),      # triangles stay in HBM
        ],
        out_specs=(ray_spec,) * 4,
        scratch_shapes=[
            pltpu.VMEM((2, tri_block, LANES), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), I32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(blkidx, blkcnt, blk_aabb, *rays, tmax_arr, tri)


def closest_hit_worklist(orig, direction, v0, e1, e2, order=None,
                         t_max=None, t_min: float = 1e-4,
                         tri_block: int = TRI_BLOCK, sub: int = 4,
                         interpret: bool = False,
                         front_to_back: bool = True):
    """Large-scene closest hit, worklist-driven: the grid covers ray blocks
    only; each program double-buffer-DMAs its ACTIVE triangle blocks from
    HBM (XLA slab pre-pass -> compacted per-ray-block lists) and
    intersects them in-kernel.  Unlike `closest_hit_streamed` there is no
    dense (G, NB) grid, so fully-culled blocks cost nothing and the block
    count is not SMEM-capped — scales past 100k triangles.  Pass `order`
    (rt.bvh.build_clusters treelet order) so blocks are spatially tight.

    Returns (prim (R,) i32 in ORIGINAL ids, t, u, v)."""
    P = v0.shape[0]
    rays, R, Rp, G = _pack_rays(orig, direction, sub=sub)
    order = None if order is None else jnp.asarray(order)
    tri = _pack_tris(v0, e1, e2, order=order)
    # the (G, NB) worklist table is a scalar-prefetch arg (SMEM-resident,
    # ~1 MB budget: G=256 x NB=512 x i32 = 512 KB) — 8x the streamed
    # kernel's cap because there is no dense grid multiplying it; huge
    # scenes take coarser blocks beyond NB_MAX.  G grows with ray count
    # (ceil(R/4096)), so the cap shrinks for huge ray batches: per tri
    # block the table row costs G*4 B and the lane-padded (NB, 8->128)
    # AABB prefetch 512 B (ADVICE r2: guard the budget instead of failing
    # at Mosaic compile time).
    G_blocks = rays[0].shape[0]
    SMEM_BUDGET = 700 * 1024
    NB_MAX = max(8, min(512, SMEM_BUDGET // (G_blocks * 4 + 512)))
    needed = -(-tri.shape[0] // NB_MAX)
    tri_block = max(tri_block, -(-needed // 512) * 512)
    Pp0 = tri.shape[0]
    if Pp0 % tri_block:
        padn = tri_block - Pp0 % tri_block
        padrow = jnp.zeros((padn, 16), F32).at[:, 0:3].set(tri[0, 0:3])
        tri = jnp.concatenate([tri, padrow], 0)
    nzpad = tri.shape[0] - P
    if nzpad:
        # padding rows are degenerate (det 0) but must stay AABB-neutral
        fix = jnp.broadcast_to(tri[0, 0:3], (nzpad, 3))
        tri = tri.at[P:, 0:3].set(fix)
    tmax_arr = _pack_tmax(t_max, G, sub=sub)
    blk_aabb = _block_aabbs(tri, tri_block)
    # manual HBM->VMEM DMA slices need the minor dim 128-aligned (Mosaic
    # tiling); the 8x record padding is free in practice — the DMA is
    # double-buffered behind ~10x more compute per block
    tri = jnp.pad(tri, ((0, 0), (0, LANES - tri.shape[1])))

    bt, bp, bu, bv = _worklist_call(rays, tri, tmax_arr, blk_aabb,
                                    t_min, tri_block, sub, interpret,
                                    front_to_back=front_to_back)

    slot = bp.reshape(Rp)[:R]
    miss = (slot < 0) | (slot >= P)
    if order is None:
        prim = jnp.where(miss, jnp.int32(-1), slot)
    else:
        prim = jnp.where(miss, jnp.int32(-1),
                         order[jnp.clip(slot, 0, P - 1)])
    t = jnp.where(miss, jnp.inf, bt.reshape(Rp)[:R])
    u = jnp.where(miss, 0.0, bu.reshape(Rp)[:R])
    v = jnp.where(miss, 0.0, bv.reshape(Rp)[:R])
    return prim, t, u, v


# ---------------------------------------------------------------------------
# BVH-cut hierarchical worklists (round 4 — VERDICT r3 #1).
#
# The flat worklist prepass above runs exact per-ray slab tests against ALL
# tri blocks (O(ray-blocks x 4096 x NB)), and its (G, NB) SMEM table caps
# NB at ~500, forcing coarse blocks on big scenes — rays/s decayed linearly
# with scene size.  This path replaces both ends:
#
#   * blocks are BVH TREELETS (rt.bvh.build_block_set): tight subtree
#     AABBs at a fixed fine granularity (256 tris), variable real count
#     per block (the inner loop runs ceil(count/8) steps, not the slot
#     capacity) — the geometric work reduction of the raster unit's
#     recursive extent reject (graphics.cpp:743-797) applied to rays
#   * the prepass tests each ray block's conservative ORIGIN/DIRECTION
#     interval bounds against block/group AABBs — O(G x C) scalar-cheap
#     interval slab tests with NO per-ray factor, so C can be thousands.
#     Conservative = may pass extra blocks (the kernel's in-block exact
#     slab gate rejects them at ~one (32,128) test each), never misses
#   * the SMEM worklist stores ENTRIES = contiguous block ranges encoded
#     (level << 24 | start_block), range length 8^level: a ray block
#     whose exact block list exceeds the L-entry table falls back to the
#     8^l group pyramid — bounded SMEM at any scene size, still exact
#   * per-block AABBs ride IN the triangle records (row 0, lanes 9..14):
#     SMEM prefetch pads 2-D minor dims to 128 lanes, so a (C, 6) table
#     would cost C*512 B of SMEM (PERF.md round 2); the embedded copy
#     arrives with the block's DMA for free
# ---------------------------------------------------------------------------

# rays parked beyond this origin magnitude (tracer re-compaction parks
# dead rays at 3e7) are excluded from the conservative ray-block bounds.
# NOTE the contract is only that excluding them cannot MISS a hit for
# live rays: a parked ray pointing back toward the scene can still
# intersect geometry (its results must be masked by the caller — the
# tracer gates shadow/bounce results on the hit mask); parked rays with
# the away-pointing park direction never hit (slab tf < 0).
PARK_LIMIT = 1e7
ENTRY_LEVEL_SHIFT = 24
ENTRY_START_MASK = (1 << ENTRY_LEVEL_SHIFT) - 1


#: SMEM budget for the (G, L) worklist table (v5e SMEM is ~1 MB total;
#: leave headroom for the tc/bcnt prefetch operands and spill slots).
#: Witnessed: sub=1 (G=1024) with L=256 compiles to a 1.00 MB operand
#: and the chip compile fails "Ran out of memory in memory space smem".
_SMEM_WL_BUDGET = 860 * 1024


def _clamp_L(L, G, blocks, bytes_per_entry: int = 4):
    """Shrink L to the SMEM worklist budget for this ray count (safe:
    smaller L only forces coarser 8^l range entries, never drops work);
    raise if even the coarsest level cannot fit.  bytes_per_entry: 4 for
    the wl table alone, 8 when the kernel also prefetches the per-entry
    early-exit distances (closest_hit_bvh)."""
    top = blocks["levels"][-1].shape[0]
    max_l = _SMEM_WL_BUDGET // (G * bytes_per_entry)
    if max_l < top:
        raise ValueError(
            f"worklist table for G={G} ray blocks cannot hold even the "
            f"coarsest {top}-entry level within SMEM "
            f"({_SMEM_WL_BUDGET // 1024} KB): use a larger `sub` (fewer "
            "ray blocks) or a smaller build_block_set top_size")
    return min(L, max_l)


def _validate_bvh_args(blocks, L, unroll):
    """Correctness preconditions the kernels cannot check themselves."""
    if blocks["levels"][-1].shape[0] > L:
        raise ValueError(
            f"coarsest group level has {blocks['levels'][-1].shape[0]} "
            f"entries > L={L}: active entries would be silently dropped "
            "(build_block_set top_size must be <= L)")
    if blocks["tri_block"] % unroll:
        raise ValueError(
            f"unroll={unroll} must divide tri_block={blocks['tri_block']}: "
            "the unrolled splat loop would read rows past the DMA'd block "
            "(into the other double-buffer slot)")


def prepare_bvh_blocks(v0, e1, e2, block_set):
    """Pack triangle records into the block-slot layout (once per scene).

    block_set: rt.bvh.build_block_set output.  Returns the dict
    closest_hit_bvh consumes: lane-padded records with the block AABB
    embedded in row 0 lanes 9..14, per-block counts, slot->prim map, and
    the group-AABB pyramid as device arrays.
    """
    TB = block_set["tri_block"]
    C = block_set["num_blocks"]
    P = v0.shape[0]
    s2p = jnp.asarray(block_set["slot_to_prim"])
    tri9 = jnp.stack([v0[:, 0], v0[:, 1], v0[:, 2],
                      e1[:, 0], e1[:, 1], e1[:, 2],
                      e2[:, 0], e2[:, 1], e2[:, 2]], 1)        # (P, 9)
    rows = jnp.where((s2p >= 0)[:, None],
                     tri9[jnp.clip(s2p, 0, P - 1)], 0.0)       # degenerate pad
    rec = jnp.pad(rows, ((0, 0), (0, 16 - 9)))
    aabb0 = jnp.asarray(block_set["aabb_levels"][0])
    rec = rec.at[jnp.arange(C) * TB, 9:15].set(aabb0)
    rec = jnp.pad(rec, ((0, 0), (0, LANES - rec.shape[1])))
    return {
        "tri": rec,                                        # (C*TB, 128)
        "bcnt": jnp.asarray(block_set["bcnt"]),            # (C,)
        "s2p": s2p,                                        # (C*TB,)
        "levels": [jnp.asarray(a) for a in block_set["aabb_levels"]],
        "tri_block": TB,
        "num_blocks": C,
        "num_prims": P,
    }


def _ray_block_bounds(rays, tmax_arr):
    """Per-ray-block conservative bounds over LIVE rays.

    Live = tmax > -inf (not padding) and |origin| < PARK_LIMIT (not a
    parked dead ray) — both classes provably cannot hit, so excluding
    them from the bounds is conservative-safe.  Returns
    (o_lo, o_hi, d_lo, d_hi) each (G, 3), any_live (G,), far_ub (G,)."""
    ox, oy, oz, dx, dy, dz = rays
    BIG = jnp.float32(3e38)
    # zero-direction rays (the _pack_rays padding when t_max=None keeps
    # tmax=+inf) can never hit (MT det ~ 0) but would widen the
    # direction interval across 0 on every axis, making the whole block
    # uncullable — exclude them from the bounds too
    live = ((tmax_arr > -jnp.inf)
            & (jnp.abs(ox) < PARK_LIMIT)
            & (jnp.abs(oy) < PARK_LIMIT)
            & (jnp.abs(oz) < PARK_LIMIT)
            & ((dx != 0.0) | (dy != 0.0) | (dz != 0.0)))

    def mn(c):
        return jnp.min(jnp.where(live, c, BIG), axis=(1, 2))

    def mx(c):
        return jnp.max(jnp.where(live, c, -BIG), axis=(1, 2))

    o_lo = jnp.stack([mn(ox), mn(oy), mn(oz)], -1)
    o_hi = jnp.stack([mx(ox), mx(oy), mx(oz)], -1)
    d_lo = jnp.stack([mn(dx), mn(dy), mn(dz)], -1)
    d_hi = jnp.stack([mx(dx), mx(dy), mx(dz)], -1)
    any_live = jnp.any(live, axis=(1, 2))
    far_ub = jnp.max(jnp.where(live, tmax_arr, -jnp.inf), axis=(1, 2))
    return o_lo, o_hi, d_lo, d_hi, any_live, far_ub


def _conservative_active(bounds, aabb):
    """Interval-arithmetic slab test of every ray bundle vs every AABB.

    For any real ray r in bundle g and box c: its slab entry t_near(r,c)
    >= tn_lb[g,c] and exit t_far(r,c) <= tf_ub[g,c] (each axis's t
    values lie in the conservative product interval; monotone max/min
    preserve the bounds).  So (tn_lb > tf_ub or tf_ub < 0) proves NO ray
    hits the box — never the reverse.  Cost: ~40 flops per (g, c) pair,
    no per-ray factor.  Returns (active (G, Cl) bool, tn_lb (G, Cl))."""
    o_lo, o_hi, d_lo, d_hi, any_live, far_ub = bounds
    BIG = jnp.float32(3e38)
    tn_lb = jnp.full((o_lo.shape[0], aabb.shape[0]), -BIG, F32)
    tf_ub = jnp.full((o_lo.shape[0], aabb.shape[0]), BIG, F32)
    for k in range(3):
        b_lo = aabb[None, :, k]
        b_hi = aabb[None, :, 3 + k]
        num_lo = b_lo - o_hi[:, k, None]
        num_hi = b_hi - o_lo[:, k, None]
        dl = d_lo[:, k, None]
        dh = d_hi[:, k, None]
        spans0 = (dl <= 0.0) & (dh >= 0.0)      # direction interval has 0
        inv_a = 1.0 / jnp.where(dl == 0.0, 1.0, dl)
        inv_b = 1.0 / jnp.where(dh == 0.0, 1.0, dh)
        il = jnp.minimum(inv_a, inv_b)
        ih = jnp.maximum(inv_a, inv_b)
        c1 = num_lo * il
        c2 = num_lo * ih
        c3 = num_hi * il
        c4 = num_hi * ih
        t_lo = jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))
        t_hi = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
        t_lo = jnp.where(spans0, -BIG, t_lo)
        t_hi = jnp.where(spans0, BIG, t_hi)
        tn_lb = jnp.maximum(tn_lb, t_lo)
        tf_ub = jnp.minimum(tf_ub, t_hi)
    tn_lb = jnp.maximum(tn_lb, 0.0)
    tf_ub = jnp.minimum(tf_ub, far_ub[:, None])
    active = (tn_lb <= tf_ub) & any_live[:, None]
    return active, tn_lb


def _conservative_entry_lists(rays, tmax_arr, levels, L,
                              front_to_back=True, ftb_min_mean=2.0):
    """Per-ray-block worklists of (level, start) range entries.

    Each ray block uses the FINEST pyramid level whose active count fits
    the L-entry table (level 0 = exact block lists; coarser levels trade
    false-positive blocks for bounded SMEM).  Entries are ordered by
    conservative entry distance (front-to-back — the kernel's running
    best_t slab gate prunes occluded ranges) unless the mean active
    count is below ftb_min_mean, where the sort buys nothing and id
    order wins (VERDICT r3 #9); both orders come from the same argsort.

    Returns (wl (G, L) i32 entries, ec (G,) entry counts,
             total (G,) summed block counts, etn (G, L) f32 per-entry
             conservative entry distances — the early-exit keys:
             nondecreasing along each row under front-to-back order,
             -inf when id order was chosen (exit disabled)).
    """
    C = levels[0].shape[0]
    bounds = _ray_block_bounds(rays, tmax_arr)
    G = rays[0].shape[0]
    INF = jnp.float32(float("inf"))

    per_level = []
    for lvl, aabb in enumerate(levels):
        Cl = aabb.shape[0]
        if lvl > 0 and levels[lvl - 1].shape[0] <= L:
            # previous level always fits: coarser levels are dead weight
            break
        active, tn_lb = _conservative_active(bounds, aabb)
        cnt = jnp.sum(active, axis=1).astype(I32)
        span = 8 ** lvl
        idx = jnp.arange(Cl, dtype=I32)
        # front-to-back vs id order resolved in the sort KEY; top_k
        # keeps only the L needed entries (full argsort over (G, C) was
        # 30-50 % of the prepass at C ~ 10k)
        use_ftb = (jnp.sum(cnt) > ftb_min_mean * G) & bool(front_to_back)
        key = jnp.where(active,
                        jnp.where(use_ftb, tn_lb, idx[None].astype(F32)),
                        INF)
        k = min(L, Cl)
        negk, sel = jax.lax.top_k(-key, k)                     # ascending
        sel = sel.astype(I32)
        starts = sel * span
        entries = (jnp.int32(lvl) << ENTRY_LEVEL_SHIFT) | starts
        # per-entry early-exit key: the sorted tn_lb itself under
        # front-to-back; -inf (never exit) under id order, where the
        # key values are block indices, not distances
        etn = jnp.where(use_ftb, -negk, -INF)
        if k < L:                                              # Cl < L
            entries = jnp.pad(entries, ((0, 0), (0, L - k)))
            etn = jnp.pad(etn, ((0, 0), (0, L - k)),
                          constant_values=float("inf"))
        lens = jnp.where(active, jnp.minimum(span, C - idx[None] * span), 0)
        per_level.append((entries, cnt, jnp.sum(lens, axis=1).astype(I32),
                          etn))

    nl = len(per_level)
    if nl == 1:
        return per_level[0]
    # finest level that fits per ray block (top always fits: build_block_set
    # stops at <= 64 groups and L >= 64 is enforced by the caller)
    lvl_sel = jnp.full((G,), nl - 1, I32)
    for lvl in range(nl - 2, -1, -1):
        lvl_sel = jnp.where(per_level[lvl][1] <= L, lvl, lvl_sel)
    wl_all = jnp.stack([p[0] for p in per_level])        # (nl, G, L)
    ec_all = jnp.stack([p[1] for p in per_level])
    tc_all = jnp.stack([p[2] for p in per_level])
    etn_all = jnp.stack([p[3] for p in per_level])
    g_iota = jnp.arange(G)
    wl = wl_all[lvl_sel, g_iota]
    ec = ec_all[lvl_sel, g_iota]
    total = tc_all[lvl_sel, g_iota]
    etn = etn_all[lvl_sel, g_iota]
    return wl, ec, total, etn


def _slab_embedded(row0, ox, oy, oz, inv_dx, inv_dy, inv_dz, far):
    """Slab test vs the block AABB embedded in record row 0 lanes 9..14."""
    t0x = (row0[9] - ox) * inv_dx
    t1x = (row0[12] - ox) * inv_dx
    t0y = (row0[10] - oy) * inv_dy
    t1y = (row0[13] - oy) * inv_dy
    t0z = (row0[11] - oz) * inv_dz
    t1z = (row0[14] - oz) * inv_dz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), far))
    return tn, tf


def _make_bvh_worklist_kernel(t_min: float, tri_block: int, num_blocks: int,
                              unroll: int = 8, L: int = 256,
                              early_exit: bool = True):
    C = num_blocks

    def kernel(wl_ref, tc_ref, bcnt_ref, etn_ref,  # SMEM prefetch
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmax_ref,                           # VMEM ray tiles
               tri_hbm,                            # (C*TB, 128) in HBM
               bt_ref, bp_ref, bu_ref, bv_ref,     # outs
               tri_vmem, sem):                     # (2, TB, 128) + DMA sems
        # wl_ref / etn_ref are TRANSPOSED (L, G): SMEM pads a table's
        # minor dim to 128 lanes, so (G, L) rows would pad L -> its next
        # 128 multiple (witnessed: (512, 215) tables allocating 512 KB
        # each and blowing the 1 MB budget); with G on the minor dim
        # (always a multiple of 128 ray blocks? no — but >= 128-aligned
        # in practice via _pack_rays padding) the tables store exact.
        g = pl.program_id(0)
        total = tc_ref[g]
        bt_ref[0] = tmax_ref[0]
        bp_ref[0] = jnp.full(bt_ref.shape[1:], -1, I32)
        bu_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)
        bv_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)

        def entry_len(e):
            ent = wl_ref[e, g]
            span = jnp.int32(1) << (3 * (ent >> ENTRY_LEVEL_SHIFT))
            return jnp.minimum(span, C - (ent & ENTRY_START_MASK))

        def blk(e, off):
            return (wl_ref[e, g] & ENTRY_START_MASK) + off

        def advance(e, off):
            wrap = off + 1 >= entry_len(e)
            return (jnp.where(wrap, e + 1, e),
                    jnp.where(wrap, 0, off + 1))

        def get_dma(slot, b):
            return pltpu.make_async_copy(
                tri_hbm.at[pl.ds(b * tri_block, tri_block), :],
                tri_vmem.at[slot],
                sem.at[slot])

        @pl.when(total > 0)
        def _warm():
            get_dma(0, blk(0, 0)).start()

        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        inv_dx = _inv_dir(dx)
        inv_dy = _inv_dir(dy)
        inv_dz = _inv_dir(dz)

        def cond(carry):
            p, e, off, alive = carry
            return (p < total) & alive

        def body(carry):
            p, e, off, _ = carry
            slot = jax.lax.rem(p, 2)
            ne, noff = advance(e, off)

            @pl.when(p + 1 < total)
            def _next():
                get_dma(1 - slot, blk(ne, noff)).start()

            get_dma(slot, blk(e, off)).wait()
            b = blk(e, off)
            trs = tri_vmem.at[slot]

            # exact whole-tile slab gate from the embedded block AABB vs
            # the running best_t: filters both conservative-prepass false
            # positives and occluded blocks at one (sub*8, 128) test
            tn, tf = _slab_embedded(trs[0], ox, oy, oz,
                                    inv_dx, inv_dy, inv_dz, bt_ref[0])

            @pl.when(jnp.any(tn <= tf))
            def _():
                base = b * tri_block
                nt = bcnt_ref[b]

                def step(h, _):
                    # unrolled single-tri splats (loop bookkeeping bounds
                    # the tests/s ceiling — PERF.md); rows past nt are
                    # degenerate (det 0) so the ceil is safe
                    for s in range(unroll):
                        j = h * unroll + s
                        best_t = bt_ref[0]
                        hit, t, u, v = _mt_one(ox, oy, oz, dx, dy, dz,
                                               trs[j], t_min, best_t)
                        bt_ref[0] = jnp.where(hit, t, best_t)
                        bp_ref[0] = jnp.where(hit, base + j, bp_ref[0])
                        bu_ref[0] = jnp.where(hit, u, bu_ref[0])
                        bv_ref[0] = jnp.where(hit, v, bv_ref[0])
                    return 0

                jax.lax.fori_loop(0, (nt + unroll - 1) // unroll, step, 0)

            # FRONT-TO-BACK EARLY EXIT (round 5): entries are sorted by
            # conservative entry distance and every hit in a later entry
            # has t >= its etn, so once the NEXT entry's etn exceeds
            # every ray's running best_t nothing later can win — skip
            # the whole tail (its gates AND its DMAs).  Under id order
            # the prepass emits etn = -inf, disabling the exit; the
            # strict > keeps exact-tie lower-slot winners reachable.
            alive = etn_ref[jnp.minimum(ne, L - 1), g] <= jnp.max(bt_ref[0])
            return p + 1, ne, noff, alive

        if early_exit:
            p, e, off, alive = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                             total > 0))

            # an early exit leaves the NEXT block's prefetch in flight —
            # every started DMA must be awaited or the program aborts at
            # teardown (any_hit kernel lesson, PERF.md round 4)
            @pl.when(p < total)
            def _drain():
                get_dma(jax.lax.rem(p, 2), blk(e, off)).wait()
        else:
            # plain fori walk (no etn reads, no per-block tile max):
            # measured better for frames whose slab gate already prunes
            # well and whose L budget matters more (north-star: 459.4 ms
            # without vs 468.9 with — the 8-byte entries clamp L 256 ->
            # 209 at G=512)
            def loop(p, carry):
                e, off = carry
                _, e2, off2, _ = body((p, e, off, True))
                return e2, off2

            jax.lax.fori_loop(0, total, loop,
                              (jnp.int32(0), jnp.int32(0)))

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "tri_block",
                                             "num_blocks", "sub", "L",
                                             "interpret", "front_to_back",
                                             "unroll", "early_exit"))
def _bvh_worklist_call(rays, tri, tmax_arr, levels, bcnt, t_min, tri_block,
                       num_blocks, sub, L, interpret, front_to_back=True,
                       unroll=8, early_exit=True):
    G = rays[0].shape[0]
    wl, ec, total, etn = _conservative_entry_lists(
        rays, tmax_arr, levels, L, front_to_back=front_to_back)
    if not early_exit:
        etn = jnp.zeros((G, 1), F32)     # unused: keep SMEM for wl
    kernel = _make_bvh_worklist_kernel(t_min, tri_block, num_blocks,
                                       unroll=unroll, L=L,
                                       early_exit=early_exit)
    ray_spec = pl.BlockSpec((1, sub * 8, LANES), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,           # wl, total, bcnt, etn (SMEM)
        grid=(G,),
        in_specs=[ray_spec] * 7 + [
            pl.BlockSpec(memory_space=pl.ANY),      # records stay in HBM
        ],
        out_specs=(ray_spec,) * 4,
        scratch_shapes=[
            pltpu.VMEM((2, tri_block, LANES), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), I32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(wl.T, total, bcnt, etn.T, *rays, tmax_arr, tri)


def closest_hit_bvh(orig, direction, blocks, t_max=None,
                    t_min: float = 1e-4, sub: int = 4, L: int = 256,
                    interpret: bool = False, front_to_back: bool = True,
                    unroll: int = 8, early_exit: bool = True):
    """Hierarchical large-scene closest hit (see module section comment).

    blocks: prepare_bvh_blocks output (BVH-treelet record blocks).
    L: SMEM worklist entry capacity per ray block (>= 64; ray blocks
    whose exact block list overflows take coarser 8^l range entries).
    early_exit: front-to-back per-entry-tn early exit of the block walk
    (round 5: +7 % at 1.31M tris; costs L budget — the per-entry table
    doubles SMEM bytes — so dense frames may prefer False, PERF.md).
    Returns (prim (R,) i32 in ORIGINAL ids, t, u, v)."""
    rays, R, Rp, G = _pack_rays(orig, direction, sub=sub)
    L = _clamp_L(L, G, blocks,
                 bytes_per_entry=8 if early_exit else 4)
    _validate_bvh_args(blocks, L, unroll)
    P = blocks["num_prims"]
    tmax_arr = _pack_tmax(t_max, G, sub=sub)

    bt, bp, bu, bv = _bvh_worklist_call(
        rays, blocks["tri"], tmax_arr, tuple(blocks["levels"]),
        blocks["bcnt"], t_min, blocks["tri_block"], blocks["num_blocks"],
        sub, L, interpret, front_to_back=front_to_back, unroll=unroll,
        early_exit=early_exit)

    slot = bp.reshape(Rp)[:R]
    miss = slot < 0
    s2p = blocks["s2p"]
    prim = jnp.where(miss, jnp.int32(-1),
                     s2p[jnp.clip(slot, 0, s2p.shape[0] - 1)])
    t = jnp.where(miss, jnp.inf, bt.reshape(Rp)[:R])
    u = jnp.where(miss, 0.0, bu.reshape(Rp)[:R])
    v = jnp.where(miss, 0.0, bv.reshape(Rp)[:R])
    return prim, t, u, v


def _make_bvh_after_kernel(t_min: float, tri_block: int, num_blocks: int,
                           unroll: int = 8):
    """Enumeration twin of the BVH worklist kernel: returns the hit that
    is the LEXICOGRAPHIC (t, slot) minimum STRICTLY AFTER a per-ray
    (t_lo, slot_lo) carry.  Repeated calls, feeding each walk's (t, slot)
    back as the next carry, enumerate every hit along a ray exactly once
    in (t, slot) order — including exact-t ties (shared-edge / coplanar
    fragments), which a plain t-epsilon advance would skip.  This is the
    RT analog of the deferred raster K-slot fragment collection
    (ops/deferred.py) used for submission-order OM compositing
    (om_unit.cpp:24-154 semantics) of translucent drawcalls."""
    C = num_blocks

    def kernel(wl_ref, tc_ref, bcnt_ref,           # SMEM prefetch
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmax_ref, tlo_ref, slo_ref,         # VMEM ray tiles
               tri_hbm,                            # (C*TB, 128) in HBM
               bt_ref, bp_ref, bu_ref, bv_ref,     # outs
               tri_vmem, sem):                     # (2, TB, 128) + DMA sems
        g = pl.program_id(0)
        total = tc_ref[g]
        bt_ref[0] = tmax_ref[0]
        bp_ref[0] = jnp.full(bt_ref.shape[1:], -1, I32)
        bu_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)
        bv_ref[0] = jnp.zeros(bt_ref.shape[1:], F32)

        def entry_len(e):
            ent = wl_ref[g, e]
            span = jnp.int32(1) << (3 * (ent >> ENTRY_LEVEL_SHIFT))
            return jnp.minimum(span, C - (ent & ENTRY_START_MASK))

        def blk(e, off):
            return (wl_ref[g, e] & ENTRY_START_MASK) + off

        def advance(e, off):
            wrap = off + 1 >= entry_len(e)
            return (jnp.where(wrap, e + 1, e),
                    jnp.where(wrap, 0, off + 1))

        def get_dma(slot, b):
            return pltpu.make_async_copy(
                tri_hbm.at[pl.ds(b * tri_block, tri_block), :],
                tri_vmem.at[slot],
                sem.at[slot])

        @pl.when(total > 0)
        def _warm():
            get_dma(0, blk(0, 0)).start()

        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        tlo = tlo_ref[0]
        slo = slo_ref[0]
        inv_dx = _inv_dir(dx)
        inv_dy = _inv_dir(dy)
        inv_dz = _inv_dir(dz)

        def loop(p, carry):
            e, off = carry
            slot = jax.lax.rem(p, 2)
            ne, noff = advance(e, off)

            @pl.when(p + 1 < total)
            def _next():
                get_dma(1 - slot, blk(ne, noff)).start()

            get_dma(slot, blk(e, off)).wait()
            b = blk(e, off)
            trs = tri_vmem.at[slot]

            # exact whole-tile slab gate (AABB embedded in record row 0);
            # far bound = running best_t like the closest-hit kernel
            tn, tf = _slab_embedded(trs[0], ox, oy, oz,
                                    inv_dx, inv_dy, inv_dz, bt_ref[0])

            @pl.when(jnp.any(tn <= tf))
            def _():
                base = b * tri_block
                nt = bcnt_ref[b]

                def step(h, _):
                    for s in range(unroll):
                        j = h * unroll + s
                        best_t = bt_ref[0]
                        best_p = bp_ref[0]
                        # _mt_one's upper bound replaced by the
                        # lexicographic window (t_lo,slot_lo) < (t,sid)
                        # < (best_t,best_p)
                        hit, t, u, v = _mt_one(ox, oy, oz, dx, dy, dz,
                                               trs[j], t_min, jnp.inf)
                        sid = base + j
                        hit = hit & ((t < best_t)
                                     | ((t == best_t) & (sid < best_p)))
                        hit = hit & ((t > tlo)
                                     | ((t == tlo) & (sid > slo)))
                        bt_ref[0] = jnp.where(hit, t, best_t)
                        bp_ref[0] = jnp.where(hit, sid, best_p)
                        bu_ref[0] = jnp.where(hit, u, bu_ref[0])
                        bv_ref[0] = jnp.where(hit, v, bv_ref[0])
                    return 0

                jax.lax.fori_loop(0, (nt + unroll - 1) // unroll, step, 0)
            return ne, noff

        jax.lax.fori_loop(0, total, loop, (jnp.int32(0), jnp.int32(0)))

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "tri_block",
                                             "num_blocks", "sub", "L",
                                             "interpret", "unroll"))
def _bvh_after_call(rays, tri, tmax_arr, tlo_arr, slo_arr, wl, total, bcnt,
                    t_min, tri_block, num_blocks, sub, L, interpret,
                    unroll=8):
    G = rays[0].shape[0]
    kernel = _make_bvh_after_kernel(t_min, tri_block, num_blocks,
                                    unroll=unroll)
    ray_spec = pl.BlockSpec((1, sub * 8, LANES), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # wl, total, bcnt (SMEM)
        grid=(G,),
        in_specs=[ray_spec] * 9 + [
            pl.BlockSpec(memory_space=pl.ANY),      # records stay in HBM
        ],
        out_specs=(ray_spec,) * 4,
        scratch_shapes=[
            pltpu.VMEM((2, tri_block, LANES), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), I32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
            jax.ShapeDtypeStruct((G, sub * 8, LANES), F32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(wl, total, bcnt, *rays, tmax_arr, tlo_arr, slo_arr, tri)


def bvh_worklists(orig, direction, blocks, t_max=None, sub: int = 2,
                  L: int = 256, front_to_back: bool = True):
    """Precompute the conservative per-ray-block worklists consumed by
    closest_hit_bvh_after.  The lists depend only on (rays, t_max), so a
    K-walk enumeration over the same rays computes them ONCE and shares
    them across every walk."""
    rays, R, Rp, G = _pack_rays(orig, direction, sub=sub)
    L = _clamp_L(L, G, blocks)
    _validate_bvh_args(blocks, L, 8)
    tmax_arr = _pack_tmax(t_max, G, sub=sub)
    wl, ec, total, _etn = _conservative_entry_lists(
        rays, tmax_arr, tuple(blocks["levels"]), L,
        front_to_back=front_to_back)
    return {"wl": wl, "total": total, "rays": rays, "tmax": tmax_arr,
            "R": R, "Rp": Rp, "G": G, "sub": sub, "L": L}


def closest_hit_bvh_after(blocks, worklists, t_lo, slot_lo,
                          t_min: float = 1e-4, interpret: bool = False,
                          unroll: int = 8):
    """Next hit strictly after the per-ray carry (t_lo, slot_lo) in
    lexicographic (t, slot) order (slot = block-set slot id).

    worklists: bvh_worklists(...) output for the SAME rays.
    t_lo (R,) f32 / slot_lo (R,) i32: the previous walk's (t, slot)
    (start the first walk at (-inf, -1); a missed ray returns t=+inf, so
    feeding results straight back terminates enumeration naturally).
    Returns (slot, prim, t, u, v) — slot for carrying, prim in ORIGINAL
    ids for attribute fetch; both -1 on miss."""
    wk = worklists
    sub, R, Rp, G = wk["sub"], wk["R"], wk["Rp"], wk["G"]
    BLK = sub * 8 * LANES
    tlo_arr = _pad_to(jnp.asarray(t_lo, F32), BLK,
                      fill=jnp.inf).reshape(G, sub * 8, LANES)
    slo_arr = _pad_to(jnp.asarray(slot_lo, I32), BLK,
                      fill=2 ** 30).reshape(G, sub * 8, LANES)

    bt, bp, bu, bv = _bvh_after_call(
        wk["rays"], blocks["tri"], wk["tmax"], tlo_arr, slo_arr,
        wk["wl"], wk["total"], blocks["bcnt"], t_min,
        blocks["tri_block"], blocks["num_blocks"], sub, wk["L"],
        interpret, unroll=unroll)

    slot = bp.reshape(Rp)[:R]
    miss = slot < 0
    s2p = blocks["s2p"]
    prim = jnp.where(miss, jnp.int32(-1),
                     s2p[jnp.clip(slot, 0, s2p.shape[0] - 1)])
    t = jnp.where(miss, jnp.inf, bt.reshape(Rp)[:R])
    u = jnp.where(miss, 0.0, bu.reshape(Rp)[:R])
    v = jnp.where(miss, 0.0, bv.reshape(Rp)[:R])
    return slot, prim, t, u, v


def _make_bvh_anyhit_kernel(t_min: float, tri_block: int, num_blocks: int,
                            unroll: int = 8):
    """Occlusion twin of the BVH worklist kernel: no best-hit record —
    an occluded ray's window is collapsed (tmax -> -inf) so the embedded
    slab gate skips blocks for it automatically, and the worklist loop
    itself exits once EVERY ray in the tile is occluded (the whole-tile
    early-out of any_hit_clustered, scaled to HBM-streamed scenes)."""
    C = num_blocks

    def kernel(wl_ref, tc_ref, bcnt_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmax_ref,
               tri_hbm,
               occ_ref,                            # out (1, sub*8, 128) i32
               win_ref, tri_vmem, sem):            # VMEM window + DMA bufs
        g = pl.program_id(0)
        total = tc_ref[g]
        occ_ref[0] = jnp.zeros(occ_ref.shape[1:], I32)
        win_ref[:] = tmax_ref[0]                   # live hit window

        def entry_len(e):
            ent = wl_ref[g, e]
            span = jnp.int32(1) << (3 * (ent >> ENTRY_LEVEL_SHIFT))
            return jnp.minimum(span, C - (ent & ENTRY_START_MASK))

        def blk(e, off):
            return (wl_ref[g, e] & ENTRY_START_MASK) + off

        def advance(e, off):
            wrap = off + 1 >= entry_len(e)
            return (jnp.where(wrap, e + 1, e),
                    jnp.where(wrap, 0, off + 1))

        def get_dma(slot, b):
            return pltpu.make_async_copy(
                tri_hbm.at[pl.ds(b * tri_block, tri_block), :],
                tri_vmem.at[slot],
                sem.at[slot])

        @pl.when(total > 0)
        def _warm():
            get_dma(0, blk(0, 0)).start()

        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        inv_dx = _inv_dir(dx)
        inv_dy = _inv_dir(dy)
        inv_dz = _inv_dir(dz)

        def cond(carry):
            p, e, off, alive = carry
            return (p < total) & alive

        def body(carry):
            p, e, off, _ = carry
            slot = jax.lax.rem(p, 2)
            ne, noff = advance(e, off)

            @pl.when(p + 1 < total)
            def _next():
                get_dma(1 - slot, blk(ne, noff)).start()

            get_dma(slot, blk(e, off)).wait()
            trs = tri_vmem.at[slot]

            tn, tf = _slab_embedded(trs[0], ox, oy, oz,
                                    inv_dx, inv_dy, inv_dz, win_ref[:])

            @pl.when(jnp.any(tn <= tf))
            def _():
                nt = bcnt_ref[blk(e, off)]

                def step(h, _):
                    for s in range(unroll):
                        j = h * unroll + s
                        hit, _, _, _ = _mt_one(ox, oy, oz, dx, dy, dz,
                                               trs[j], t_min, win_ref[:])
                        occ_ref[0] = jnp.where(hit, 1, occ_ref[0])
                        # collapse the hit window: the ray stops gating
                        # blocks in, and once all windows collapse the
                        # while cond ends the worklist walk
                        win_ref[:] = jnp.where(hit, -jnp.inf, win_ref[:])
                    return 0

                jax.lax.fori_loop(0, (nt + unroll - 1) // unroll, step, 0)

            alive = jnp.any(win_ref[:] > -jnp.inf)
            return p + 1, ne, noff, alive

        p, e, off, alive = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), total > 0))

        # early exit leaves the NEXT block's prefetch in flight — every
        # started DMA must be awaited or the program aborts at teardown
        # (observed on chip: TPU backend ABORTED on the first
        # fully-occluded tile)
        @pl.when(p < total)
        def _drain():
            get_dma(jax.lax.rem(p, 2), blk(e, off)).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "tri_block",
                                             "num_blocks", "sub", "L",
                                             "interpret", "unroll"))
def _bvh_anyhit_call(rays, tri, tmax_arr, levels, bcnt, t_min, tri_block,
                     num_blocks, sub, L, interpret, unroll=8):
    G = rays[0].shape[0]
    # occlusion has no benefit from front-to-back (any hit ends the ray);
    # id-order entries skip the distance keys
    wl, ec, total, _etn = _conservative_entry_lists(rays, tmax_arr,
                                                    levels, L,
                                                    front_to_back=False)
    kernel = _make_bvh_anyhit_kernel(t_min, tri_block, num_blocks,
                                     unroll=unroll)
    ray_spec = pl.BlockSpec((1, sub * 8, LANES), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # wl, total, bcnt (SMEM)
        grid=(G,),
        in_specs=[ray_spec] * 7 + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=ray_spec,
        scratch_shapes=[
            pltpu.VMEM((sub * 8, LANES), F32),
            pltpu.VMEM((2, tri_block, LANES), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, sub * 8, LANES), I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(wl, total, bcnt, *rays, tmax_arr, tri)


def any_hit_bvh(orig, direction, blocks, t_max=1.0, t_min: float = 1e-4,
                sub: int = 4, L: int = 256, interpret: bool = False,
                unroll: int = 8):
    """Occlusion query through the hierarchical worklist path with a
    whole-tile early-out (shadow-ray twin of closest_hit_bvh).
    Returns (R,) bool."""
    rays, R, Rp, G = _pack_rays(orig, direction, sub=sub)
    L = _clamp_L(L, G, blocks)
    _validate_bvh_args(blocks, L, unroll)
    tm = (jnp.full((orig.shape[0],), t_max, F32) if jnp.ndim(t_max) == 0
          else jnp.asarray(t_max, F32))
    tmax_arr = _pack_tmax(tm, G, sub=sub)
    occ = _bvh_anyhit_call(rays, blocks["tri"], tmax_arr,
                           tuple(blocks["levels"]), blocks["bcnt"], t_min,
                           blocks["tri_block"], blocks["num_blocks"],
                           sub, L, interpret, unroll=unroll)
    return occ.reshape(Rp)[:R] > 0


def _make_clustered_anyhit_kernel(num_clusters: int, t_min: float):
    def kernel(cf_ref, cc_ref, ca_ref,            # scalar-prefetch (SMEM)
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tri_ref, tmax_ref,
               oc_ref):                           # out: (1, 8, 128) i32
        ox = ox_ref[0]
        oy = oy_ref[0]
        oz = oz_ref[0]
        dx = dx_ref[0]
        dy = dy_ref[0]
        dz = dz_ref[0]
        tmax = tmax_ref[0]

        oc_ref[0] = jnp.zeros(ox.shape, I32)

        inv_dx = _inv_dir(dx)
        inv_dy = _inv_dir(dy)
        inv_dz = _inv_dir(dz)

        def cstep(c, _):
            live = oc_ref[0] == 0
            tn, tf = _slab(ca_ref, c, ox, oy, oz,
                           inv_dx, inv_dy, inv_dz, tmax)
            # skip the cluster when no *unoccluded* ray overlaps it; once
            # the whole tile is occluded every remaining cluster skips —
            # the early-out the flat kernel lacks
            test = jnp.any(live & (tn <= tf))

            @pl.when(test)
            def _():
                first = cf_ref[c]

                def tstep(k, _):
                    hit, _, _, _ = _mt_one(ox, oy, oz, dx, dy, dz,
                                           tri_ref[first + k], t_min, tmax)
                    oc_ref[0] = jnp.where(hit, 1, oc_ref[0])
                    return 0

                jax.lax.fori_loop(0, cc_ref[c], tstep, 0)
            return 0

        jax.lax.fori_loop(0, num_clusters, cstep, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def _clustered_anyhit_call(rays, tri, tmax_arr, cl_first, cl_count, cl_aabb,
                           t_min, interpret):
    G = rays[0].shape[0]
    Pp = tri.shape[0]
    C = cl_first.shape[0]
    kernel = _make_clustered_anyhit_kernel(C, t_min)
    ray_spec = pl.BlockSpec((1, 8, LANES), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # first, count, aabb in SMEM
        grid=(G,),
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec((Pp, 16), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec,
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 8, LANES), I32),
        interpret=interpret,
    )(cl_first, cl_count, cl_aabb, *rays, tri, tmax_arr)


def any_hit_clustered(orig, direction, v0, e1, e2, clusters, t_max=1.0,
                      t_min: float = 1e-4, interpret: bool = False):
    """Cluster-culled occlusion test: treelet AABB gating restricted to
    still-unoccluded rays, so a fully-occluded tile skips every remaining
    cluster (per-tile early-out).  Shadow/occlusion twin of
    closest_hit_clustered.  Returns (R,) bool."""
    rays, R, Rp, G = _pack_rays(orig, direction)
    tri = _pack_tris(v0, e1, e2, order=jnp.asarray(clusters["order"]))
    tm = (jnp.full((orig.shape[0],), t_max, F32) if jnp.ndim(t_max) == 0
          else jnp.asarray(t_max, F32))
    tmax_arr = _pack_tmax(tm, G)

    occ = _clustered_anyhit_call(
        rays, tri, tmax_arr,
        jnp.asarray(clusters["first"], jnp.int32),
        jnp.asarray(clusters["count"], jnp.int32),
        jnp.asarray(clusters["aabb"], F32),
        t_min, interpret)
    return occ.reshape(Rp)[:R] > 0


def any_hit_pallas(orig, direction, v0, e1, e2, t_max=1.0,
                   t_min: float = 1e-4, interpret: bool = False):
    """Occlusion via the blocked kernel.  Note: no per-ray early-out (the
    kernel always streams all triangles); the t_max bound only narrows
    the hit window.  any_hit_clustered has the per-tile early-out."""
    R = orig.shape[0]
    tm = (jnp.full((R,), t_max, F32) if jnp.ndim(t_max) == 0
          else jnp.asarray(t_max, F32))
    prim, _, _, _ = closest_hit_pallas(orig, direction, v0, e1, e2,
                                       t_max=tm, t_min=t_min,
                                       interpret=interpret)
    return prim >= 0
