"""Pallas TPU visibility kernel — the raster-unit hot op (SURVEY §2.1 B2).

The reference's raster unit walks tiles recursively and emits 2×2 quads
(graphics.cpp:715-843, hw/rtl/raster/VX_raster_te.sv).  On TPU the whole
tile advances in lockstep on the VPU: each grid program owns one binned
tile, its ts×ts pixels laid out as a (ts*ts/128, 128) block — the native
(sublane, lane) shape — and scans the tile's primitives sequentially,
carrying (depth-stencil word, winning prim slot) per pixel exactly like
the deferred pass 1 (ops.deferred._visibility_tiles, its parity twin).

TPU-native design choices:
  * per-tile primitive records are pre-gathered by XLA into a dense
    (T, M, 16) i32 array, so the kernel body does ZERO dynamic gathers —
    each step reads one 16-lane record row and broadcasts scalars
  * edge evaluation is incremental: base = a*ox + b*oy + c computed on
    scalars, plus constant a*XL + b*YL lane grids (2 vector MULs/edge
    instead of 3)
  * the fixed-point interpolation (48-bit product via 16-bit limbs,
    core.fixed.imadd24) and the float32 barycentric reciprocal
    (draw3d/kernel.cpp:25-35) run unchanged inside the kernel — int32/f32
    VPU ops only
  * exact-int semantics: output is bit-identical to the XLA oracle, so
    the golden-image tests hold for this path too

Layout of one primitive record (lane index in the (…, 16) row):
   0..8   edge matrix [e][a, b, c]        int32 fixed16
   9..11  z attribute plane (zx, zy, zc)  int32 fixed24
   12     valid flag (1/0)
   13..15 zero padding (lane alignment)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fixed
from ..om import merger as om_merger

I32 = jnp.int32
U32 = jnp.uint32
LANES = 128


def pack_prim_records(edges, zattr, tile_pids):
    """XLA pre-gather: (P,3,3) edges + (P,3) zattr + (T,M) pids ->
    (T, M, 16) i32 per-tile primitive records."""
    P = edges.shape[0]
    rec = jnp.concatenate(
        [edges.reshape(P, 9).astype(I32),
         zattr.astype(I32).reshape(P, 3),
         jnp.zeros((P, 4), I32)],
        axis=1)                                     # (P, 16)
    p = jnp.maximum(tile_pids, 0)
    out = rec[p]                                    # (T, M, 16)
    valid = (tile_pids >= 0).astype(I32)
    return out.at[:, :, 12].set(valid)


def _make_kernel(om, shade_z: bool, tile_logsize: int, scissor,
                 num_prims: int, fused: bool = False,
                 blend_slots: int = 0):
    ts = 1 << tile_logsize
    ns = (ts * ts) // LANES
    left, top, right, bottom = scissor
    ds_active = om.ds.depth_enabled or om.ds.stencil_enabled(False)
    # fused shading (VERDICT #5): also carry the WINNER's interpolation
    # gradients (dx, dy — draw3d/kernel.cpp:25-35) out of the kernel, so
    # pass 2 skips the per-pixel edges[win] gather and the whole edge
    # re-evaluation; bit-exact because the incremental edge eval here is
    # identical mod 2^32 to the direct a*x+b*y+c evaluation
    need_grad = fused or (ds_active and shade_z)
    K = blend_slots

    def kernel(origin_ref, prim_ref, fbds_ref, dsw_ref, *out_refs):
        # constant lane grids: local x/y per flattened pixel index
        idx = (jax.lax.broadcasted_iota(I32, (ns, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(I32, (ns, LANES), 1))
        xl_c = jnp.bitwise_and(idx, ts - 1)
        yl_c = jnp.right_shift(idx, tile_logsize)

        t = pl.program_id(0)
        ox = origin_ref[t, 0]
        oy = origin_ref[t, 1]
        xs = xl_c + ox
        ys = yl_c + oy
        in_scissor = ((xs >= left) & (xs < right)
                      & (ys >= top) & (ys < bottom))

        dsw_ref[0] = fbds_ref[0]
        if K > 0:
            # slotted (blend) carry: per-pixel slot list + write count,
            # the in-kernel twin of ops.deferred._visibility_tiles'
            # blend_slots path (om_unit.cpp:158-333 ordered writes)
            slots_ref, cnt_ref = out_refs
            slots_ref[0] = jnp.full((K, ns, LANES), -1, I32)
            cnt_ref[0] = jnp.zeros((ns, LANES), I32)
            k_iota = jax.lax.broadcasted_iota(I32, (K, ns, LANES), 0)
        else:
            win_ref = out_refs[0]
            win_ref[0] = jnp.full((ns, LANES), -1, I32)
            if fused:
                dx_ref, dy_ref = out_refs[1], out_refs[2]
                dx_ref[0] = jnp.zeros((ns, LANES), I32)
                dy_ref[0] = jnp.zeros((ns, LANES), I32)

        def step(i, _):
            r = prim_ref[0, i]                       # (16,) record row
            valid = r[12] > 0

            # incremental edge eval: base scalar + a*xl + b*yl lane grids
            def edge(k):
                a, b, c = r[3 * k], r[3 * k + 1], r[3 * k + 2]
                base = a * ox + b * oy + c
                return a * xl_c + b * yl_c + base

            e0 = edge(0)
            e1 = edge(1)
            e2 = edge(2)
            cov = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                   & in_scissor & valid)

            if need_grad:
                # GRADIENTS (draw3d/kernel.cpp:25-35): f32 barycentrics
                f0 = fixed.fixed_to_float(e0, fixed.ATTR_FRAC)
                f1 = fixed.fixed_to_float(e1, fixed.ATTR_FRAC)
                f2 = fixed.fixed_to_float(e2, fixed.ATTR_FRAC)
                rcp = jnp.float32(1.0) / ((f0 + f1) + f2)
                dx = fixed.to_fixed_x86(rcp * f0, fixed.ATTR_FRAC)
                dy = fixed.to_fixed_x86(rcp * f1, fixed.ATTR_FRAC)

            if ds_active:
                if shade_z:
                    tmp = fixed.imadd24(r[9], dx, r[11])
                    z = fixed.imadd24(r[10], dy, tmp)
                else:
                    z = jnp.zeros_like(e0)           # shader DEFAULTS z=0
                # exact test + masked ds write, shared with the XLA twin
                new_dsw, upd = om_merger.ds_carry_update(
                    om, z.astype(U32), cov, dsw_ref[0])
                dsw_ref[0] = new_dsw
            else:
                upd = cov
            if K > 0:
                cnt = cnt_ref[0]
                onehot = (k_iota == cnt[None]) & upd[None]
                slots_ref[0] = jnp.where(onehot, i, slots_ref[0])
                cnt_ref[0] = cnt + upd.astype(I32)
            else:
                win_ref[0] = jnp.where(upd, i, win_ref[0])
                if fused:
                    dx_ref[0] = jnp.where(upd, dx, dx_ref[0])
                    dy_ref[0] = jnp.where(upd, dy, dy_ref[0])
            return 0

        jax.lax.fori_loop(0, num_prims, step, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("om", "shade_z", "tile_logsize", "scissor",
                     "interpret", "fused", "blend_slots"))
def _visibility_call(prim_records, fb_ds_tiles, origins, *, om, shade_z,
                     tile_logsize, scissor, interpret, fused=False,
                     blend_slots=0):
    T, M, _ = prim_records.shape
    ts = 1 << tile_logsize
    ns = (ts * ts) // LANES
    K = blend_slots
    fb_flat = fb_ds_tiles.reshape(T, ns, LANES)

    kernel = _make_kernel(om, shade_z, tile_logsize, scissor, M,
                          fused=fused, blend_slots=K)

    tile_spec = pl.BlockSpec((1, ns, LANES), lambda t, _: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    if K > 0:
        slot_spec = pl.BlockSpec((1, K, ns, LANES),
                                 lambda t, _: (t, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = (tile_spec, slot_spec, tile_spec)
        out_shape = (jax.ShapeDtypeStruct((T, ns, LANES), jnp.uint32),
                     jax.ShapeDtypeStruct((T, K, ns, LANES), jnp.int32),
                     jax.ShapeDtypeStruct((T, ns, LANES), jnp.int32))
    else:
        n_out = 4 if fused else 2
        out_specs = (tile_spec,) * n_out
        out_shape = (jax.ShapeDtypeStruct((T, ns, LANES), jnp.uint32),
                     jax.ShapeDtypeStruct((T, ns, LANES), jnp.int32))
        if fused:
            out_shape += (jax.ShapeDtypeStruct((T, ns, LANES), jnp.int32),
                          jax.ShapeDtypeStruct((T, ns, LANES), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,           # origins (T, 2) live in SMEM
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, M, 16), lambda t, _: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(origins.astype(I32), prim_records, fb_flat)

    if K > 0:
        dsw, slots, cnt = out
        return (dsw.reshape(T, ts, ts), slots.reshape(T, K, ts, ts),
                cnt.reshape(T, ts, ts))
    return tuple(o.reshape(T, ts, ts) for o in out)


def supported(render_state, tile_logsize: int) -> bool:
    """The Pallas path needs >=128 pixels per tile (lane alignment)."""
    ts = 1 << tile_logsize
    return (ts * ts) % LANES == 0


def _slot_to_pid(tile_pids, slot_idx):
    """Per-tile record indices -> global pids (-1 preserved)."""
    slot = jnp.maximum(slot_idx, 0)
    T = slot.shape[0]
    pid = jnp.take_along_axis(
        jnp.asarray(tile_pids), slot.reshape(T, -1), axis=1
    ).reshape(slot.shape)
    return jnp.where(slot_idx >= 0, pid, -1)


def visibility_tiles(render_state, edges, zattr, tile_pids, tile_xy,
                     fb_ds_tiles, tile_logsize, interpret=False,
                     fused=False, blend_slots=0):
    """Drop-in replacement for ops.deferred._visibility_tiles.

    blend_slots == 0: returns (dsw (T,ts,ts) u32, winner pid (T,ts,ts) i32
    with -1 = none); fused=True additionally returns the winner's
    interpolation gradients (dx, dy) (T,ts,ts) i32 fixed24, letting pass 2
    skip the per-pixel edge gather + re-evaluation
    (ops.deferred._shade_pixels grads=).

    blend_slots == K: the slotted carry for blended draws
    (om_unit.cpp:158-333) — returns (dsw, slots (T,K,ts,ts) i32 pids in
    submission order (-1 empty), cnt (T,ts,ts) i32 passing-fragment
    count), matching the XLA twin exactly."""
    recs = pack_prim_records(jnp.asarray(edges), jnp.asarray(zattr),
                             jnp.asarray(tile_pids))
    ts = 1 << tile_logsize
    origins = jnp.asarray(tile_xy, I32) * ts
    out = _visibility_call(
        recs, fb_ds_tiles, origins,
        om=render_state.om,
        shade_z=render_state.flags.depth_enabled,
        tile_logsize=tile_logsize,
        scissor=tuple(render_state.scissor),
        interpret=interpret,
        fused=fused,
        blend_slots=blend_slots,
    )
    if blend_slots > 0:
        dsw, slots, cnt = out
        return dsw, _slot_to_pid(jnp.asarray(tile_pids), slots), cnt
    dsw, win_slot = out[0], out[1]
    # slot -> pid (slots are per-tile indices into tile_pids)
    win = _slot_to_pid(jnp.asarray(tile_pids), win_slot)
    if fused:
        return dsw, win, out[2], out[3]
    return dsw, win
