"""Pallas TPU visibility kernel for the DIFFERENTIABLE pipeline.

The float twin of ops.pallas_raster: the hard-depth winner search that
dominates the training step (measured 20.8 of 31.7 ms/step at 512^2,
PERF.md round 3) is a pure per-tile reduction with no gradient flow —
visibility_slots stop_gradients its inputs and returns integers — so it
belongs in a kernel, not an XLA chunk scan.

Per grid program = one binned tile (ts*ts pixels as the native
(ts*ts/128, 128) vector shape), sequential loop over the tile's
primitives carrying (best_z, best_step):

  * depth_test: lexicographic-(z, step) min with strict `<` — the
    earliest submitted primitive wins z ties, exactly
    diff.pipeline.visibility_slots' hard rule (and render_tile_set's
    sequential `zp < fb_z`)
  * no depth test: last covered write wins (best_step = s when inside)

Exactness: the kernel re-evaluates the same float32 edge/barycentric/z
expressions as the XLA path (a*x+b*y+c, e/sum clamped at 1e-20,
z0*b0+z1*b1+z2*b2) elementwise on the VPU, so winners agree bit-for-bit
with per_tile_hard (asserted in tests/test_diff_pallas_vis.py, and the
deferred-vs-scan exactness tests hold unchanged on this engine).

Record layout, one row per (tile, prim) slot (lane-padded to 16):
   0..8   edge matrix [e][a, b, c]   float32
   9..11  z0, z1, z2 vertex depths   float32
   12     valid flag (1.0/0.0)
   13..15 zero padding
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


def supported(tile_logsize: int) -> bool:
    ts = 1 << tile_logsize
    return (ts * ts) % LANES == 0


def pack_prim_records(edges, z, tile_pids):
    """(P,3,3) f32 edges + (P,3) f32 z + (T,M) pids -> (T, M, 16) f32."""
    P = edges.shape[0]
    rec = jnp.concatenate(
        [edges.reshape(P, 9).astype(F32),
         z.astype(F32),
         jnp.zeros((P, 4), F32)],
        axis=1)                                     # (P, 16)
    p = jnp.maximum(tile_pids, 0)
    out = rec[p]                                    # (T, M, 16)
    valid = (tile_pids >= 0).astype(F32)
    return out.at[:, :, 12].set(valid)


GROUP = 8          # tiles per grid step (amortizes per-step grid overhead)


def _make_kernel(tile_logsize: int, num_prims: int, depth_test: bool,
                 group: int):
    ts = 1 << tile_logsize
    ns = (ts * ts) // LANES

    def kernel(origin_ref, prim_ref, step_ref):
        idx = (jax.lax.broadcasted_iota(I32, (ns, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(I32, (ns, LANES), 1))
        xl = jnp.bitwise_and(idx, ts - 1).astype(F32)
        yl = jnp.right_shift(idx, tile_logsize).astype(F32)

        g = pl.program_id(0)
        for i in range(group):                       # group tiles per step
            t = g * group + i
            ox = origin_ref[t, 0].astype(F32)
            oy = origin_ref[t, 1].astype(F32)
            xs = xl + ox
            ys = yl + oy

            step_ref[i] = jnp.full((ns, LANES), -1, I32)

            def body(s, best_z, i=i, xs=xs, ys=ys):
                r = prim_ref[i, s]                   # (16,) record row
                valid = r[12] > 0
                e0 = r[0] * xs + r[1] * ys + r[2]
                e1 = r[3] * xs + r[4] * ys + r[5]
                e2 = r[6] * xs + r[7] * ys + r[8]
                inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & valid
                if depth_test:
                    # identical float expressions to pipeline._barycentrics
                    den = e0 + e1 + e2
                    denom = jnp.where(jnp.abs(den) > 1e-20, den, 1e-20)
                    b0 = e0 / denom
                    b1 = e1 / denom
                    b2 = 1.0 - b0 - b1
                    zp = r[9] * b0 + r[10] * b1 + r[11] * b2
                    upd = inside & (zp < best_z)
                    best_z = jnp.where(upd, zp, best_z)
                else:
                    upd = inside
                step_ref[i] = jnp.where(upd, s, step_ref[i])
                return best_z

            jax.lax.fori_loop(0, num_prims, body,
                              jnp.full((ns, LANES), jnp.inf, F32))

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_logsize", "depth_test",
                                             "interpret"))
def _vis_call(prim_records, origins, *, tile_logsize, depth_test,
              interpret):
    T, M, _ = prim_records.shape
    ts = 1 << tile_logsize
    ns = (ts * ts) // LANES
    GB = GROUP
    Tp = -(-T // GB) * GB
    if Tp != T:                                     # pad: valid=0 -> all -1
        prim_records = jnp.concatenate(
            [prim_records, jnp.zeros((Tp - T, M, 16), F32)], axis=0)
        origins = jnp.concatenate(
            [origins, jnp.zeros((Tp - T, 2), origins.dtype)], axis=0)
    kernel = _make_kernel(tile_logsize, M, depth_test, GB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,           # origins (Tp, 2) live in SMEM
        grid=(Tp // GB,),
        in_specs=[pl.BlockSpec((GB, M, 16), lambda t, _: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((GB, ns, LANES), lambda t, _: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, ns, LANES), jnp.int32),
        interpret=interpret,
    )(origins.astype(I32), prim_records.astype(F32))
    return out[:T].reshape(T, ts, ts)


def visibility_hard(edges, z, tile_pids, origins, tile_logsize: int,
                    depth_test: bool, interpret: bool = False):
    """Hard-mode winner steps: (T, ts, ts) i32 step index into the tile's
    pid list (-1 = background).  Drop-in for the per_tile_hard scan in
    diff.pipeline.visibility_slots (inputs must already be
    stop_gradient'ed by the caller)."""
    recs = pack_prim_records(jnp.asarray(edges), jnp.asarray(z),
                             jnp.asarray(tile_pids))
    return _vis_call(recs, jnp.asarray(origins, I32),
                     tile_logsize=tile_logsize, depth_test=depth_test,
                     interpret=interpret)
