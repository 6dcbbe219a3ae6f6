"""Mosaic lowering tier (VERDICT r4 #8): every Pallas kernel family is
LOWERED for a TPU target in CI, with no TPU present.

The standing suite runs all Pallas kernels in interpret mode on the CPU
mesh, so a kernel edit that breaks Mosaic lowering (lane-misaligned
blocks, illegal sublane shapes — the repo's own PERF.md catalogues how
easy those are to hit) would pass CI green and only fail on chip.
jax.export with platforms=["tpu"] runs the Pallas->Mosaic frontend
lowering (where those constraints are enforced) on any host backend, so
this tier turns them into test failures.  The negative control below
proves the tier actually checks: a deliberately lane-misaligned block
shape must FAIL to export.

Scope note: deeper Mosaic *backend* blow-ups (infer-vector-layout,
compile-time explosions) only surface in the on-chip XLA compile —
those remain covered by the chip scripts (scripts/rt_chip_bench.py,
raster_chip_parity.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from skybox_rt_tpu.geom import cgltrace
from skybox_rt_tpu.ops import pallas_rt
from skybox_rt_tpu.ref import driver
from skybox_rt_tpu.rt import bvh as bvh_mod

F32 = jnp.float32
I32 = jnp.int32


def _export_tpu(fn, *args):
    """Lower fn for a TPU target (no execution, no TPU needed)."""
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


# ---- shared tiny scene -------------------------------------------------

_rng = np.random.default_rng(0)
P, R = 100, 2048
V0 = _rng.uniform(-1, 1, (P, 3)).astype(np.float32)
E1 = _rng.uniform(-1, 1, (P, 3)).astype(np.float32)
E2 = _rng.uniform(-1, 1, (P, 3)).astype(np.float32)
O = _rng.uniform(-3, -2, (R, 3)).astype(np.float32)
D = (_rng.uniform(-1, 1, (R, 3)) + 1.5).astype(np.float32)


def _bvh():
    verts = np.stack([V0, V0 + E1, V0 + E2], 1).reshape(-1, 3)
    faces = np.arange(verts.shape[0]).reshape(-1, 3)
    return bvh_mod.build_sah(verts, faces)


BLOCKS = pallas_rt.prepare_bvh_blocks(
    jnp.asarray(V0), jnp.asarray(E1), jnp.asarray(E2),
    bvh_mod.build_block_set(_bvh(), tri_block=64))
CLUSTERS = bvh_mod.build_clusters(_bvh(), max_tris=64)


# ---- negative control --------------------------------------------------

def test_lowering_tier_catches_misaligned_blocks():
    """(1, 128) sublane blocks are Mosaic-illegal (PERF.md): the export
    MUST fail — otherwise this tier is not actually checking."""
    def add_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def bad(x):
        return pl.pallas_call(
            add_kernel, grid=(8,),
            in_specs=[pl.BlockSpec((1, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), F32))(x)

    with pytest.raises(Exception):
        _export_tpu(bad, jnp.zeros((8, 128), F32))


# ---- RT kernels --------------------------------------------------------

def test_lower_closest_hit_pallas():
    _export_tpu(lambda o, d: pallas_rt.closest_hit_pallas(
        o, d, jnp.asarray(V0), jnp.asarray(E1), jnp.asarray(E2)), O, D)


def test_lower_closest_hit_clustered():
    _export_tpu(lambda o, d: pallas_rt.closest_hit_clustered(
        o, d, jnp.asarray(V0), jnp.asarray(E1), jnp.asarray(E2),
        CLUSTERS), O, D)


def test_lower_any_hit_clustered():
    _export_tpu(lambda o, d: pallas_rt.any_hit_clustered(
        o, d, jnp.asarray(V0), jnp.asarray(E1), jnp.asarray(E2),
        CLUSTERS, t_max=2.0), O, D)


def test_lower_closest_hit_streamed():
    _export_tpu(lambda o, d: pallas_rt.closest_hit_streamed(
        o, d, jnp.asarray(V0), jnp.asarray(E1), jnp.asarray(E2),
        sub=2), O, D)


def test_lower_closest_hit_worklist():
    _export_tpu(lambda o, d: pallas_rt.closest_hit_worklist(
        o, d, jnp.asarray(V0), jnp.asarray(E1), jnp.asarray(E2),
        sub=2), O, D)


def test_lower_closest_hit_bvh():
    _export_tpu(lambda o, d: pallas_rt.closest_hit_bvh(
        o, d, BLOCKS, sub=2), O, D)


def test_lower_any_hit_bvh():
    _export_tpu(lambda o, d: pallas_rt.any_hit_bvh(
        o, d, BLOCKS, t_max=2.0, sub=2), O, D)


def test_lower_closest_hit_bvh_after():
    def after(o, d):
        wk = pallas_rt.bvh_worklists(o, d, BLOCKS, sub=2)
        tlo = jnp.full((R,), -jnp.inf, F32)
        slo = jnp.full((R,), -1, I32)
        return pallas_rt.closest_hit_bvh_after(BLOCKS, wk, tlo, slo)
    _export_tpu(after, O, D)


# ---- raster visibility kernels -----------------------------------------

def _raster_draw():
    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))
    draws = driver.prepare_drawcalls(trace, 64, 64)
    rs, _, b = draws[1]            # 755-prim textured draw
    return rs, b


def test_lower_raster_visibility_winner_and_fused():
    from skybox_rt_tpu.ops import pallas_raster
    rs, b = _raster_draw()
    ts = 1 << b.tile_logsize
    T = np.asarray(b.tile_xy).shape[0]
    fb_ds = jnp.zeros((T, ts, ts), jnp.uint32)

    for fused in (False, True):
        _export_tpu(lambda e, za, tp, txy, fb: pallas_raster.visibility_tiles(
            rs, e, za, tp, txy, fb, b.tile_logsize, fused=fused),
            jnp.asarray(b.edges), jnp.asarray(b.attribs[:, 0]),
            jnp.asarray(b.tile_pids), jnp.asarray(b.tile_xy), fb_ds)


def test_lower_raster_visibility_kslot():
    from skybox_rt_tpu.ops import pallas_raster
    rs, b = _raster_draw()
    ts = 1 << b.tile_logsize
    T = np.asarray(b.tile_xy).shape[0]
    fb_ds = jnp.zeros((T, ts, ts), jnp.uint32)
    _export_tpu(lambda e, za, tp, txy, fb: pallas_raster.visibility_tiles(
        rs, e, za, tp, txy, fb, b.tile_logsize, blend_slots=4),
        jnp.asarray(b.edges), jnp.asarray(b.attribs[:, 0]),
        jnp.asarray(b.tile_pids), jnp.asarray(b.tile_xy), fb_ds)


# ---- diff pipeline kernels ---------------------------------------------

def test_lower_diff_visibility_hard():
    from skybox_rt_tpu.diff import pallas_vis
    Pd, T, M, tls = 64, 4, 16, 5
    edges = jnp.asarray(_rng.normal(size=(Pd, 3, 3)).astype(np.float32))
    z = jnp.asarray(_rng.uniform(size=(Pd, 3)).astype(np.float32))
    tile_pids = jnp.asarray(
        _rng.integers(-1, Pd, size=(T, M)).astype(np.int32))
    origins = jnp.asarray((_rng.integers(0, 4, size=(T, 2)) * 32)
                          .astype(np.int32))
    _export_tpu(lambda e, zz, tp, og: pallas_vis.visibility_hard(
        e, zz, tp, og, tls, depth_test=True), edges, z, tile_pids, origins)


def test_lower_diff_texgrad_accumulate():
    from skybox_rt_tpu.diff import pallas_texgrad
    N, C, rows = 4096, 8, 256
    idx = jnp.asarray(_rng.integers(0, rows, size=(N,)).astype(np.int32))
    val = jnp.asarray(_rng.normal(size=(N, C)).astype(np.float32))
    _export_tpu(lambda i, v: pallas_texgrad.accumulate_rows(i, v, rows),
                idx, val)
