"""Bucketed gradient-psum overlap machinery (parallel.overlap) on the
virtual 8-device CPU mesh.

What is checkable here: numerical equality of bucketed vs per-leaf psums,
and the compiled module containing exactly the expected collective count
(the bucketing actually happened).  Actual start/done overlap timing needs
a real multi-chip slice — collective_schedule_report is the tool for that
(PERF.md records the finding)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes
from skybox_rt_tpu.parallel import mesh as mesh_mod
from skybox_rt_tpu.parallel import overlap, tile_shard


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": jnp.asarray(rng.normal(size=(33, 4)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(7,)).astype(np.float32)),
        "c": jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32)),
        "d": jnp.asarray(rng.normal(size=(1,)).astype(np.float32)),
    }


@pytest.mark.parametrize("n_buckets", [1, 2, 3, 10])
def test_bucketed_psum_matches_per_leaf(n_buckets):
    n = min(8, len(jax.devices()))
    mesh = mesh_mod.make_mesh(n)
    tree = _tree()
    stacked = jax.tree.map(
        lambda x: jnp.stack([x * (i + 1) for i in range(n)]), tree)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("tiles"),),
                       out_specs=P(), check_vma=False)
    def bucketed(t):
        local = jax.tree.map(lambda x: x[0], t)
        return overlap.bucketed_psum(local, "tiles", n_buckets)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("tiles"),),
                       out_specs=P(), check_vma=False)
    def per_leaf(t):
        local = jax.tree.map(lambda x: x[0], t)
        return jax.tree.map(lambda g: jax.lax.psum(g, "tiles"), local)

    got = bucketed(stacked)
    ref = per_leaf(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        got, ref)


def test_schedule_report_on_scheduled_hlo_fixture():
    """collective_schedule_report proven against a REAL-format scheduled
    HLO dump (VERDICT r2 #6): async all-reduce pairs with array-typed AND
    tuple-typed start results, overlapped and back-to-back."""
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "scheduled_hlo_async.txt")
    text = open(path).read()
    assert overlap.count_all_reduces(text) == 3
    report = dict(overlap.collective_schedule_report(text))
    # gaps = instructions the scheduler placed between start and done
    assert report["%all-reduce-start.1"] == 4     # overlapped
    assert report["%all-reduce-start.2"] == 2     # tuple-shaped result
    assert report["%all-reduce-start.3"] == 0     # no overlap
    assert len(report) == 3


def test_bucketed_psum_mixed_dtypes_native():
    """Buckets are grouped by dtype (ADVICE r2): bf16/i32 leaves reduce in
    their NATIVE dtype — bitwise equal to a per-leaf psum, not an f32
    round-trip."""
    n = min(8, len(jax.devices()))
    mesh = mesh_mod.make_mesh(n)
    rng = np.random.default_rng(5)
    tree = {
        "f": jnp.asarray(rng.normal(size=(17,)).astype(np.float32)),
        "h": jnp.asarray(rng.normal(size=(9, 3)).astype(np.float32)
                         ).astype(jnp.bfloat16),
        "i": jnp.asarray(rng.integers(0, 100, size=(5,)).astype(np.int32)),
    }
    stacked = jax.tree.map(
        lambda x: jnp.stack([x * (i + 1) for i in range(n)]), tree)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("tiles"),),
                       out_specs=P(), check_vma=False)
    def bucketed(t):
        local = jax.tree.map(lambda x: x[0], t)
        return overlap.bucketed_psum(local, "tiles", 2)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P("tiles"),),
                       out_specs=P(), check_vma=False)
    def per_leaf(t):
        local = jax.tree.map(lambda x: x[0], t)
        return jax.tree.map(lambda g: jax.lax.psum(g, "tiles"), local)

    got = bucketed(stacked)
    ref = per_leaf(stacked)
    for k in tree:
        assert got[k].dtype == ref[k].dtype == tree[k].dtype, k
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_bucket_count_in_lowered_hlo():
    """The lowered module (pre-combiner) contains exactly n_buckets
    gradient all-reduces (+1 for the loss scalar); the compiled module
    contains at least one (XLA's combiner may merge further — on this
    CPU backend it tuples them into a single op, which is itself the
    overlap-friendly form)."""
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("collectives elided on 1 device")
    params, indices = scenes.triangle()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    cfg = pipeline.DiffRenderConfig(width=32, height=32, tile_logsize=4)
    static = dbin.bin_static(np.asarray(params["pos"]), indices, 32, 32,
                             tile_logsize=4)
    mesh = mesh_mod.make_mesh(n)
    sharded = tile_shard.shard_tiles(static, n)
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    tt = jnp.zeros((sharded["tile_xy"].shape[0], 16, 16, 4), jnp.float32)

    n_leaves = len(jax.tree.leaves(params))
    assert n_leaves >= 3
    # +1 loss psum, +1 max_writes pmax (the overflow indicator)
    for n_buckets, expect in [(2, 2 + 2), (0, n_leaves + 2)]:
        step = tile_shard.make_train_step(mesh, cfg,
                                          grad_buckets=n_buckets)
        lowered = jax.jit(step).lower(params, arrays, tt)
        assert overlap.count_all_reduces(lowered.as_text()) == expect, (
            n_buckets, overlap.count_all_reduces(lowered.as_text()))
        assert overlap.count_all_reduces(lowered.compile().as_text()) >= 1


def test_train_step_bucketed_matches_unbucketed():
    n = min(8, len(jax.devices()))
    params, indices = scenes.triangle()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    cfg = pipeline.DiffRenderConfig(width=32, height=32, tile_logsize=4)
    static = dbin.bin_static(np.asarray(params["pos"]), indices, 32, 32,
                             tile_logsize=4)
    mesh = mesh_mod.make_mesh(n)
    sharded = tile_shard.shard_tiles(static, n)
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    target_img = np.asarray(pipeline.render(
        params, {k: jnp.asarray(v) for k, v in static.items()}, cfg))
    tt = jnp.asarray(tile_shard.gather_target_tiles(
        target_img, sharded["tile_xy"], cfg.tile_logsize))

    bad = dict(params)
    bad["color"] = jnp.full_like(params["color"], 0.25)
    p_b, loss_b, _ = tile_shard.make_train_step(mesh, cfg, grad_buckets=3)(
        bad, arrays, tt)
    p_u, loss_u, _ = tile_shard.make_train_step(mesh, cfg, grad_buckets=0)(
        bad, arrays, tt)
    np.testing.assert_allclose(float(loss_b), float(loss_u), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-5,
                                                atol=1e-7),
        p_b, p_u)


def test_schedule_report_parser():
    hlo = "\n".join([
        "%ar0 = f32[8]{0} all-reduce-start(%g0), replica_groups={}",
        "%mul = f32[8]{0} multiply(%x, %y)",
        "%add = f32[8]{0} add(%mul, %y)",
        "%d0 = f32[8]{0} all-reduce-done(%ar0)",
    ])
    rep = overlap.collective_schedule_report(hlo)
    assert rep == [("%ar0", 2)]
    assert overlap.count_all_reduces(hlo) == 1


@pytest.mark.parametrize("n_buckets", [1, 3])
def test_two_level_psum_matches_flat(n_buckets):
    """2-level (ICI reduce-scatter -> DCN all-reduce -> ICI all-gather)
    equals a flat psum over both axes.  Integer-valued f32 data makes the
    comparison EXACT (addition-order independent), proving the
    decomposition reduces every element exactly once per device."""
    if len(jax.devices()) < 4:
        pytest.skip("need a 2x2 mesh")
    mesh = mesh_mod.make_mesh_2d(2, min(len(jax.devices()), 8) // 2)
    axes = tuple(mesh.axis_names)
    n = int(np.prod(mesh.devices.shape))
    rng = np.random.default_rng(9)
    tree = {
        "a": jnp.asarray(rng.integers(-50, 50, size=(33, 4))
                         .astype(np.float32)),
        "b": jnp.asarray(rng.integers(-50, 50, size=(7,))
                         .astype(np.float32)),
        "c": jnp.asarray(rng.integers(-50, 50, size=(16, 16, 4))
                         .astype(np.float32)),
    }
    stacked = jax.tree.map(
        lambda x: jnp.stack([x * (i + 1) for i in range(n)]).reshape(
            mesh.devices.shape + x.shape), tree)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(*axes),), out_specs=P(),
                       check_vma=False)
    def two_level(t):
        local = jax.tree.map(lambda x: x[0, 0], t)
        return overlap.two_level_psum(local, dcn_axis=axes[0],
                                      ici_axis=axes[1],
                                      n_buckets=n_buckets)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(*axes),), out_specs=P(),
                       check_vma=False)
    def flat(t):
        local = jax.tree.map(lambda x: x[0, 0], t)
        return jax.tree.map(lambda g: jax.lax.psum(g, axes), local)

    got = two_level(stacked)
    ref = flat(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        got, ref)


def test_two_level_psum_per_axis_collectives_in_hlo():
    """The lowered HLO shows the per-axis split: reduce-scatter +
    all-gather (ICI axis) and a separate all-reduce (DCN shard) — the
    SURVEY §2.8 artifact that distinguishes this from a flat psum."""
    if len(jax.devices()) < 4:
        pytest.skip("need a 2x2 mesh")
    mesh = mesh_mod.make_mesh_2d(2, 2)
    axes = tuple(mesh.axis_names)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(*axes),),
                       out_specs=P(), check_vma=False)
    def two_level(x):
        return overlap.two_level_psum(
            {"g": x[0, 0]}, dcn_axis=axes[0], ici_axis=axes[1])["g"]

    x = jnp.zeros((2, 2, 64), jnp.float32)
    text = jax.jit(two_level).lower(x).as_text()
    assert ("reduce_scatter" in text) or ("reduce-scatter" in text), text
    assert ("all_gather" in text) or ("all-gather" in text)
    assert overlap.count_all_reduces(text) >= 1      # the DCN stage


def test_train_step_two_level_matches_flat():
    """End-to-end: the 2-D-mesh training step with grad_collective=
    'two_level' matches the flat-psum step (loss + params)."""
    if len(jax.devices()) < 4:
        pytest.skip("need a 2x2 mesh")
    n = min(len(jax.devices()), 8)
    mesh = mesh_mod.make_mesh_2d(2, n // 2)
    params, indices = scenes.triangle()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    cfg = pipeline.DiffRenderConfig(width=32, height=32, tile_logsize=4)
    static = dbin.bin_static(np.asarray(params["pos"]), indices, 32, 32,
                             tile_logsize=4)
    sharded = tile_shard.shard_tiles(static, n)
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    tt = jnp.zeros((sharded["tile_xy"].shape[0], 16, 16, 4), jnp.float32)

    bad = dict(params)
    bad["color"] = jnp.full_like(params["color"], 0.25)
    p_2l, loss_2l, _ = tile_shard.make_train_step(
        mesh, cfg, grad_collective="two_level")(bad, arrays, tt)
    p_fl, loss_fl, _ = tile_shard.make_train_step(
        mesh, cfg)(bad, arrays, tt)
    np.testing.assert_allclose(float(loss_2l), float(loss_fl), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-5,
                                                atol=1e-7),
        p_2l, p_fl)
