"""Tile-parallel sharding tests on the virtual 8-device CPU mesh
(SURVEY §4.4 config-space sweeps: mesh shapes instead of core counts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes
from skybox_rt_tpu.parallel import mesh as mesh_mod
from skybox_rt_tpu.parallel import tile_shard


def _scene(width=64, height=64, tile_logsize=4):
    params, indices = scenes.triangle()
    params = {k: jnp.asarray(v) for k, v in params.items()}
    cfg = pipeline.DiffRenderConfig(width=width, height=height,
                                    tile_logsize=tile_logsize)
    static = dbin.bin_static(np.asarray(params["pos"]), indices,
                             width, height, tile_logsize=tile_logsize)
    return params, static, cfg


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_sharded_render_matches_single_device(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    params, static, cfg = _scene()

    ref = np.asarray(pipeline.render(
        params, {k: jnp.asarray(v) for k, v in static.items()}, cfg))

    mesh = mesh_mod.make_mesh(n_devices)
    sharded = tile_shard.shard_tiles(static, n_devices)
    render = jax.jit(tile_shard.make_sharded_render(mesh, cfg))
    got = np.asarray(render(params, sharded))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_training_step_converges():
    """Inverse rendering: recover vertex colors from a target image,
    sharded over 8 devices with psum'd gradients."""
    n = min(8, len(jax.devices()))
    params, static, cfg = _scene()
    mesh = mesh_mod.make_mesh(n)
    sharded = tile_shard.shard_tiles(static, n)

    # target rendered with the true colors
    target_img = np.asarray(pipeline.render(
        params, {k: jnp.asarray(v) for k, v in static.items()}, cfg))
    ts = 1 << cfg.tile_logsize
    target_tiles = tile_shard.gather_target_tiles(
        target_img.reshape(-1, target_img.shape[1], 4)[: cfg.height],
        sharded["tile_xy"], cfg.tile_logsize,
    )

    # start from wrong colors
    bad = dict(params)
    bad["color"] = jnp.full_like(params["color"], 0.25)

    step = tile_shard.make_train_step(mesh, cfg, lr=1e-4,
                                      trainable=('color',))
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    tt = jnp.asarray(target_tiles)

    losses = []
    p = bad
    for _ in range(250):
        p, loss, _ = step(p, arrays, tt)
        losses.append(float(loss))

    assert losses[-1] < losses[0] * 0.05, losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()


def test_mesh_helpers():
    m = mesh_mod.make_mesh(2)
    assert m.devices.shape == (2,)
    arr = np.arange(10).reshape(5, 2)
    padded = mesh_mod.pad_to_multiple(arr, 4, axis=0, fill=-1)
    assert padded.shape == (8, 2)
    assert (padded[5:] == -1).all()


def test_scaling_harness():
    """Scaling sweep harness runs across mesh sizes and reports
    speedup/efficiency (numbers on the virtual CPU mesh are not
    performance claims — the API contract is what's tested)."""
    from skybox_rt_tpu.parallel import scaling

    results = scaling.measure(mesh_sizes=[1, 2], size=64, iters=2, warmup=1)
    assert set(results) == {1, 2}
    assert results[1]["efficiency"] == 1.0
    for r in results.values():
        assert r["ms"] > 0 and np.isfinite(r["speedup"])


def test_sharded_render_2d_mesh():
    """hosts x chips 2D mesh (mesh.make_mesh_2d): tiles stripe over BOTH
    axes and psums reduce over both — frame identical to single-device
    (SURVEY §2.8 multi-host DP shape, validated on the CPU mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    params, static, cfg = _scene()
    ref = np.asarray(pipeline.render(
        params, {k: jnp.asarray(v) for k, v in static.items()}, cfg))

    mesh = mesh_mod.make_mesh_2d(2, 4)
    sharded = tile_shard.shard_tiles(static, 8)
    render = jax.jit(tile_shard.make_sharded_render(mesh, cfg))
    got = np.asarray(render(params, sharded))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_train_step_2d_mesh_matches_1d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    params, static, cfg = _scene()
    sharded = tile_shard.shard_tiles(static, 8)
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    target_img = np.asarray(pipeline.render(
        params, {k: jnp.asarray(v) for k, v in static.items()}, cfg))
    tt = jnp.asarray(tile_shard.gather_target_tiles(
        target_img, sharded["tile_xy"], cfg.tile_logsize))
    bad = dict(params)
    bad["color"] = jnp.full_like(params["color"], 0.25)

    p1, l1, _ = tile_shard.make_train_step(mesh_mod.make_mesh(8), cfg)(
        bad, arrays, tt)
    p2, l2, _ = tile_shard.make_train_step(mesh_mod.make_mesh_2d(2, 4), cfg)(
        bad, arrays, tt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p1, p2)


def test_draw_shard_2d_mesh_golden():
    """Exact-int draw3d path striped over a 2D mesh stays bit-exact."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from skybox_rt_tpu.geom import cgltrace
    from skybox_rt_tpu.parallel import draw_shard
    from skybox_rt_tpu.ref import driver

    trace = cgltrace.load_cached(cgltrace.trace_path("triangle"))
    ref = np.asarray(driver.render_trace(trace, 64, 64))
    mesh = mesh_mod.make_mesh_2d(2, 4)
    got = np.asarray(draw_shard.render_trace_sharded(trace, 64, 64, mesh))
    np.testing.assert_array_equal(got, ref)
