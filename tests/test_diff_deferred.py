"""Deferred differentiable pipeline (diff/pipeline.render_deferred).

The scan renderer (pipeline.render) is the semantic oracle: the deferred
two-pass path must match it exactly — forward values bit-equal (same f32
ops on the winning fragments) and gradients equal where both are defined.
This is the backward-pass speed path (VERDICT round-1 item 3): the
visibility scan is integer/stop-gradient so autodiff only traverses the
O(pixels*K) shading pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes
from skybox_rt_tpu.parallel import mesh as mesh_mod
from skybox_rt_tpu.parallel import tile_shard


def _overlap_scene(n=6, seed=0, size=64):
    """n random overlapping triangles with distinct depths."""
    rng = np.random.default_rng(seed)
    V = n * 3
    pos = np.zeros((V, 4), np.float32)
    xy = rng.uniform(-0.9, 0.9, (V, 2)).astype(np.float32)
    pos[:, :2] = xy
    pos[:, 2] = np.repeat(rng.uniform(-0.5, 0.5, n), 3).astype(np.float32)
    pos[:, 3] = 1.0
    color = rng.uniform(0.0, 1.0, (V, 4)).astype(np.float32)
    uv = rng.uniform(0.0, 1.0, (V, 2)).astype(np.float32)
    indices = np.arange(V, dtype=np.int32).reshape(n, 3)
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(color),
        "uv": jnp.asarray(uv),
    }
    return params, indices


def _build(cfg_kwargs, n=6, seed=0, size=64, slots=8):
    params, indices = _overlap_scene(n, seed, size)
    cfg = pipeline.DiffRenderConfig(width=size, height=size, tile_logsize=4,
                                    **cfg_kwargs)
    if cfg.textured:
        params["tex"] = jnp.asarray(scenes.checkerboard_texture(16, 4))
    static = dbin.bin_static(np.asarray(params["pos"]), indices, size, size,
                             tile_logsize=4, inflate_px=2)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    return params, static, cfg


MODES = [
    dict(depth_test=True),
    dict(depth_test=False),
    dict(depth_test=True, textured=True, modulate=True),
    dict(depth_test=True, alpha_blend=True),
    dict(depth_test=False, alpha_blend=True),
    dict(depth_test=True, soft_edge_temp=0.7),
    dict(depth_test=True, alpha_blend=True, soft_edge_temp=0.7,
         textured=True),
]


@pytest.mark.parametrize("mode", MODES,
                         ids=["hard", "nodepth", "tex", "blend",
                              "blend_nodepth", "soft", "soft_blend_tex"])
def test_deferred_forward_matches_scan(mode):
    params, static, cfg = _build(mode)
    ref = np.asarray(pipeline.render(params, static, cfg))
    img, maxw = pipeline.render_deferred(params, static, cfg, slots=8)
    assert int(maxw) <= 8, "slot overflow in test scene"
    # same f32 math on the same winning fragments; XLA fuses the two
    # programs differently (fma contraction), so allow ulp-level noise
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("mode", MODES,
                         ids=["hard", "nodepth", "tex", "blend",
                              "blend_nodepth", "soft", "soft_blend_tex"])
def test_deferred_grads_match_scan(mode):
    """Gradients of the deferred path == gradients of the scan renderer.

    Both paths use straight-through hard selects, so where the scan's
    gradient is defined the deferred gradient must agree (the winning
    fragment set is identical)."""
    params, static, cfg = _build(mode)

    def loss_scan(p):
        img = pipeline.render(p, static, cfg)
        return jnp.sum(img * jnp.cos(0.05 * jnp.arange(img.shape[1]))
                       [None, :, None])

    def loss_def(p):
        img, _ = pipeline.render_deferred(p, static, cfg, slots=8)
        return jnp.sum(img * jnp.cos(0.05 * jnp.arange(img.shape[1]))
                       [None, :, None])

    g_ref = jax.grad(loss_scan)(params)
    g_got = jax.grad(loss_def)(params)
    # soft-edge gradients route ulp-level forward noise through sigmoid'
    # and sum it over every covered pixel — wider tolerance there
    rtol = 1e-2 if mode.get("soft_edge_temp") else 1e-4
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_got[k]), np.asarray(g_ref[k]),
                                   rtol=rtol, atol=1e-4, err_msg=k)


def test_deferred_fd_gradients():
    """Direct FD validation of the deferred path (independent of the scan)."""
    params, static, cfg = _build(dict(depth_test=True))

    def loss(p):
        img, _ = pipeline.render_deferred(p, static, cfg, slots=8)
        return jnp.sum(img[..., :3] * jnp.cos(0.1 * jnp.arange(img.shape[1]))
                       [None, :, None])

    g = jax.grad(loss)(params)["color"]
    rng = np.random.default_rng(1)
    p0 = np.asarray(params["color"])
    for _ in range(4):
        idx = tuple(rng.integers(0, s) for s in p0.shape)
        eps = 1e-3
        pert = p0.copy(); pert[idx] += eps
        lp = float(loss({**params, "color": jnp.asarray(pert)}))
        pert = p0.copy(); pert[idx] -= eps
        lm = float(loss({**params, "color": jnp.asarray(pert)}))
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - float(g[idx])) <= 2e-2 * max(1.0, abs(fd))


def test_slot_overflow_reported():
    """Stacked coincident blended triangles overflow a tiny slot count and
    max_writes reports the true demand."""
    params, static, cfg = _build(dict(depth_test=False, alpha_blend=True),
                                 n=6)
    # stack all triangles on the same footprint so one pixel gets 6 writes
    pos = np.asarray(params["pos"]).copy()
    tri = np.array([[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]], np.float32)
    pos[:, :2] = np.tile(tri, (6, 1))
    params["pos"] = jnp.asarray(pos)
    indices = np.arange(18, dtype=np.int32).reshape(6, 3)
    static = dbin.bin_static(pos, indices, 64, 64, tile_logsize=4,
                             inflate_px=2)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    _, maxw = pipeline.render_deferred(params, static, cfg, slots=2)
    assert int(maxw) == 6
    img8, maxw8 = pipeline.render_deferred(params, static, cfg, slots=8)
    ref = np.asarray(pipeline.render(params, static, cfg))
    np.testing.assert_allclose(np.asarray(img8), ref, rtol=1e-5, atol=2e-5)


def test_sharded_deferred_train_step_matches_scan_step():
    """tile_shard.make_train_step(deferred=True) produces the same loss and
    updated params as the scan-based step on the 8-device mesh."""
    mesh = mesh_mod.make_mesh(4)
    params, indices = _overlap_scene(n=5, seed=3)
    cfg = pipeline.DiffRenderConfig(width=64, height=64, tile_logsize=4)
    static = dbin.bin_static(np.asarray(params["pos"]), indices, 64, 64,
                             tile_logsize=4)
    sharded = tile_shard.shard_tiles(static, 4)
    arrays = {k: jnp.asarray(v) for k, v in sharded.items()}
    target = np.zeros((sharded["tile_xy"].shape[0], 16, 16, 4), np.float32)

    step_d = tile_shard.make_train_step(mesh, cfg, lr=1e-3, deferred=True)
    step_s = tile_shard.make_train_step(mesh, cfg, lr=1e-3, deferred=False)
    pd, ld, maxw = step_d(params, arrays, jnp.asarray(target))
    ps, ls, _ = step_s(params, arrays, jnp.asarray(target))
    np.testing.assert_allclose(float(ld), float(ls), rtol=1e-6)
    # overflow indicator surfaced (ADVICE r2): hard config -> <= 1 write
    assert int(maxw) <= 8
    for k in pd:
        np.testing.assert_allclose(np.asarray(pd[k]), np.asarray(ps[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_kslot_multi_chunk_deep_overlap():
    """80 stacked triangles over one tile: the K-slot visibility's
    chunk-vectorized prefix rules (CH2=32) must carry count/running-min
    across chunk boundaries exactly like the sequential scan."""
    n = 80
    V = n * 3
    rng = np.random.default_rng(7)
    pos = np.zeros((V, 4), np.float32)
    # all triangles cover the tile center; z interleaved so depth-passing
    # writes land in many different chunks
    base = np.array([[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]], np.float32)
    for i in range(n):
        jit = rng.uniform(-0.05, 0.05, (3, 2)).astype(np.float32)
        pos[3 * i:3 * i + 3, :2] = base + jit
    pos[:, 2] = np.repeat(
        rng.permutation(np.linspace(-0.5, 0.5, n)).astype(np.float32), 3)
    pos[:, 3] = 1.0
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(rng.uniform(0, 1, (V, 4)).astype(np.float32)),
        "uv": jnp.asarray(rng.uniform(0, 1, (V, 2)).astype(np.float32)),
    }
    indices = np.arange(V, dtype=np.int32).reshape(n, 3)
    for kw in (dict(depth_test=True, alpha_blend=True),
               dict(depth_test=False, alpha_blend=True),
               dict(depth_test=True, soft_edge_temp=0.5)):
        cfg = pipeline.DiffRenderConfig(width=32, height=32,
                                        tile_logsize=4, **kw)
        static = dbin.bin_static(pos, indices, 32, 32, tile_logsize=4)
        static = {k: jnp.asarray(v) for k, v in static.items()}
        assert static["tile_pids"].shape[1] > 32   # multi-chunk for real
        img_scan = np.asarray(pipeline.render(params, static, cfg))
        img_def, maxw = pipeline.render_deferred(params, static, cfg,
                                                 slots=96)
        assert int(maxw) <= 96
        # a chunk-carry bug (wrong slot order / lost write / broken
        # running-min) composites different fragments -> O(0.1) errors
        # with these random colors; only last-ulp fusion rounding (the
        # known scan-vs-deferred effect on dense scenes) is tolerated
        np.testing.assert_allclose(img_scan, np.asarray(img_def),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", [
    dict(depth_test=True, alpha_blend=True),
    dict(depth_test=True, soft_edge_temp=0.7),
    dict(depth_test=False, alpha_blend=True),
], ids=["blend", "soft", "blend_nodepth"])
def test_auto_slots_exact(mode):
    """auto_slots (the diff twin of the int path's measured blend_k,
    VERDICT r3 #3): the measured slot count covers every pixel's writes,
    so the deferred render equals the scan renderer — at a fraction of
    the K=8 shade cost (K-proportional, PERF.md round 4)."""
    params, static, cfg = _build(mode)
    k = pipeline.auto_slots(params, static, cfg)
    assert k >= 2
    m = pipeline.measure_max_writes(params, static, cfg)
    assert k >= m
    ref = pipeline.render(params, static, cfg)
    got, maxw = pipeline.render_deferred(params, static, cfg, slots=k)
    assert int(maxw) == m            # the measurement is the true count
    # same tolerance as test_deferred_forward_matches_scan (XLA fuses
    # the two programs differently — fma contraction noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_auto_slots_hard_is_one():
    params, static, cfg = _build(dict(depth_test=True))
    assert pipeline.measure_max_writes(params, static, cfg) == 1
