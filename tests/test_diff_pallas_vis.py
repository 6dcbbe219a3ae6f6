"""Pallas float visibility kernel (diff/pallas_vis) vs the XLA scan.

The kernel must reproduce visibility_slots' hard-mode winner steps
EXACTLY (same f32 edge/barycentric/z expressions, same lexicographic
(z, step) rule), so the deferred pipeline stays bit-equal to the scan
renderer on this engine.  Runs in Mosaic interpreter mode on the CPU
test mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.diff import binning as dbin
from skybox_rt_tpu.diff import pipeline
from skybox_rt_tpu.models import scenes


def _scene(n=40, seed=3, size=64, depth_test=True):
    rng = np.random.default_rng(seed)
    V = n * 3
    pos = np.zeros((V, 4), np.float32)
    pos[:, :2] = rng.uniform(-1.0, 1.0, (V, 2)).astype(np.float32)
    pos[:, 2] = np.repeat(rng.uniform(-0.5, 0.5, n), 3).astype(np.float32)
    pos[:, 3] = 1.0
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(
            rng.uniform(0.0, 1.0, (V, 4)).astype(np.float32)),
        "uv": jnp.asarray(rng.uniform(0.0, 1.0, (V, 2)).astype(np.float32)),
    }
    indices = np.arange(V, dtype=np.int32).reshape(n, 3)
    cfg = pipeline.DiffRenderConfig(width=size, height=size, tile_logsize=4,
                                    depth_test=depth_test)
    static = dbin.bin_static(pos, indices, size, size, tile_logsize=4)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    return params, static, cfg


@pytest.mark.parametrize("depth_test", [True, False])
@pytest.mark.parametrize("seed", [0, 3])
def test_winner_steps_match_xla(depth_test, seed):
    params, static, cfg = _scene(seed=seed, depth_test=depth_test)
    setup = pipeline.prim_setup(params, static["indices"], cfg)
    origins = static["tile_xy"] * (1 << cfg.tile_logsize)
    s_xla, m_xla = pipeline.visibility_slots(setup, static["tile_pids"],
                                             origins, cfg, engine="xla")
    s_pl, m_pl = pipeline.visibility_slots(setup, static["tile_pids"],
                                           origins, cfg, engine="pallas")
    np.testing.assert_array_equal(np.asarray(s_xla), np.asarray(s_pl))
    assert int(m_xla) == int(m_pl)
    assert (np.asarray(s_pl) >= 0).any()      # scene actually covers pixels


def test_deferred_pallas_engine_matches_xla_engine():
    """render_deferred(engine='pallas') is bit-equal to engine='xla'
    (identical shade program fed identical winner steps), and matches the
    scan renderer within float tolerance.  (Strict scan bit-equality is
    NOT asserted across engines: on dense random scenes the scan and
    deferred SHADE programs themselves fuse differently on CPU and differ
    in the last ulp — observed equally on the XLA engine.)"""
    params, static, cfg = _scene(n=25, seed=1)
    img_scan = np.asarray(pipeline.render(params, static, cfg))
    img_x, _ = pipeline.render_deferred(params, static, cfg, engine="xla")
    img_p, _ = pipeline.render_deferred(params, static, cfg,
                                        engine="pallas")
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img_p))
    np.testing.assert_allclose(np.asarray(img_p), img_scan,
                               rtol=1e-4, atol=1e-4)


def test_icosphere_textured_winners():
    verts, faces = scenes.icosphere(subdiv=2, radius=0.8)
    V = verts.shape[0]
    pos = np.concatenate([verts.astype(np.float32),
                          np.ones((V, 1), np.float32)], axis=1)
    pos[:, 2] = pos[:, 2] * 0.4 + 0.5
    rng = np.random.default_rng(0)
    params = {
        "pos": jnp.asarray(pos),
        "color": jnp.asarray(
            rng.uniform(0.2, 1.0, (V, 4)).astype(np.float32)),
        "uv": jnp.asarray(rng.uniform(0.0, 1.0, (V, 2)).astype(np.float32)),
        "tex": jnp.asarray(scenes.checkerboard_texture(16, 4)),
    }
    size = 64
    cfg = pipeline.DiffRenderConfig(width=size, height=size, tile_logsize=4,
                                    depth_test=True, textured=True,
                                    modulate=True)
    static = dbin.bin_static(pos, faces.astype(np.int32), size, size,
                             tile_logsize=4)
    static = {k: jnp.asarray(v) for k, v in static.items()}
    img_scan = np.asarray(pipeline.render(params, static, cfg))
    img_x, _ = pipeline.render_deferred(params, static, cfg, engine="xla")
    img_p, _ = pipeline.render_deferred(params, static, cfg,
                                        engine="pallas")
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img_p))
    np.testing.assert_allclose(np.asarray(img_p), img_scan,
                               rtol=1e-4, atol=1e-4)
