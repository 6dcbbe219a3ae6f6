"""Quad-table bilinear fast path (texture.sampler.quad) — bit-exactness
vs the 4-gather reference sampler across formats, wraps, and boundary
coordinates (the zero-weight corner cases quad_supported's argument
relies on are exactly where divergence would show)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.core import constants as C
from skybox_rt_tpu.texture import mipmap, sampler

FORMATS = [C.TEX_FORMAT_A8R8G8B8, C.TEX_FORMAT_R5G6B5, C.TEX_FORMAT_A1R5G5B5,
           C.TEX_FORMAT_A4R4G4B4, C.TEX_FORMAT_A8L8, C.TEX_FORMAT_L8,
           C.TEX_FORMAT_A8]
WRAPS = [C.TEX_WRAP_CLAMP, C.TEX_WRAP_REPEAT]
ONE = 1 << C.TEX_FXD_FRAC


def _states_and_texels(fmt, wrap_u, wrap_v, log_w=4, log_h=3):
    rng = np.random.default_rng(fmt * 10 + wrap_u * 2 + wrap_v)
    w, h = 1 << log_w, 1 << log_h
    stride = C.TEX_FORMAT_STRIDE[fmt]
    pixels = rng.integers(0, 256, size=w * h * stride, dtype=np.uint8)
    chain, offsets = mipmap.generate_mipmaps(pixels, fmt, w, h)
    st = sampler.TextureState(
        format=fmt, log_width=log_w, log_height=log_h,
        filter=C.TEX_FILTER_BILINEAR, wrap_u=wrap_u, wrap_v=wrap_v,
        mip_offsets=tuple(offsets))
    flat = sampler.make_texel_array(fmt, chain)
    quad = sampler.make_texel_quad_array(st, flat)
    st_q = dataclasses.replace(st, quad=True)
    return st, jnp.asarray(flat), st_q, jnp.asarray(quad)


def _coords(log_w, log_h, n=4096, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(-ONE, 2 * ONE, size=n, dtype=np.int64).astype(np.int32)
    v = rng.integers(-ONE, 2 * ONE, size=n, dtype=np.int64).astype(np.int32)
    # boundary-dense: texel edges +- {0,1,half-texel} in both axes
    dx = (ONE >> 1) >> log_w
    dy = (ONE >> 1) >> log_h
    edges_u = np.concatenate([
        np.arange(0, ONE, ONE >> log_w, dtype=np.int64) + o
        for o in (0, 1, -1, dx, -dx, dx - 1, -dx + 1)])
    edges_v = np.concatenate([
        np.arange(0, ONE, ONE >> log_h, dtype=np.int64) + o
        for o in (0, 1, -1, dy, -dy, dy - 1, -dy + 1)])
    k = min(len(edges_u), len(edges_v))
    u = np.concatenate([u, edges_u[:k].astype(np.int32),
                        np.full(k, 7 << 10, np.int32)])
    v = np.concatenate([v, np.full(k, 5 << 10, np.int32),
                        edges_v[:k].astype(np.int32)])
    return jnp.asarray(u), jnp.asarray(v)


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("wrap", WRAPS)
def test_quad_bilinear_bit_exact(fmt, wrap):
    st, flat, st_q, quad = _states_and_texels(fmt, wrap, wrap)
    u, v = _coords(st.log_width, st.log_height, seed=fmt)
    ref = np.asarray(sampler.sample(st, flat, u, v, lod=0))
    got = np.asarray(sampler.sample(st_q, quad, u, v, lod=0))
    np.testing.assert_array_equal(got, ref)


def test_quad_mixed_wraps_and_lods():
    st, flat, st_q, quad = _states_and_texels(
        C.TEX_FORMAT_A8R8G8B8, C.TEX_WRAP_REPEAT, C.TEX_WRAP_CLAMP)
    for lod in range(len(st.mip_offsets)):
        u, v = _coords(max(st.log_width - lod, 0),
                       max(st.log_height - lod, 0), seed=100 + lod)
        ref = np.asarray(sampler.sample(st, flat, u, v, lod=lod))
        got = np.asarray(sampler.sample(st_q, quad, u, v, lod=lod))
        np.testing.assert_array_equal(got, ref, err_msg=f"lod {lod}")


def test_mirror_not_quad_supported():
    st = sampler.TextureState(
        format=C.TEX_FORMAT_L8, log_width=3, log_height=3,
        filter=C.TEX_FILTER_BILINEAR, wrap_u=C.TEX_WRAP_MIRROR,
        wrap_v=C.TEX_WRAP_REPEAT, mip_offsets=(0,))
    assert not sampler.quad_supported(st)
    assert sampler.quad_supported(
        dataclasses.replace(st, wrap_u=C.TEX_WRAP_REPEAT))
    assert not sampler.quad_supported(
        dataclasses.replace(st, filter=C.TEX_FILTER_POINT))


def test_driver_quad_optin_bit_exact(monkeypatch):
    """SKYBOX_QUAD=1 switches the driver's texture binding to the quad
    table; a textured draw must stay bit-exact vs the flat default.
    (The driver defaults to flat since round 3: coherent-uv e2e measured
    the quad table 43x slower on chip — PERF.md.)"""
    import numpy as np

    from skybox_rt_tpu.core import constants as C
    from skybox_rt_tpu.core import state as state_mod
    from skybox_rt_tpu.geom import binning, cgltrace
    from skybox_rt_tpu.ops import deferred as deferred_mod
    from skybox_rt_tpu.ref import driver, renderer

    trace = cgltrace.load_cached(cgltrace.trace_path("tekkaman"))
    dc = trace.drawcalls[0]
    W = H = 64
    binned = binning.bin_drawcall(dc.pos, dc.indices, dc.color,
                                  dc.texcoord, W, H, dc.near, dc.far,
                                  C.RASTER_TILE_LOGSIZE)
    flags = state_mod.make_shader_flags(
        dc.states.depth_test, dc.states.color_enabled,
        dc.states.texture_enabled, dc.states.texture_envmode)
    om_state = state_mod.make_om_state(dc.states)
    fbc = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_COLOR, np.uint32),
        C.RASTER_TILE_LOGSIZE))
    fbd = jnp.asarray(renderer.pad_framebuffer(
        np.full((H, W), driver.CLEAR_DEPTH, np.uint32),
        C.RASTER_TILE_LOGSIZE))

    outs = {}
    for name, env in (("flat", "0"), ("quad", "1")):
        monkeypatch.setenv("SKYBOX_QUAD", env)
        tex_state, texels = driver.make_texture_binding(trace, dc,
                                                        dc.states)
        assert tex_state.quad == (env == "1")
        rs = state_mod.RenderState(flags=flags, om=om_state,
                                   tex=tex_state, scissor=(0, 0, W, H))
        c, d = deferred_mod.render_drawcall(rs, texels, binned, fbc, fbd)
        outs[name] = np.asarray(c)
    np.testing.assert_array_equal(outs["flat"], outs["quad"])
