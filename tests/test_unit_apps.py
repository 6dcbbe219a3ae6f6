"""Standalone unit-app goldens — tex/om/raster regression analogs
(SURVEY §3.6, §4.1): format sweep f0-f6, filter sweep g0-g2, OM whitebox,
raster coverage, against the reference's checked-in golden PNGs."""
import numpy as np
import pytest
from PIL import Image

from skybox_rt_tpu.apps import om_app, raster_app, tex_app
from skybox_rt_tpu.core import constants as C
from skybox_rt_tpu.utils import image

TEX = "/root/reference/tests/regression/tex"
OM = "/root/reference/tests/regression/om"
RASTER = "/root/reference/tests/regression/raster"


def _load_rgba(path):
    return np.asarray(Image.open(path).convert("RGBA"), np.uint8)


def _golden_argb(path):
    return image.load_png_argb(path)


def _compare_topdown(got_argb, golden_path, tolerance=1):
    golden = _golden_argb(golden_path)
    assert got_argb.shape == golden.shape

    def chans(x):
        return np.stack([(x >> s) & 0xFF for s in (24, 16, 8, 0)],
                        -1).astype(np.int32)

    diff = np.abs(chans(got_argb.astype(np.uint32)) - chans(golden)).max(-1)
    return int((diff > tolerance).sum()), int(diff.max())


FORMATS = [
    (0, C.TEX_FORMAT_A8R8G8B8), (1, C.TEX_FORMAT_R5G6B5),
    (2, C.TEX_FORMAT_A1R5G5B5), (3, C.TEX_FORMAT_A4R4G4B4),
    (4, C.TEX_FORMAT_A8L8), (5, C.TEX_FORMAT_L8), (6, C.TEX_FORMAT_A8),
]


@pytest.mark.parametrize("fnum,fmt", FORMATS)
def test_tex_format_sweep(fnum, fmt):
    """ci/regression.sh.in tex(): -itoad.png -rtoad_ref_fN.png -fN -g0"""
    rgba = _load_rgba(f"{TEX}/toad.png")
    out = tex_app.run(rgba, fmt=fmt, filter_g=0)
    errors, maxd = _compare_topdown(out, f"{TEX}/toad_ref_f{fnum}.png")
    assert errors == 0, (errors, maxd)


@pytest.mark.parametrize("g", [0, 1, 2])
@pytest.mark.parametrize("img", ["soccer", "palette4", "palette16",
                                 "palette64"])
def test_tex_filter_sweep(img, g):
    """-i{img}.png -r{img}_ref_gN.png -gN"""
    rgba = _load_rgba(f"{TEX}/{img}.png")
    out = tex_app.run(rgba, filter_g=g)
    errors, maxd = _compare_topdown(out, f"{TEX}/{img}_ref_g{g}.png")
    assert errors == 0, (errors, maxd)


@pytest.mark.parametrize("size", [8, 16, 32, 64, 128])
def test_om_whitebox(size):
    """om app default run fills white; golden whitebox_N.png."""
    fb = om_app.run(size, size)
    errors, maxd = image.compare_to_golden(fb, f"{OM}/whitebox_{size}.png")
    assert errors == 0 and maxd == 0


def test_om_blend_bands():
    """Blend-enabled mode: SRC_A/ONE_MINUS_SRC_A over black clear.
    No golden in the snapshot; verify against the closed-form result:
    band alpha a -> channel value round-div255 of a*0xFF."""
    fb = om_app.run(64, 64, blend_enable=True, num_tasks=16)
    tile_h = 4
    alpha_step = np.float32(255.0) / np.float32(tile_h)
    for task in range(16):
        a = int(np.float32(task) * alpha_step) & 0xFF
        got = fb[task * tile_h, 0]
        r = (int(got) >> 16) & 0xFF
        # blended channel: Div255(src*srcA + dst*(255-srcA)), dst=0,
        # with the +0x80 rounding bias (graphics.h Div255)
        expect = (0xFF * a) + 0x80
        expect = (expect + (expect >> 8)) >> 8
        assert r == expect, (task, a, r, expect)


@pytest.mark.parametrize("size", [16, 32, 64, 128])
def test_raster_triangle(size):
    """raster app: -ttriangle.cgltrace -rtriangle_ref_N.png"""
    fb = raster_app.run(f"{RASTER}/triangle.cgltrace", size, size)
    errors, maxd = image.compare_to_golden(
        fb, f"{RASTER}/triangle_ref_{size}.png")
    assert errors == 0 and maxd == 0


def test_multi_stage_texture_units():
    """Two bound stages with different formats sample independently
    (the VX_TEX_STAGE_COUNT surface; vx_intrinsics.h:100-105)."""
    import jax.numpy as jnp

    from skybox_rt_tpu.texture import convert, mipmap, units
    from skybox_rt_tpu.texture import sampler as sampler_mod

    rgba = _load_rgba(f"{TEX}/toad.png")

    def make_stage(fmt):
        texels2d = convert.rgba_to_texels(rgba, fmt)
        level0 = convert.texels_to_bytes(texels2d, fmt)
        chain, offs = mipmap.generate_mipmaps(level0, fmt, rgba.shape[1],
                                              rgba.shape[0])
        st = sampler_mod.TextureState(
            format=fmt, log_width=6, log_height=6,
            filter=C.TEX_FILTER_POINT, wrap_u=C.TEX_WRAP_CLAMP,
            wrap_v=C.TEX_WRAP_CLAMP, mip_offsets=tuple(offs))
        return st, jnp.asarray(sampler_mod.make_texel_array(fmt, chain))

    st0, tex0 = make_stage(C.TEX_FORMAT_A8R8G8B8)
    st1, tex1 = make_stage(C.TEX_FORMAT_L8)
    u = units.bind(st0, st1)

    # center texel, fixed23 coords
    uu = jnp.full((4,), 1 << 22, jnp.int32)
    vv = jnp.full((4,), 1 << 22, jnp.int32)
    c0 = np.asarray(units.sample(u, (tex0, tex1), 0, uu, vv))
    c1 = np.asarray(units.sample(u, (tex0, tex1), 1, uu, vv))
    # stage 0 is full-color; stage 1 is grayscale of the red channel
    r0 = (c0[0] >> 16) & 0xFF
    assert ((c1[0] >> 16) & 0xFF) == ((c1[0] >> 8) & 0xFF) == (c1[0] & 0xFF)
    assert ((c1[0] >> 16) & 0xFF) == r0

    with pytest.raises(ValueError):
        units.bind(st0, st1, st0)      # > STAGE_COUNT
    with pytest.raises(ValueError):
        units.bind(st0, None).state(1)


def test_multitex_app_modulates_stages():
    """Two-stage tex app (tex_app.run_multitex): stage0 x stage1 with
    Div255 rounding, oracled by composing two single-stage runs on the
    host — wires texture.units through a whole app path."""
    rgba0 = _load_rgba(f"{TEX}/toad.png")
    rng = np.random.default_rng(5)
    rgba1 = rng.integers(0, 256, size=rgba0.shape).astype(np.uint8)

    got = tex_app.run_multitex(rgba0, rgba1)

    s0 = tex_app.run(rgba0, filter_g=1, scale=1.0).astype(np.uint64)
    s1 = tex_app.run(rgba1, filter_g=1, scale=1.0).astype(np.uint64)

    def chans(x):
        return np.stack([(x >> s) & 0xFF for s in (24, 16, 8, 0)], -1)

    prod = chans(s0) * chans(s1) + 0x80
    ref_ch = (prod + (prod >> 8)) >> 8          # cocogfx Div255
    ref = (ref_ch[..., 0] << 24) | (ref_ch[..., 1] << 16) \
        | (ref_ch[..., 2] << 8) | ref_ch[..., 3]
    np.testing.assert_array_equal(got, ref.astype(np.uint32))
