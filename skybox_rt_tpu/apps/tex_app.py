"""Texture-unit demo app — tests/regression/tex analog.

Replicates the reference host+kernel (tex/main.cpp + tex/kernel.cpp):
load an image, convert to a texel format, build the mip chain, then
sample every destination pixel at (x+0.5)/w, (y+0.5)/h through the
sampler, with the host's lod/frac selection (main.cpp "minification"
fixed16 math) and the kernel's filter modes:

  g0: point     g1: bilinear     g2: two-lod bilinear + Lerp8888(frac)

Output is (H, W) uint32 ARGB in framebuffer row order (row 0 = bottom,
the reference saves with negative pitch — tex/main.cpp:196-197 analog is
draw3d; the tex app itself saves top-down, handled by the caller).
"""
from __future__ import annotations

import numpy as np

from ..core import constants as C
from ..texture import convert, mipmap
from ..texture import sampler as sampler_mod

F32 = np.float32


def _log2floor(x: int) -> int:
    return max(x.bit_length() - 1, 0)


def run(rgba: np.ndarray, fmt: int = C.TEX_FORMAT_A8R8G8B8,
        filter_g: int = 0, wrap: int = C.TEX_WRAP_CLAMP,
        scale: float = 1.0) -> np.ndarray:
    """rgba: (H, W, 4) uint8 top-down source image (power-of-two dims).
    Returns (dst_h, dst_w) uint32 ARGB, top-down (matches the goldens)."""
    import jax.numpy as jnp

    src_h, src_w = rgba.shape[:2]
    assert (src_w & (src_w - 1)) == 0 and (src_h & (src_h - 1)) == 0

    texels2d = convert.rgba_to_texels(rgba, fmt)
    level0 = convert.texels_to_bytes(texels2d, fmt)
    chain, mip_offsets = mipmap.generate_mipmaps(level0, fmt, src_w, src_h)
    texels = sampler_mod.make_texel_array(fmt, chain)

    log_w = _log2floor(src_w)      # pow2-checked above: log2ceil == log2floor
    log_h = _log2floor(src_h)

    dst_w = int(src_w * scale)
    dst_h = int(src_h * scale)

    # host lod selection (tex/main.cpp:206-218): fixed16 minification
    width_ratio = F32(1 << log_w) / F32(dst_w)
    height_ratio = F32(1 << log_h) / F32(dst_h)
    minification = max(width_ratio, height_ratio)
    j = int(np.trunc(F32(max(minification, F32(1.0))) * F32(1 << 16)))
    lod = min(_log2floor(j) - 16, C.TEX_LOD_MAX)
    frac = (j - (1 << (lod + 16))) >> (lod + 16 - 8)

    st = sampler_mod.TextureState(
        format=fmt, log_width=log_w, log_height=log_h,
        filter=(C.TEX_FILTER_BILINEAR if filter_g else C.TEX_FILTER_POINT),
        wrap_u=wrap, wrap_v=wrap, mip_offsets=tuple(mip_offsets))

    # kernel u/v generation (tex/kernel.cpp:62-66): float32 pixel centers
    # cast to fixed23 with TFixed truncation
    dx = F32(1.0) / F32(dst_w)
    dy = F32(1.0) / F32(dst_h)
    fu = (np.arange(dst_w, dtype=F32) + F32(0.5)) * dx
    fv = (np.arange(dst_h, dtype=F32) + F32(0.5)) * dy
    xu = np.trunc(fu * F32(1 << C.TEX_FXD_FRAC)).astype(np.int64).astype(np.int32)
    xv = np.trunc(fv * F32(1 << C.TEX_FXD_FRAC)).astype(np.int64).astype(np.int32)
    uu = jnp.asarray(np.broadcast_to(xu[None, :], (dst_h, dst_w)))
    vv = jnp.asarray(np.broadcast_to(xv[:, None], (dst_h, dst_w)))

    texels_j = jnp.asarray(texels)
    color = sampler_mod.sample(st, texels_j, uu, vv, lod=lod)
    if filter_g == 2:
        lodn = min(lod + 1, C.TEX_LOD_MAX)
        c1 = sampler_mod.sample(st, texels_j, uu, vv, lod=lodn)
        l0, h0 = (color & 0x00FF00FF), ((color >> 8) & 0x00FF00FF)
        l1, h1 = (c1 & 0x00FF00FF), ((c1 >> 8) & 0x00FF00FF)
        cl = sampler_mod.lerp8888(l0, l1, np.uint32(frac))
        ch = sampler_mod.lerp8888(h0, h1, np.uint32(frac))
        color = sampler_mod.pack8888(cl, ch)
    return np.asarray(color, np.uint32)


def run_multitex(rgba0: np.ndarray, rgba1: np.ndarray,
                 fmt: int = C.TEX_FORMAT_A8R8G8B8,
                 wrap: int = C.TEX_WRAP_CLAMP) -> np.ndarray:
    """Two-stage sampling through texture.units (the vx_tex(stage, ...)
    surface, VX_TEX_STAGE_COUNT=2): stage 0 modulated by stage 1
    (lightmap-style), channelwise Div255 multiply (cocogfx Mul8888 as
    used by the blender's color-factor path, graphics.cpp:600-620).
    Sources may have different power-of-two sizes; each stage samples at
    its own bilinear-centered u/v.  Returns (H0, W0) uint32 ARGB."""
    import jax.numpy as jnp

    from ..om.blend import div255
    from ..texture import units as units_mod

    states = []
    texel_arrays = []
    for rgba in (rgba0, rgba1):
        h, w = rgba.shape[:2]
        assert (w & (w - 1)) == 0 and (h & (h - 1)) == 0
        texels2d = convert.rgba_to_texels(rgba, fmt)
        level0 = convert.texels_to_bytes(texels2d, fmt)
        chain, mip_offsets = mipmap.generate_mipmaps(level0, fmt, w, h)
        states.append(sampler_mod.TextureState(
            format=fmt, log_width=_log2floor(w), log_height=_log2floor(h),
            filter=C.TEX_FILTER_BILINEAR, wrap_u=wrap, wrap_v=wrap,
            mip_offsets=tuple(mip_offsets)))
        texel_arrays.append(jnp.asarray(sampler_mod.make_texel_array(fmt,
                                                                     chain)))
    units = units_mod.bind(*states)

    dst_h, dst_w = rgba0.shape[:2]
    fu = (np.arange(dst_w, dtype=F32) + F32(0.5)) / F32(dst_w)
    fv = (np.arange(dst_h, dtype=F32) + F32(0.5)) / F32(dst_h)
    xu = np.trunc(fu * F32(1 << C.TEX_FXD_FRAC)).astype(np.int64).astype(
        np.int32)
    xv = np.trunc(fv * F32(1 << C.TEX_FXD_FRAC)).astype(np.int64).astype(
        np.int32)
    uu = jnp.asarray(np.broadcast_to(xu[None, :], (dst_h, dst_w)))
    vv = jnp.asarray(np.broadcast_to(xv[:, None], (dst_h, dst_w)))

    c0 = units_mod.sample(units, texel_arrays, 0, uu, vv, lod=0)
    c1 = units_mod.sample(units, texel_arrays, 1, uu, vv, lod=0)

    def chan(shift):
        a = jnp.bitwise_and(jnp.right_shift(c0, shift), 0xFF)
        b = jnp.bitwise_and(jnp.right_shift(c1, shift), 0xFF)
        return jnp.left_shift(div255(a * b + 0x80), shift)

    out = chan(24) | chan(16) | chan(8) | chan(0)
    return np.asarray(out, np.uint32)
