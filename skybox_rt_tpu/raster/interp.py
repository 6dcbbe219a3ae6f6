"""Barycentric gradients and fixed24 attribute interpolation.

Port of the draw3d shader's per-stamp math (draw3d/kernel.cpp:25-59),
vectorized per pixel:

  GRADIENTS: the raw fixed16 edge values are *reinterpreted* as fixed24
  (the kernel reads the raster CSRs into FloatA), converted to float32,
  and the barycentric ratios dx = e0/(e0+e1+e2), dy = e1/(...) are formed
  in float32 and truncated back to fixed24.

  INTERPOLATE: dst = ((x*dx)>>24 + z) + ((y*dy)>>24)  on int32.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import fixed

F32 = jnp.float32
I32 = jnp.int32


def gradients(evals):
    """Per-pixel barycentric ratios (dx, dy) in fixed24.

    evals: (3, ...) int32 raw edge values.
    Mirrors GRADIENTS_HW_i (kernel.cpp:25-35): float32 conversion of the
    int32 data scaled by 2^-24, float32 reciprocal of the (F0+F1)+F2 sum,
    truncating float->fixed24 conversion (x86 cvttss2si semantics for
    out-of-range handled in fixed.to_fixed_x86).
    """
    f0 = fixed.fixed_to_float(evals[0], fixed.ATTR_FRAC)
    f1 = fixed.fixed_to_float(evals[1], fixed.ATTR_FRAC)
    f2 = fixed.fixed_to_float(evals[2], fixed.ATTR_FRAC)
    r = F32(1.0) / ((f0 + f1) + f2)
    dx = fixed.to_fixed_x86(r * f0, fixed.ATTR_FRAC)
    dy = fixed.to_fixed_x86(r * f1, fixed.ATTR_FRAC)
    return dx, dy


def interpolate(attr, dx, dy):
    """Interpolate one attribute plane over pixels.

    attr: (3,) int32 fixed24 (dx-coef, dy-coef, c); dx/dy: (...) int32.
    Returns (...) int32 fixed24.  INTERPOLATE_i, kernel.cpp:56-59.
    """
    attr = jnp.asarray(attr, I32)
    tmp = fixed.imadd24(attr[0], dx, attr[2])
    return fixed.imadd24(attr[1], dy, tmp)


def to_rgba8(r, g, b, a):
    """fixed24 color channels -> packed ARGB8888 (TO_RGBA_i, kernel.cpp:67-71).

    Channel math is ``uint8((data * 255) >> 24)`` with int32 wraparound and
    arithmetic shift — 1.0 (data=2^24) maps to 255 via the wrap + truncation.
    """
    def chan(c):
        v = jnp.asarray(c, I32) * jnp.int32(255)     # wraps like C int32
        return jnp.bitwise_and(jnp.right_shift(v, 24), 0xFF).astype(jnp.uint32)

    return ((chan(a) << 24) | (chan(r) << 16) | (chan(g) << 8) | chan(b))


def modulate(r, g, b, a, tex_argb):
    """Combine vertex color (fixed24) with texel (ARGB8888 uint32).

    MODULATE_i (kernel.cpp:61-65): channel = (data * texchan) >> 24, uint8.
    """
    tex = jnp.asarray(tex_argb, jnp.uint32)
    ta = jnp.right_shift(tex, 24).astype(I32)
    tr = jnp.bitwise_and(jnp.right_shift(tex, 16), 0xFF).astype(I32)
    tg = jnp.bitwise_and(jnp.right_shift(tex, 8), 0xFF).astype(I32)
    tb = jnp.bitwise_and(tex, 0xFF).astype(I32)

    def chan(c, t):
        v = jnp.asarray(c, I32) * t                  # int32 wrap
        return jnp.bitwise_and(jnp.right_shift(v, 24), 0xFF).astype(jnp.uint32)

    return ((chan(a, ta) << 24) | (chan(r, tr) << 16)
            | (chan(g, tg) << 8) | chan(b, tb))
