"""Color blending: 15 blend funcs, 6 blend modes, 16 logic ops.

Exact port of graphics.cpp:366-524,600-636 on unpacked uint32 ARGB channels.
The ``Div255`` rounding helper uses the (v + (v>>8)) >> 8 identity which,
combined with the caller's +0x80 bias, yields correctly rounded /255 for
v <= 0xFF00 (cocogfx color.hpp).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import constants as C

U32 = jnp.uint32
I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class BlendState:
    """Configured Blender (graphics.cpp:603-620)."""
    mode_rgb: int
    mode_a: int
    src_rgb: int
    src_a: int
    dst_rgb: int
    dst_a: int
    const_color: int
    logic_op: int

    @property
    def enabled(self) -> bool:
        return not (self.mode_rgb == C.OM_BLEND_MODE_ADD
                    and self.mode_a == C.OM_BLEND_MODE_ADD
                    and self.src_rgb == C.OM_BLEND_FUNC_ONE
                    and self.src_a == C.OM_BLEND_FUNC_ONE
                    and self.dst_rgb == C.OM_BLEND_FUNC_ZERO
                    and self.dst_a == C.OM_BLEND_FUNC_ZERO)


def _unpack(color):
    c = jnp.asarray(color, U32)
    return (c >> 24, (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)  # a r g b


def div255(v):
    """Rounded unsigned /255 given the caller's +0x80 bias (cocogfx Div255)."""
    v = jnp.asarray(v, U32)
    return (v + (v >> 8)) >> 8


def blend_func(func: int, src, dst, cst):
    """DoBlendFunc (graphics.cpp:405-475).  src/dst/cst are (a,r,g,b) tuples
    of uint32 arrays; returns an (a,r,g,b) tuple."""
    sa, sr, sg, sb = src
    da, dr, dg, db = dst
    ca, cr, cg, cb = cst
    full = jnp.broadcast_to(jnp.uint32(0xFF), jnp.shape(sa))
    zero = jnp.zeros_like(sa)
    if func == C.OM_BLEND_FUNC_ZERO:
        return (zero, zero, zero, zero)
    if func == C.OM_BLEND_FUNC_ONE:
        return (full, full, full, full)
    if func == C.OM_BLEND_FUNC_SRC_RGB:
        return (sa, sr, sg, sb)
    if func == C.OM_BLEND_FUNC_ONE_MINUS_SRC_RGB:
        # NOTE: faithful to the reference, whose ONE_MINUS_SRC_RGB alpha
        # slot is 0xff - src.a (graphics.cpp:418-424)
        return (0xFF - sa, 0xFF - sr, 0xFF - sg, 0xFF - sb)
    if func == C.OM_BLEND_FUNC_DST_RGB:
        return (da, dr, dg, db)
    if func == C.OM_BLEND_FUNC_ONE_MINUS_DST_RGB:
        return (0xFF - da, 0xFF - dr, 0xFF - dg, 0xFF - db)
    if func == C.OM_BLEND_FUNC_SRC_A:
        return (sa, sa, sa, sa)
    if func == C.OM_BLEND_FUNC_ONE_MINUS_SRC_A:
        v = 0xFF - sa
        return (v, v, v, v)
    if func == C.OM_BLEND_FUNC_DST_A:
        return (da, da, da, da)
    if func == C.OM_BLEND_FUNC_ONE_MINUS_DST_A:
        v = 0xFF - da
        return (v, v, v, v)
    if func == C.OM_BLEND_FUNC_CONST_RGB:
        return (ca, cr, cg, cb)
    if func == C.OM_BLEND_FUNC_ONE_MINUS_CONST_RGB:
        return (0xFF - ca, 0xFF - cr, 0xFF - cg, 0xFF - cb)
    if func == C.OM_BLEND_FUNC_CONST_A:
        return (ca, ca, ca, ca)
    if func == C.OM_BLEND_FUNC_ONE_MINUS_CONST_A:
        # faithful reference quirk: uses cst r/g/b, not a (graphics.cpp:463-469)
        return (0xFF - ca, 0xFF - cr, 0xFF - cg, 0xFF - cb)
    if func == C.OM_BLEND_FUNC_ALPHA_SAT:
        factor = jnp.minimum(sa, 0xFF - da)
        return (full, factor, factor, factor)
    raise ValueError(f"bad blend func {func}")


def logic_op(op: int, src, dst):
    """DoLogicOp (graphics.cpp:366-403) on packed uint32."""
    src = jnp.asarray(src, U32)
    dst = jnp.asarray(dst, U32)
    ops = {
        C.OM_LOGIC_OP_CLEAR: lambda: jnp.zeros_like(src),
        C.OM_LOGIC_OP_AND: lambda: src & dst,
        C.OM_LOGIC_OP_AND_REVERSE: lambda: src & ~dst,
        C.OM_LOGIC_OP_COPY: lambda: src,
        C.OM_LOGIC_OP_AND_INVERTED: lambda: ~src & dst,
        C.OM_LOGIC_OP_NOOP: lambda: dst,
        C.OM_LOGIC_OP_XOR: lambda: src ^ dst,
        C.OM_LOGIC_OP_OR: lambda: src | dst,
        C.OM_LOGIC_OP_NOR: lambda: ~(src | dst),
        C.OM_LOGIC_OP_EQUIV: lambda: ~(src ^ dst),
        C.OM_LOGIC_OP_INVERT: lambda: ~dst,
        C.OM_LOGIC_OP_OR_REVERSE: lambda: src | ~dst,
        C.OM_LOGIC_OP_COPY_INVERTED: lambda: ~src,
        C.OM_LOGIC_OP_OR_INVERTED: lambda: ~src | dst,
        C.OM_LOGIC_OP_NAND: lambda: ~(src & dst),
        C.OM_LOGIC_OP_SET: lambda: jnp.full_like(src, 0xFFFFFFFF),
    }
    return ops[op]()


def _blend_mode(mode: int, lop: int, src, dst, s, d, src_packed, dst_packed):
    """DoBlendMode (graphics.cpp:477-524) per channel tuple."""
    sa, sr, sg, sb = src
    da, dr, dg, db = dst
    fsa, fsr, fsg, fsb = s
    fda, fdr, fdg, fdb = d

    def add(x, fx, y, fy):
        return div255(jnp.minimum(x * fx + y * fy + 0x80, 0xFF00))

    def sub(x, fx, y, fy):
        # max(int, 0): operands are unsigned products; do in int32 then clamp
        v = (x * fx).astype(I32) - (y * fy).astype(I32) + 0x80
        return div255(jnp.maximum(v, 0).astype(U32))

    if mode == C.OM_BLEND_MODE_ADD:
        return tuple(add(x, fx, y, fy) for x, fx, y, fy in
                     zip(src, s, dst, d))
    if mode == C.OM_BLEND_MODE_SUB:
        return tuple(sub(x, fx, y, fy) for x, fx, y, fy in
                     zip(src, s, dst, d))
    if mode == C.OM_BLEND_MODE_REV_SUB:
        return tuple(sub(y, fy, x, fx) for x, fx, y, fy in
                     zip(src, s, dst, d))
    if mode == C.OM_BLEND_MODE_MIN:
        return tuple(jnp.minimum(x, y) for x, y in zip(src, dst))
    if mode == C.OM_BLEND_MODE_MAX:
        return tuple(jnp.maximum(x, y) for x, y in zip(src, dst))
    if mode == C.OM_BLEND_MODE_LOGICOP:
        packed = logic_op(lop, src_packed, dst_packed)
        return _unpack(packed)
    raise ValueError(f"bad blend mode {mode}")


def blend(state: BlendState, src_color, dst_color):
    """Blender::blend (graphics.cpp:622-636) on packed uint32 ARGB arrays."""
    src = _unpack(src_color)
    dst = _unpack(dst_color)
    cst = _unpack(jnp.uint32(state.const_color))
    cst = tuple(jnp.broadcast_to(c, jnp.shape(src[0])) for c in cst)

    s_rgb = blend_func(state.src_rgb, src, dst, cst)
    s_a = blend_func(state.src_a, src, dst, cst)
    d_rgb = blend_func(state.dst_rgb, src, dst, cst)
    d_a = blend_func(state.dst_a, src, dst, cst)
    rgb = _blend_mode(state.mode_rgb, state.logic_op, src, dst, s_rgb, d_rgb,
                      src_color, dst_color)
    a = _blend_mode(state.mode_a, state.logic_op, src, dst, s_a, d_a,
                    src_color, dst_color)
    # result = (a.a, rgb.r, rgb.g, rgb.b)
    return ((jnp.asarray(a[0], U32) << 24)
            | (jnp.asarray(rgb[1], U32) << 16)
            | (jnp.asarray(rgb[2], U32) << 8)
            | jnp.asarray(rgb[3], U32))
