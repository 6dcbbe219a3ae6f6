"""Depth + stencil test, exact port of graphics.cpp:320-364,530-596.

The depth-stencil buffer packs 24-bit depth (low) + 8-bit stencil (high) in
one uint32.  All compare funcs / stencil ops are static per drawcall (they
come from the OM DCR block), so they resolve to straight-line vector code at
trace time.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import constants as C

U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class DepthStencilState:
    """Configured DepthTencil (graphics.cpp:534-562)."""
    depth_func: int
    depth_writemask: bool
    stencil_front_func: int
    stencil_front_zpass: int
    stencil_front_zfail: int
    stencil_front_fail: int
    stencil_front_ref: int
    stencil_front_mask: int
    stencil_back_func: int
    stencil_back_zpass: int
    stencil_back_zfail: int
    stencil_back_fail: int
    stencil_back_ref: int
    stencil_back_mask: int

    @property
    def depth_enabled(self) -> bool:
        # enable inference: graphics.cpp:553
        return not (self.depth_func == C.OM_DEPTH_FUNC_ALWAYS
                    and not self.depth_writemask)

    def stencil_enabled(self, is_backface: bool) -> bool:
        f, zp, zf = ((self.stencil_back_func, self.stencil_back_zpass,
                      self.stencil_back_zfail) if is_backface else
                     (self.stencil_front_func, self.stencil_front_zpass,
                      self.stencil_front_zfail))
        return not (f == C.OM_DEPTH_FUNC_ALWAYS
                    and zp == C.OM_STENCIL_OP_KEEP
                    and zf == C.OM_STENCIL_OP_KEEP)


def compare(func: int, a, b):
    """DoCompare (graphics.cpp:320-341) — unsigned compare, static func."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    if func == C.OM_DEPTH_FUNC_NEVER:
        return jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), bool)
    if func == C.OM_DEPTH_FUNC_LESS:
        return a < b
    if func == C.OM_DEPTH_FUNC_EQUAL:
        return a == b
    if func == C.OM_DEPTH_FUNC_LEQUAL:
        return a <= b
    if func == C.OM_DEPTH_FUNC_GREATER:
        return a > b
    if func == C.OM_DEPTH_FUNC_NOTEQUAL:
        return a != b
    if func == C.OM_DEPTH_FUNC_GEQUAL:
        return a >= b
    if func == C.OM_DEPTH_FUNC_ALWAYS:
        return jnp.ones(jnp.broadcast_shapes(a.shape, b.shape), bool)
    raise ValueError(f"bad depth func {func}")


def stencil_op(op: int, ref, val):
    """DoStencilOp (graphics.cpp:343-364), static op."""
    ref = jnp.asarray(ref, U32)
    val = jnp.asarray(val, U32)
    if op == C.OM_STENCIL_OP_KEEP:
        return val
    if op == C.OM_STENCIL_OP_ZERO:
        return jnp.zeros_like(val)
    if op == C.OM_STENCIL_OP_REPLACE:
        return jnp.broadcast_to(ref, val.shape)
    if op == C.OM_STENCIL_OP_INCR:
        return jnp.where(val < 0xFF, val + 1, val)
    if op == C.OM_STENCIL_OP_DECR:
        return jnp.where(val > 0, val - 1, val)
    if op == C.OM_STENCIL_OP_INVERT:
        return jnp.bitwise_not(val)
    if op == C.OM_STENCIL_OP_INCR_WRAP:
        return jnp.bitwise_and(val + 1, 0xFF)
    if op == C.OM_STENCIL_OP_DECR_WRAP:
        return jnp.bitwise_and(val - 1, 0xFF)
    raise ValueError(f"bad stencil op {op}")


def test(state: DepthStencilState, is_backface: bool, depth, dst_depthstencil):
    """DepthTencil::test (graphics.cpp:564-596), vectorized.

    depth: uint32 per-pixel depth (full register; masked to 24 bits here);
    dst_depthstencil: uint32 buffer values.
    Returns (passed bool, depthstencil_result uint32).
    """
    depth = jnp.asarray(depth, U32)
    dst = jnp.asarray(dst_depthstencil, U32)

    depth_val = jnp.bitwise_and(dst, C.OM_DEPTH_MASK)
    stencil_val = jnp.right_shift(dst, C.OM_DEPTH_BITS)
    depth_ref = jnp.bitwise_and(depth, C.OM_DEPTH_MASK)

    if is_backface:
        s_func, s_ref, s_mask = (state.stencil_back_func,
                                 state.stencil_back_ref,
                                 state.stencil_back_mask)
        op_zpass, op_zfail, op_fail = (state.stencil_back_zpass,
                                       state.stencil_back_zfail,
                                       state.stencil_back_fail)
    else:
        s_func, s_ref, s_mask = (state.stencil_front_func,
                                 state.stencil_front_ref,
                                 state.stencil_front_mask)
        op_zpass, op_zfail, op_fail = (state.stencil_front_zpass,
                                       state.stencil_front_zfail,
                                       state.stencil_front_fail)

    sref_m = jnp.uint32(s_ref & s_mask)
    sval_m = jnp.bitwise_and(stencil_val, jnp.uint32(s_mask))

    s_passed = compare(s_func, sref_m, sval_m)
    d_passed = compare(state.depth_func, depth_ref, depth_val)
    passed = s_passed & d_passed

    # select which stencil op applies per pixel, then apply all three
    # statically and blend with where (ops are static; pixels select)
    r_zpass = stencil_op(op_zpass, s_ref, stencil_val)
    r_zfail = stencil_op(op_zfail, s_ref, stencil_val)
    r_fail = stencil_op(op_fail, s_ref, stencil_val)
    stencil_result = jnp.where(
        s_passed, jnp.where(d_passed, r_zpass, r_zfail), r_fail
    )

    result = jnp.bitwise_or(
        jnp.left_shift(stencil_result, C.OM_DEPTH_BITS), depth_ref
    )
    return passed, result
