"""Exhaustive OM blend/stencil conformance — every blend func (15), blend
mode (6), logic op (16), stencil op (8), compare func (8) against an
independent numpy mirror of graphics.cpp:320-524 (the ISA-conformance-table
analog, SURVEY §4.5: no scene exercises logic ops or stencil, so these are
unit-level)."""
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.core import constants as C
from skybox_rt_tpu.om import blend as blend_mod
from skybox_rt_tpu.om import depth_stencil as ds_mod


def _rand_colors(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)


def _unpack_np(c):
    c = c.astype(np.uint32)
    return (c >> 24, (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)


def _div255(v):
    return (v + (v >> 8)) >> 8


def _func_np(func, src, dst, cst):
    """numpy mirror of DoBlendFunc (graphics.cpp:405-475)."""
    sa, sr, sg, sb = src
    da, dr, dg, db = dst
    ca, cr, cg, cb = cst
    F = C
    z = np.zeros_like(sa)
    f = np.full_like(sa, 0xFF)
    table = {
        F.OM_BLEND_FUNC_ZERO: (z, z, z, z),
        F.OM_BLEND_FUNC_ONE: (f, f, f, f),
        F.OM_BLEND_FUNC_SRC_RGB: (sa, sr, sg, sb),
        F.OM_BLEND_FUNC_ONE_MINUS_SRC_RGB:
            (0xFF - sa, 0xFF - sr, 0xFF - sg, 0xFF - sb),
        F.OM_BLEND_FUNC_DST_RGB: (da, dr, dg, db),
        F.OM_BLEND_FUNC_ONE_MINUS_DST_RGB:
            (0xFF - da, 0xFF - dr, 0xFF - dg, 0xFF - db),
        F.OM_BLEND_FUNC_SRC_A: (sa, sa, sa, sa),
        F.OM_BLEND_FUNC_ONE_MINUS_SRC_A: ((0xFF - sa,) * 4),
        F.OM_BLEND_FUNC_DST_A: (da, da, da, da),
        F.OM_BLEND_FUNC_ONE_MINUS_DST_A: ((0xFF - da,) * 4),
        F.OM_BLEND_FUNC_CONST_RGB: (ca, cr, cg, cb),
        F.OM_BLEND_FUNC_ONE_MINUS_CONST_RGB:
            (0xFF - ca, 0xFF - cr, 0xFF - cg, 0xFF - cb),
        F.OM_BLEND_FUNC_CONST_A: (ca, ca, ca, ca),
        # reference quirk: ONE_MINUS_CONST_A uses cst r/g/b too
        F.OM_BLEND_FUNC_ONE_MINUS_CONST_A:
            (0xFF - ca, 0xFF - cr, 0xFF - cg, 0xFF - cb),
        F.OM_BLEND_FUNC_ALPHA_SAT: None,
    }
    if func == F.OM_BLEND_FUNC_ALPHA_SAT:
        fac = np.minimum(sa, 0xFF - da)
        return (f, fac, fac, fac)
    return table[func]


ALL_FUNCS = [
    C.OM_BLEND_FUNC_ZERO, C.OM_BLEND_FUNC_ONE, C.OM_BLEND_FUNC_SRC_RGB,
    C.OM_BLEND_FUNC_ONE_MINUS_SRC_RGB, C.OM_BLEND_FUNC_DST_RGB,
    C.OM_BLEND_FUNC_ONE_MINUS_DST_RGB, C.OM_BLEND_FUNC_SRC_A,
    C.OM_BLEND_FUNC_ONE_MINUS_SRC_A, C.OM_BLEND_FUNC_DST_A,
    C.OM_BLEND_FUNC_ONE_MINUS_DST_A, C.OM_BLEND_FUNC_CONST_RGB,
    C.OM_BLEND_FUNC_ONE_MINUS_CONST_RGB, C.OM_BLEND_FUNC_CONST_A,
    C.OM_BLEND_FUNC_ONE_MINUS_CONST_A, C.OM_BLEND_FUNC_ALPHA_SAT,
]

ALL_LOGIC_OPS = list(range(16))


def _mode_np(mode, lop, src, dst, s, d, src_p, dst_p):
    """numpy mirror of DoBlendMode (graphics.cpp:477-524)."""
    if mode == C.OM_BLEND_MODE_ADD:
        return tuple(
            _div255(np.minimum(x.astype(np.int64) * fx + y.astype(np.int64)
                               * fy + 0x80, 0xFF00)).astype(np.uint32)
            for x, fx, y, fy in zip(src, s, dst, d))
    if mode == C.OM_BLEND_MODE_SUB:
        return tuple(
            _div255(np.maximum(x.astype(np.int64) * fx
                               - y.astype(np.int64) * fy + 0x80,
                               0)).astype(np.uint32)
            for x, fx, y, fy in zip(src, s, dst, d))
    if mode == C.OM_BLEND_MODE_REV_SUB:
        return tuple(
            _div255(np.maximum(y.astype(np.int64) * fy
                               - x.astype(np.int64) * fx + 0x80,
                               0)).astype(np.uint32)
            for x, fx, y, fy in zip(src, s, dst, d))
    if mode == C.OM_BLEND_MODE_MIN:
        return tuple(np.minimum(x, y) for x, y in zip(src, dst))
    if mode == C.OM_BLEND_MODE_MAX:
        return tuple(np.maximum(x, y) for x, y in zip(src, dst))
    if mode == C.OM_BLEND_MODE_LOGICOP:
        ops = [lambda s_, d_: np.zeros_like(s_), lambda s_, d_: s_ & d_,
               lambda s_, d_: s_ & ~d_, lambda s_, d_: s_,
               lambda s_, d_: ~s_ & d_, lambda s_, d_: d_,
               lambda s_, d_: s_ ^ d_, lambda s_, d_: s_ | d_,
               lambda s_, d_: ~(s_ | d_), lambda s_, d_: ~(s_ ^ d_),
               lambda s_, d_: ~d_, lambda s_, d_: s_ | ~d_,
               lambda s_, d_: ~s_, lambda s_, d_: ~s_ | d_,
               lambda s_, d_: ~(s_ & d_),
               lambda s_, d_: np.full_like(s_, 0xFFFFFFFF)]
        return _unpack_np(ops[lop](src_p, dst_p))
    raise ValueError(mode)


def _blend_np(state, src_p, dst_p):
    src = _unpack_np(src_p)
    dst = _unpack_np(dst_p)
    cst = tuple(np.broadcast_to(v, src_p.shape)
                for v in _unpack_np(np.uint32(state.const_color)))
    s_rgb = _func_np(state.src_rgb, src, dst, cst)
    s_a = _func_np(state.src_a, src, dst, cst)
    d_rgb = _func_np(state.dst_rgb, src, dst, cst)
    d_a = _func_np(state.dst_a, src, dst, cst)
    rgb = _mode_np(state.mode_rgb, state.logic_op, src, dst, s_rgb, d_rgb,
                   src_p, dst_p)
    a = _mode_np(state.mode_a, state.logic_op, src, dst, s_a, d_a,
                 src_p, dst_p)
    return ((a[0].astype(np.uint32) << 24) | (rgb[1] << 16)
            | (rgb[2] << 8) | rgb[3])


@pytest.mark.parametrize("src_f", ALL_FUNCS)
@pytest.mark.parametrize("mode", [C.OM_BLEND_MODE_ADD, C.OM_BLEND_MODE_SUB,
                                  C.OM_BLEND_MODE_REV_SUB,
                                  C.OM_BLEND_MODE_MIN, C.OM_BLEND_MODE_MAX])
def test_blend_funcs_and_modes(src_f, mode):
    src = _rand_colors(512, 1)
    dst = _rand_colors(512, 2)
    st = blend_mod.BlendState(
        mode_rgb=mode, mode_a=mode, src_rgb=src_f, src_a=src_f,
        dst_rgb=C.OM_BLEND_FUNC_DST_A, dst_a=C.OM_BLEND_FUNC_SRC_RGB,
        const_color=0x8040C020, logic_op=0)
    got = np.asarray(blend_mod.blend(st, jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_array_equal(got, _blend_np(st, src, dst))


@pytest.mark.parametrize("lop", ALL_LOGIC_OPS)
def test_logic_ops(lop):
    src = _rand_colors(512, 3)
    dst = _rand_colors(512, 4)
    st = blend_mod.BlendState(
        mode_rgb=C.OM_BLEND_MODE_LOGICOP, mode_a=C.OM_BLEND_MODE_LOGICOP,
        src_rgb=C.OM_BLEND_FUNC_ONE, src_a=C.OM_BLEND_FUNC_ONE,
        dst_rgb=C.OM_BLEND_FUNC_ZERO, dst_a=C.OM_BLEND_FUNC_ZERO,
        const_color=0, logic_op=lop)
    got = np.asarray(blend_mod.blend(st, jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_array_equal(got, _blend_np(st, src, dst))


STENCIL_OPS = list(range(8))


@pytest.mark.parametrize("op", STENCIL_OPS)
def test_stencil_ops(op):
    """graphics.cpp:343-364 mirror."""
    val = (_rand_colors(512, 5) & 0xFF)
    ref = np.uint32(0x5A)
    got = np.asarray(ds_mod.stencil_op(op, ref, jnp.asarray(val)))
    if op == C.OM_STENCIL_OP_KEEP:
        exp = val
    elif op == C.OM_STENCIL_OP_ZERO:
        exp = np.zeros_like(val)
    elif op == C.OM_STENCIL_OP_REPLACE:
        exp = np.full_like(val, 0x5A)
    elif op == C.OM_STENCIL_OP_INCR:
        exp = np.where(val < 0xFF, val + 1, val)
    elif op == C.OM_STENCIL_OP_DECR:
        exp = np.where(val > 0, val - 1, val)
    elif op == C.OM_STENCIL_OP_INVERT:
        exp = ~val
    elif op == C.OM_STENCIL_OP_INCR_WRAP:
        exp = (val + 1) & 0xFF
    else:
        exp = (val - 1) & 0xFF
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("func", list(range(8)))
def test_compare_funcs(func):
    """graphics.cpp:320-341: unsigned compare table."""
    a = _rand_colors(512, 6)
    b = _rand_colors(512, 7)
    got = np.asarray(ds_mod.compare(func, jnp.asarray(a), jnp.asarray(b)))
    # VX_types.vh:376-383 ordering: ALWAYS NEVER LESS LEQUAL EQUAL GEQUAL
    # GREATER NOTEQUAL
    exp = [np.ones_like(a, bool), np.zeros_like(a, bool), a < b, a <= b,
           a == b, a >= b, a > b, a != b][func]
    np.testing.assert_array_equal(got, exp)


def test_stencil_full_path():
    """DepthTencil::test with separate front/back state and all three op
    outcomes (fail / zfail / zpass) selected per pixel."""
    st = ds_mod.DepthStencilState(
        depth_func=C.OM_DEPTH_FUNC_LESS, depth_writemask=True,
        stencil_front_func=C.OM_DEPTH_FUNC_GEQUAL,
        stencil_front_zpass=C.OM_STENCIL_OP_INCR,
        stencil_front_zfail=C.OM_STENCIL_OP_DECR,
        stencil_front_fail=C.OM_STENCIL_OP_INVERT,
        stencil_front_ref=0x80, stencil_front_mask=0xFF,
        stencil_back_func=C.OM_DEPTH_FUNC_ALWAYS,
        stencil_back_zpass=C.OM_STENCIL_OP_REPLACE,
        stencil_back_zfail=C.OM_STENCIL_OP_KEEP,
        stencil_back_fail=C.OM_STENCIL_OP_KEEP,
        stencil_back_ref=0x11, stencil_back_mask=0xFF)

    depth = np.array([0x100, 0x300, 0x100], np.uint32)
    # dst: (stencil<<24)|depth24
    dst = np.array([(0x40 << 24) | 0x200,     # stencil fail (0x80 >= 0x40? yes -> pass) ...
                    (0x90 << 24) | 0x200,     # depth fail
                    (0xFF << 24) | 0x200], np.uint32)
    passed, result = ds_mod.test(st, False, jnp.asarray(depth),
                                 jnp.asarray(dst))
    passed = np.asarray(passed)
    result = np.asarray(result)
    # pixel 0: stencil GEQUAL(0x80 >= 0x40) pass, depth 0x100 < 0x200 pass
    #          -> zpass INCR: 0x41
    assert passed[0] and (result[0] >> 24) == 0x41
    # pixel 1: stencil pass (0x80 >= 0x90? no) -> fail INVERT: ~0x90
    assert not passed[1] and (result[1] >> 24) == (~np.uint32(0x90 << 24)
                                                  >> 24)
    # pixel 2: stencil 0x80 >= 0xFF fails -> INVERT 0xFF -> 0x00
    assert not passed[2] and (result[2] >> 24) == 0x00
    # back face: ALWAYS + REPLACE
    passed_b, result_b = ds_mod.test(st, True, jnp.asarray(depth),
                                     jnp.asarray(dst))
    assert np.asarray(passed_b)[0] and \
        (np.asarray(result_b)[0] >> 24) == 0x11
