"""Deferred blend/stencil path: exact equality with the immediate oracle
on synthetic high-depth-complexity scenes (the dual-backend equivalence
pattern, SURVEY §4.2, extended to every OM state class the traces don't
exercise: stencil ops, logic ops, MIN/REV_SUB modes, partial writemasks,
slot-overflow retry)."""
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.core import constants as C
from skybox_rt_tpu.core.state import RenderState, ShaderFlags
from skybox_rt_tpu.geom import binning
from skybox_rt_tpu.om.blend import BlendState
from skybox_rt_tpu.om.depth_stencil import DepthStencilState
from skybox_rt_tpu.om.merger import OMState
from skybox_rt_tpu.ops import deferred
from skybox_rt_tpu.ref import renderer

W = H = 64
TLS = 5


def _layered_scene(n_tris, seed):
    """n_tris large triangles overlapping the screen center -> depth
    complexity ~n_tris at the center pixels."""
    rng = np.random.default_rng(seed)
    pos = np.zeros((3 * n_tris, 4), np.float32)
    col = np.zeros((3 * n_tris, 4), np.float32)
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    for t in range(n_tris):
        base = rng.uniform(-0.4, 0.4, size=2)
        z = rng.uniform(0.05, 0.95)
        ang = rng.uniform(0, 2 * np.pi)
        for k in range(3):
            a = ang + k * 2 * np.pi / 3
            pos[3 * t + k] = [base[0] + 0.9 * np.cos(a),
                              base[1] + 0.9 * np.sin(a), z, 1.0]
        col[3 * t:3 * t + 3] = rng.uniform(0.0, 1.0, size=(3, 4))
    tex = np.zeros((3 * n_tris, 2), np.float32)
    return pos, idx, col, tex


def _ds(depth_func=C.OM_DEPTH_FUNC_ALWAYS, depth_write=False, **st):
    s = dict(func=C.OM_DEPTH_FUNC_ALWAYS, zpass=C.OM_STENCIL_OP_KEEP,
             zfail=C.OM_STENCIL_OP_KEEP, fail=C.OM_STENCIL_OP_KEEP,
             ref=0, mask=0xFF)
    s.update(st)
    return DepthStencilState(
        depth_func=depth_func, depth_writemask=depth_write,
        stencil_front_func=s["func"], stencil_front_zpass=s["zpass"],
        stencil_front_zfail=s["zfail"], stencil_front_fail=s["fail"],
        stencil_front_ref=s["ref"], stencil_front_mask=s["mask"],
        stencil_back_func=C.OM_DEPTH_FUNC_ALWAYS,
        stencil_back_zpass=C.OM_STENCIL_OP_KEEP,
        stencil_back_zfail=C.OM_STENCIL_OP_KEEP,
        stencil_back_fail=C.OM_STENCIL_OP_KEEP,
        stencil_back_ref=0, stencil_back_mask=0xFF)


def _blend(src=C.OM_BLEND_FUNC_ONE, dst=C.OM_BLEND_FUNC_ZERO,
           mode=C.OM_BLEND_MODE_ADD, logic_op=0, const_color=0):
    return BlendState(mode_rgb=mode, mode_a=mode, src_rgb=src, src_a=src,
                      dst_rgb=dst, dst_a=dst, const_color=const_color,
                      logic_op=logic_op)


def _om(ds, blend, depth_write=False, swm=0, cmask=0xF):
    return OMState(ds=ds, blend=blend, depth_writemask=depth_write,
                   stencil_front_writemask=swm, stencil_back_writemask=0,
                   cbuf_writemask4=cmask)


ALPHA = _blend(C.OM_BLEND_FUNC_SRC_A, C.OM_BLEND_FUNC_ONE_MINUS_SRC_A)
ADDITIVE = _blend(C.OM_BLEND_FUNC_ONE, C.OM_BLEND_FUNC_ONE)
DSTFAC = _blend(C.OM_BLEND_FUNC_DST_A, C.OM_BLEND_FUNC_ONE_MINUS_DST_RGB,
                C.OM_BLEND_MODE_REV_SUB)
MINMODE = _blend(C.OM_BLEND_FUNC_ONE, C.OM_BLEND_FUNC_ONE,
                 C.OM_BLEND_MODE_MIN)
XORLOGIC = _blend(C.OM_BLEND_FUNC_ONE, C.OM_BLEND_FUNC_ONE,
                  C.OM_BLEND_MODE_LOGICOP, logic_op=C.OM_LOGIC_OP_XOR)
SATUR = _blend(C.OM_BLEND_FUNC_ALPHA_SAT, C.OM_BLEND_FUNC_CONST_RGB,
               const_color=0x80FF4020)

CASES = {
    # blend on, depth test on with write (classic translucency over z)
    "alpha_less": _om(_ds(C.OM_DEPTH_FUNC_LESS, True), ALPHA,
                      depth_write=True),
    # blend on, depth test but no write (all-pass accumulation)
    "additive_lequal": _om(_ds(C.OM_DEPTH_FUNC_LEQUAL, False), ADDITIVE),
    # blend on, no depth at all -> every covered fragment contributes
    "alpha_nodepth": _om(_ds(), ALPHA),
    "revsub_dst": _om(_ds(), DSTFAC),
    "min_mode": _om(_ds(), MINMODE),
    "logic_xor": _om(_ds(), XORLOGIC),
    "alpha_sat_const": _om(_ds(), SATUR),
    # partial color writemask under blending
    "alpha_mask_rb": _om(_ds(C.OM_DEPTH_FUNC_LESS, True), ALPHA,
                         depth_write=True, cmask=0x5),
    # stencil without blend (single-winner path + stencil carry)
    "stencil_incr": _om(
        _ds(C.OM_DEPTH_FUNC_LESS, True, zpass=C.OM_STENCIL_OP_INCR,
            fail=C.OM_STENCIL_OP_INVERT, ref=0x2A, mask=0x0F),
        _blend(), depth_write=True, swm=0xFF),
    # stencil + blend together
    "stencil_blend": _om(
        _ds(C.OM_DEPTH_FUNC_GREATER, True, func=C.OM_DEPTH_FUNC_NOTEQUAL,
            zpass=C.OM_STENCIL_OP_INCR_WRAP, zfail=C.OM_STENCIL_OP_DECR,
            fail=C.OM_STENCIL_OP_REPLACE, ref=0x13, mask=0xF0),
        ALPHA, depth_write=True, swm=0x3C),
}


def _render_pair(om_state, n_tris=12, seed=0, depth_flag=True):
    pos, idx, col, tex = _layered_scene(n_tris, seed)
    binned = binning.bin_drawcall(pos, idx, col, tex, W, H, 0.0, 1.0, TLS)
    assert binned is not None
    flags = ShaderFlags(depth_enabled=depth_flag, color_enabled=True,
                        tex_enabled=False, tex_modulate=False)
    rs = RenderState(flags=flags, om=om_state, tex=None,
                     scissor=(0, 0, W, H))
    fbc0 = jnp.full((H, W), 0xFF000000, jnp.uint32)
    fbd0 = jnp.full((H, W), 0xFFFFFFFF, jnp.uint32)
    # seed the stencil byte so stencil compares aren't trivial
    fbd0 = fbd0 & jnp.uint32(0x23FFFFFF)
    ref_c, ref_d = renderer.render_drawcall(rs, None, binned, fbc0, fbd0)
    info = {}
    got_c, got_d = deferred.render_drawcall(rs, None, binned, fbc0, fbd0,
                                            info=info)
    return (np.asarray(ref_c), np.asarray(ref_d),
            np.asarray(got_c), np.asarray(got_d), info)


@pytest.mark.parametrize("case", sorted(CASES))
def test_deferred_blend_stencil_exact(case):
    ref_c, ref_d, got_c, got_d, _ = _render_pair(CASES[case])
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_d, ref_d)


def test_slot_overflow_retry():
    """12 center-overlapping all-pass translucent tris force the
    DEFAULT_BLEND_SLOTS=4 first dispatch to overflow and re-dispatch."""
    ref_c, ref_d, got_c, got_d, info = _render_pair(
        CASES["alpha_nodepth"], n_tris=12, seed=3)
    assert info["max_frag_count"] > deferred.DEFAULT_BLEND_SLOTS
    assert info["blend_k"] >= info["max_frag_count"]
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_d, ref_d)


def test_blended_scenes_deferred_exact():
    """The blend-heavy trace scenes must now run fully deferred and stay
    bit-exact (previously they fell back to the immediate path)."""
    from skybox_rt_tpu.ref import driver
    for scene, size in [("vase", 32), ("polybump", 32), ("mouse", 32)]:
        a = driver.render_scene(scene, size, size, mode="immediate")
        b = driver.render_scene(scene, size, size, mode="deferred")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=scene)


def test_blend_k_cache_stale_hint_recovers():
    """The frame-level blend-K cache protocol (VERDICT r3 #7): a STALE
    (too-small) cached K must be caught by the frame-end overflow
    verification and the frame re-rendered exactly — never a silently
    truncated composite."""
    from skybox_rt_tpu.geom import cgltrace
    from skybox_rt_tpu.ref import driver

    trace = cgltrace.load_cached(cgltrace.trace_path("vase"))
    ref = driver.render_trace(trace, 32, 32, mode="deferred")
    cache = trace._blend_k_cache
    key = (32, 32, 5)
    ks = cache[key]
    assert any(k > 0 for k in ks.values()), "vase must have blended draws"
    assert any(k > 1 for k in ks.values()), \
        "need a draw with >1 fragment to make K=1 stale"
    # poison: claim every blended draw needs only one slot
    cache[key] = {d: (1 if k > 0 else 0) for d, k in ks.items()}
    got = driver.render_trace(trace, 32, 32, mode="deferred")
    np.testing.assert_array_equal(got, ref)
    # the re-measurement restored correct counts
    assert {d: k for d, k in trace._blend_k_cache[key].items() if k} \
        == {d: k for d, k in ks.items() if k}


def test_render_drawcall_overflow_out_contract():
    """render_drawcall(blend_k=, overflow_out=) appends (K, device count)
    without syncing, and the count exposes a too-small K."""
    from skybox_rt_tpu.geom import cgltrace
    from skybox_rt_tpu.ref import driver as drv
    from skybox_rt_tpu.ref import renderer

    trace = cgltrace.load_cached(cgltrace.trace_path("vase"))
    draws = drv.prepare_drawcalls(trace, 32, 32, 5)
    blended = [(rs, tx, b) for rs, tx, b in draws
               if rs.om.blend.enabled]
    assert blended
    rs, texels, binned = blended[0]
    fbc = jnp.asarray(renderer.pad_framebuffer(
        np.full((32, 32), drv.CLEAR_COLOR, np.uint32), 5))
    fbd = jnp.asarray(renderer.pad_framebuffer(
        np.full((32, 32), drv.CLEAR_DEPTH, np.uint32), 5))
    info = {}
    deferred.render_drawcall(rs, texels, binned, fbc, fbd, info=info)
    true_k = info["max_frag_count"]
    pending = []
    deferred.render_drawcall(rs, texels, binned, fbc, fbd,
                             blend_k=1, overflow_out=pending)
    assert len(pending) == 1
    k, cnt = pending[0]
    assert k == 1 and int(cnt) == true_k
