"""Native C++ binning engine parity vs the numpy oracle (SURVEY §4.2:
dual-implementation equivalence, the simx-vs-rtlsim pattern applied to the
host tier).  Exact equality required on every field, every scene."""
import numpy as np
import pytest

from skybox_rt_tpu.geom import binning, cgltrace, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable")


def _bin_both(dc, w, h, tile_logsize=5):
    args = (dc.pos, dc.indices, dc.color, dc.texcoord, w, h,
            dc.near, dc.far, tile_logsize)
    py = binning.bin_drawcall_py(*args)
    nat = native.bin_drawcall_native(*args, 8)
    return py, nat


@pytest.mark.parametrize("scene,size", [
    ("triangle", 64), ("box", 128), ("vase", 128),
    ("tekkaman", 256), ("evilskull", 128), ("carnival", 128),
])
def test_native_matches_python(scene, size):
    trace = cgltrace.load_cached(cgltrace.trace_path(scene))
    checked = 0
    for dc in trace.drawcalls:
        py, nat = _bin_both(dc, size, size)
        if py is None:
            assert nat == "empty"
            continue
        edges, attribs, tile_xy, tile_pids, tile_cnt = nat
        np.testing.assert_array_equal(edges, py.edges)
        np.testing.assert_array_equal(attribs, py.attribs)
        np.testing.assert_array_equal(tile_xy, py.tile_xy)
        np.testing.assert_array_equal(tile_pids, py.tile_pids)
        np.testing.assert_array_equal(tile_cnt, py.tile_pid_count)
        checked += 1
    assert checked > 0


def test_native_tile_logsize_sweep():
    trace = cgltrace.load_cached(cgltrace.trace_path("triangle"))
    dc = trace.drawcalls[0]
    for tls in (3, 4, 5, 6):
        py, nat = _bin_both(dc, 64, 64, tile_logsize=tls)
        np.testing.assert_array_equal(nat[3], py.tile_pids)


def test_dispatcher_uses_native_and_goldens_hold():
    """bin_drawcall (the default entry) must produce golden-exact frames
    whichever engine it picked."""
    from skybox_rt_tpu.ref import driver
    from skybox_rt_tpu.utils import image

    fb = driver.render_scene("triangle", 32, 32)
    errors, maxdiff = image.compare_to_golden(
        fb, "/root/reference/tests/regression/draw3d/triangle_ref_32.png")
    assert errors == 0 and maxdiff == 0


def test_binning_invariants_and_coverage_conservation():
    """Race-detector analog (SURVEY §5): tile ownership is exclusive and
    per-pixel coverage counted through tiles == counted globally."""
    from skybox_rt_tpu.geom import validate

    trace = cgltrace.load_cached(cgltrace.trace_path("triangle"))
    for size in (32, 64):
        for dc in trace.drawcalls:
            b = binning.bin_drawcall(
                dc.pos, dc.indices, dc.color, dc.texcoord, size, size,
                dc.near, dc.far, 4)
            if b is None:
                continue
            validate.validate_binning(b, size, size)
            validate.coverage_conservation(b, size, size)


def test_coverage_conservation_vase():
    from skybox_rt_tpu.geom import validate

    trace = cgltrace.load_cached(cgltrace.trace_path("vase"))
    dc = trace.drawcalls[0]
    b = binning.bin_drawcall(dc.pos, dc.indices, dc.color, dc.texcoord,
                             64, 64, dc.near, dc.far, 5)
    validate.validate_binning(b, 64, 64)
    validate.coverage_conservation(b, 64, 64)
