"""Pallas visibility-kernel parity (SURVEY §4.3: the HW-vs-SW self-check
pattern — jax-reference / Pallas cross-validation, ≅ draw3d -x flags).

On the CPU test mesh the kernel runs in interpreter mode; on real TPU
(SKYBOX_TEST_PLATFORM=axon) the same tests compile the Mosaic kernel.
Parity target is exact equality with the XLA deferred pass-1 and with the
golden images end-to-end.
"""
import os

import numpy as np
import pytest

from skybox_rt_tpu.ref import driver
from skybox_rt_tpu.utils import image

ON_TPU = os.environ.get("SKYBOX_TEST_PLATFORM", "cpu") != "cpu"
MODE = "pallas" if ON_TPU else "pallas_interpret"

ASSETS = "/root/reference/tests/regression/draw3d"


def _render_both(scene, size, tile_logsize=5):
    ref = driver.render_scene(scene, size, size, mode="deferred",
                              tile_logsize=tile_logsize)
    got = driver.render_scene(scene, size, size, mode=MODE,
                              tile_logsize=tile_logsize)
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize("scene,size", [
    ("triangle", 64),
    ("box", 128),
    ("vase", 32),
])
def test_pallas_matches_xla(scene, size):
    ref, got = _render_both(scene, size)
    np.testing.assert_array_equal(got, ref)


def test_pallas_golden_tekkaman():
    fb = driver.render_scene("tekkaman", 128, 128, mode=MODE)
    errors, maxdiff = image.compare_to_golden(
        fb, f"{ASSETS}/tekkaman_ref_128.png")
    assert errors == 0 and maxdiff == 0


def test_pallas_tile16():
    """ts=16 -> 256 px = 2 sublane rows, the minimum lane-aligned tile."""
    ref, got = _render_both("triangle", 64, tile_logsize=4)
    np.testing.assert_array_equal(got, ref)


def test_pallas_small_tile_falls_back():
    """ts=8 tiles (64 px < 128 lanes) must fall back to XLA, not crash."""
    ref, got = _render_both("triangle", 32, tile_logsize=3)
    np.testing.assert_array_equal(got, ref)
