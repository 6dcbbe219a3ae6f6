"""Golden-image regression — the primary correctness oracle (SURVEY §4.1).

Renders the reference's checked-in CGLTrace scenes and compares against its
golden PNGs (tests/regression/draw3d/*_ref_*.png) with the same tolerance-1
rule as cocogfx CompareImages (draw3d/main.cpp:505-514).  Our renderer is
bit-exact: we assert zero differing channels, a stronger condition.
"""
import os

import pytest

from skybox_rt_tpu.ref import driver
from skybox_rt_tpu.utils import image

ASSETS = "/root/reference/tests/regression/draw3d"

# (scene, size) for every golden in the snapshot that has a matching trace
CASES = [
    ("triangle", 8), ("triangle", 16), ("triangle", 32), ("triangle", 64),
    ("triangle", 128),
    ("box", 128),
    ("carnival", 128),
    ("scene", 128),
    ("tekkaman", 128),
    ("vase", 32),
    ("evilskull", 32),
    ("mouse", 32),
    ("polybump", 32),
]

# larger, slower scenes — still exact; run with -m slow_golden
SLOW_CASES = [
    ("vase", 128), ("evilskull", 128), ("mouse", 128), ("polybump", 128),
]


def _golden(scene, size):
    return os.path.join(ASSETS, f"{scene}_ref_{size}.png")


@pytest.mark.parametrize("scene,size", CASES)
def test_golden(scene, size):
    fb = driver.render_scene(scene, size, size)
    errors, maxdiff = image.compare_to_golden(fb, _golden(scene, size))
    assert errors == 0 and maxdiff == 0, (
        f"{scene}@{size}: {errors} pixels differ (max channel diff {maxdiff})"
    )


@pytest.mark.slow
@pytest.mark.parametrize("scene,size", SLOW_CASES)
def test_golden_slow(scene, size):
    fb = driver.render_scene(scene, size, size)
    errors, maxdiff = image.compare_to_golden(fb, _golden(scene, size))
    assert errors == 0 and maxdiff == 0


def test_tile_size_sweep():
    """Tile-size config sweep (≅ RASTER_TILE_LOGSIZE 3..7 sweeps in
    perf/graphics/run.sh): the image must not depend on tile size."""
    import numpy as np
    ref = driver.render_scene("triangle", 64, 64, tile_logsize=5)
    for logsize in (3, 4, 6):
        fb = driver.render_scene("triangle", 64, 64, tile_logsize=logsize)
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(ref))
