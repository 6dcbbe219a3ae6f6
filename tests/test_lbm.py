"""lbm (Parboil D3Q19 lattice-Boltzmann) vs a per-cell oracle.

The oracle below is a line-for-line transliteration of the reference
stream-collide kernel (tests/opencl/lbm/kernel.cl) executed cell by cell
in numpy — the same role the host's gold files play.  The JAX port must
match it on every float of the grid across multiple steps.
"""
import numpy as np
import pytest

from skybox_rt_tpu.apps import lbm

CFG = lbm.LBMConfig(size_x=16, size_y=8, size_z=8)


def _oracle_step(cfg, grid):
    """kernel.cl:16-175, one cell at a time (GATHER layout)."""
    out = grid.copy()
    for z in range(cfg.size_z):
        for y in range(cfg.size_y):
            for x in range(cfg.size_x):
                f = np.array([
                    grid[cfg.calc_index(x - dx, y - dy, z - dz, e)]
                    for e, (dx, dy, dz) in enumerate(lbm.DIRS)
                ], np.float32)
                flags = grid[cfg.calc_index(x, y, z, lbm.FLAGS):
                             cfg.calc_index(x, y, z, lbm.FLAGS) + 1]
                flags = flags.view(np.uint32)[0]
                if flags & lbm.OBSTACLE:
                    new = f[lbm.OPPOSITE]
                else:
                    rho = np.float32(f.sum())
                    d = lbm.DIRS.astype(np.float32)
                    ux, uy, uz = (d.T @ f) / rho
                    if flags & lbm.ACCEL:
                        ux, uy, uz = (np.float32(0.005), np.float32(0.002),
                                      np.float32(0.0))
                    u2 = np.float32(1.5) * (ux * ux + uy * uy + uz * uz) \
                        - np.float32(1.0)
                    cu = d[:, 0] * ux + d[:, 1] * uy + d[:, 2] * uz
                    new = (np.float32(1.0) - lbm.OMEGA) * f \
                        + lbm.WEIGHTS * (lbm.OMEGA * rho) \
                        * (cu * (np.float32(4.5) * cu + np.float32(3.0)) - u2)
                for e in range(lbm.FLAGS):
                    out[cfg.calc_index(x, y, z, e)] = new[e]
    return out


def test_step_matches_oracle():
    grid = lbm.init_ldc(CFG)
    got = grid.copy()
    want = grid.copy()
    step = lbm.make_step(CFG)
    for _ in range(3):
        got = np.asarray(step(got))
        want = _oracle_step(CFG, want)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_flags_and_margins_untouched():
    grid = lbm.init_ldc(CFG)
    out = lbm.run(CFG, steps=5, grid=grid)
    _, _, flags_idx = lbm.make_indices(CFG)
    np.testing.assert_array_equal(out[flags_idx], grid[flags_idx])
    np.testing.assert_array_equal(out[:CFG.margin], grid[:CFG.margin])
    np.testing.assert_array_equal(out[-CFG.margin:], grid[-CFG.margin:])


def test_ldc_develops_flow():
    """The ACCEL plates drive a cavity flow: velocities become nonzero,
    stay finite, and the dominant flow is along +x (ux = 0.005 forcing)."""
    out = lbm.run(CFG, steps=30)
    vel = lbm.velocity_field(CFG, out)
    assert np.isfinite(vel).all()
    assert np.abs(vel).max() > 1e-4
    assert np.abs(vel[:, 0]).sum() > np.abs(vel[:, 2]).sum()


def test_default_config_runs():
    out = lbm.run(lbm.LBMConfig(), steps=2)
    assert np.isfinite(out).all()
