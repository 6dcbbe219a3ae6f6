"""Exactness tests for the int32 fixed-point emulation layer.

Model: the reference's numerics conformance suite (tests/riscv/isa — SURVEY
§4.5); here the "ISA" is our wide-multiply emulation vs Python bigints.
"""
import numpy as np
import jax.numpy as jnp

from skybox_rt_tpu.core import fixed


def _i32(v):
    """Python int -> int32 with two's-complement wraparound."""
    return np.uint32(v & 0xFFFFFFFF).astype(np.int32)


def _ref_mul_shift(a, b, shift):
    p = int(a) * int(b)
    p >>= shift  # python ints: arithmetic shift, arbitrary precision
    return _i32(p)


def test_mul_shift_exhaustive_random():
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**31), 2**31, size=20000, dtype=np.int64).astype(np.int32)
    b = rng.integers(-(2**31), 2**31, size=20000, dtype=np.int64).astype(np.int32)
    for shift in (1, 8, 16, 23, 24, 31):
        got = np.asarray(fixed.mul_shift(jnp.asarray(a), jnp.asarray(b), shift))
        want = np.array([_ref_mul_shift(x, y, shift) for x, y in zip(a, b)])
        np.testing.assert_array_equal(got, want)


def test_mul_shift_edge_cases():
    cases = [
        (0, 0), (1, 1), (-1, 1), (-1, -1),
        (2**31 - 1, 2**31 - 1), (-(2**31), -(2**31)),
        (-(2**31), 2**31 - 1), (1 << 24, 1 << 24),
        (-(1 << 24), (1 << 24) - 1), (0x12345678, -0x7654321),
    ]
    a = np.array([c[0] for c in cases], np.int64).astype(np.int32)
    b = np.array([c[1] for c in cases], np.int64).astype(np.int32)
    for shift in (1, 24, 31):
        got = np.asarray(fixed.mul_shift(jnp.asarray(a), jnp.asarray(b), shift))
        want = np.array([_ref_mul_shift(x, y, shift) for x, y in zip(a, b)])
        np.testing.assert_array_equal(got, want)


def test_imadd24_matches_reference_semantics():
    # imadd(a,b,c,3) = ((int64)a*b >> 24) + c  (draw3d/kernel.cpp:48-54)
    rng = np.random.default_rng(1)
    a = rng.integers(-(2**26), 2**26, size=5000).astype(np.int32)
    b = rng.integers(-(2**24), 2**24, size=5000).astype(np.int32)
    c = rng.integers(-(2**26), 2**26, size=5000).astype(np.int32)
    got = np.asarray(fixed.imadd24(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
    want = np.array(
        [_i32(((int(x) * int(y)) >> 24) + int(z)) for x, y, z in zip(a, b, c)]
    )
    np.testing.assert_array_equal(got, want)


def test_to_fixed_truncates_toward_zero():
    vals = np.array([0.5, -0.5, 0.9999999, -0.9999999, 1.25, -1.25], np.float32)
    got = fixed.to_fixed_np(vals, 16)
    want = np.array([int(v * 65536.0) for v in vals.astype(np.float64)], np.int64)
    # compare with C truncation semantics
    want = np.array([int(np.float32(v) * np.float32(65536)) for v in vals])
    np.testing.assert_array_equal(got, np.array(want, np.int32))


def test_fixed_to_float_roundtrip():
    data = np.array([0, 1, -1, 1 << 24, -(1 << 24), 12345678], np.int32)
    got = np.asarray(fixed.fixed_to_float(jnp.asarray(data), 24))
    want = data.astype(np.float32) / np.float32(2**24)
    np.testing.assert_array_equal(got, want)
