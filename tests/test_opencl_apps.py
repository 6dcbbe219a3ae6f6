"""OpenCL/POCL suite analogs vs numpy oracles (SURVEY §4 tests/opencl/)."""
import jax.numpy as jnp
import numpy as np
import pytest

from skybox_rt_tpu.apps import opencl


def rng(seed=0):
    return np.random.default_rng(seed)


def test_saxpy_dot_psum_transpose():
    r = rng(1)
    x = r.standard_normal(2048).astype(np.float32)
    y = r.standard_normal(2048).astype(np.float32)
    np.testing.assert_allclose(np.asarray(opencl.saxpy(2.5, x, y)),
                               2.5 * x + y, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(opencl.dotproduct(x, y)),
                               np.dot(x, y), rtol=1e-4)
    np.testing.assert_allclose(float(opencl.psum_reduce(x)), x.sum(),
                               rtol=1e-4, atol=1e-4)
    a = r.standard_normal((37, 53)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(opencl.transpose(a)), a.T)


def test_blackscholes():
    r = rng(2)
    n = 4096
    S = r.uniform(5.0, 30.0, n).astype(np.float32)
    X = r.uniform(1.0, 100.0, n).astype(np.float32)
    T = r.uniform(0.25, 10.0, n).astype(np.float32)
    call, put = opencl.blackscholes(S, X, T, 0.02, 0.30)
    c_ref, p_ref = opencl.blackscholes_oracle(S, X, T, 0.02, 0.30)
    np.testing.assert_allclose(np.asarray(call), c_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(put), p_ref, atol=1e-4)


def test_nearn():
    r = rng(3)
    pts = r.standard_normal((1000, 2)).astype(np.float32)
    q = np.array([0.3, -0.2], np.float32)
    dist, idx = opencl.nearn(pts, q)
    ref = np.sqrt(((pts - q) ** 2).sum(1))
    np.testing.assert_allclose(np.asarray(dist), ref, rtol=1e-5, atol=1e-6)
    assert int(idx) == int(np.argmin(ref))


def test_kmeans_step():
    r = rng(4)
    pts = r.standard_normal((500, 3)).astype(np.float32)
    cen = r.standard_normal((7, 3)).astype(np.float32)
    assign = np.asarray(opencl.kmeans_assign(pts, cen))
    ref_assign = np.argmin(((pts[:, None] - cen[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(assign, ref_assign)
    upd = np.asarray(opencl.kmeans_update(pts, assign, 7))
    for k in range(7):
        members = pts[assign == k]
        ref = members.mean(0) if len(members) else np.zeros(3, np.float32)
        np.testing.assert_allclose(upd[k], ref, rtol=1e-4, atol=1e-5)


def test_spmv_csr():
    r = rng(5)
    R, C = 40, 60
    dense = r.standard_normal((R, C)).astype(np.float32)
    dense[r.random((R, C)) > 0.15] = 0.0            # ~85% sparse
    x = r.standard_normal(C).astype(np.float32)
    # build CSR on the host
    rows, cols = np.nonzero(dense)
    values = dense[rows, cols].astype(np.float32)
    row_ptr = np.zeros(R + 1, np.int32)
    np.add.at(row_ptr, rows + 1, 1)
    row_ptr = np.cumsum(row_ptr).astype(np.int32)
    row_id = opencl.expand_row_ptr(row_ptr)
    np.testing.assert_array_equal(row_id, rows)     # expansion sanity
    y = np.asarray(opencl.spmv_csr(values, cols.astype(np.int32),
                                   row_id, x, R))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [6, 7])
def test_bfs(seed):
    r = rng(seed)
    n = 200
    m = 600
    src = r.integers(0, n, m).astype(np.int32)
    dst = r.integers(0, n, m).astype(np.int32)
    cost = np.asarray(opencl.bfs(jnp.asarray(src), jnp.asarray(dst), n))
    ref = opencl.bfs_oracle(src, dst, n)
    np.testing.assert_array_equal(cost, ref)


def test_gaussian_elimination():
    r = rng(8)
    n = 24
    # diagonally dominant => stable without pivoting (like the reference's
    # generated inputs)
    A = r.standard_normal((n, n)).astype(np.float32)
    A += np.eye(n, dtype=np.float32) * (np.abs(A).sum(1).max() + 1.0)
    b = r.standard_normal(n).astype(np.float32)
    U, c = opencl.gaussian_eliminate(A, b)
    U = np.asarray(U)
    # below-diagonal entries eliminated
    assert np.abs(np.tril(U, -1)).max() < 1e-3
    x = opencl.back_substitute(U, c)
    np.testing.assert_allclose(A @ x, b, atol=5e-2)

def test_sfilter():
    """3x3 interior convolution vs the host's reference loop
    (sfilter/main.cc:229-259): borders stay zero; float tolerance since
    XLA contracts the chained mul-adds into FMAs (the host compares with
    an epsilon too, common.h Comparator)."""
    rng = np.random.default_rng(11)
    n = 16
    src = (rng.random((n, n), np.float32) * 100.0).astype(np.float32)
    m = rng.standard_normal(9).astype(np.float32)
    got = np.asarray(opencl.sfilter(src, m))
    ref = np.zeros((n, n), np.float32)
    for y in range(1, n - 1):
        for x in range(1, n - 1):
            acc = np.float32(0)
            for k, (dy, dx) in enumerate([(-1, -1), (-1, 0), (-1, 1),
                                          (0, -1), (0, 0), (0, 1),
                                          (1, -1), (1, 0), (1, 1)]):
                acc = np.float32(acc + np.float32(src[y + dy, x + dx] * m[k]))
            ref[y, x] = acc
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
    assert got[0].sum() == 0 and got[-1].sum() == 0
    assert got[:, 0].sum() == 0 and got[:, -1].sum() == 0


def test_sgemm3():
    """Tiled local-memory matmul == plain matmul (sgemm3/main.cc:108-118
    sgemm_cpu oracle, float tolerance for accumulation-order differences)."""
    rng = np.random.default_rng(12)
    n = 32
    A = rng.standard_normal((n, n)).astype(np.float32)
    B = rng.standard_normal((n, n)).astype(np.float32)
    got = np.asarray(opencl.sgemm3(A, B))
    ref = A.astype(np.float64) @ B.astype(np.float64)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
