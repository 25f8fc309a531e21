"""Systematic dispatch-correctness matrices: every (dtype x op x descr)
combination of the hot entry points against the dense oracle in one sweep
per op family — the structural analog of the reference's per-op gtest
matrices (csrmv_tests/trsv_tests/csrmm_tests instantiate every dtype and
descriptor; tests/unit_tests). Catches combination-specific dispatch bugs
(e.g. a conjugate applied on the wrong side for one dtype) that targeted
tests miss.
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    DiagType,
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    Order,
)
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]
OPS = [Operation.none, Operation.transpose, Operation.conjugate_transpose]


def _rand(rng, shape, dtype):
    v = rng.standard_normal(shape)
    if np.dtype(dtype).kind == "c":
        v = v + 1j * rng.standard_normal(shape)
    return v.astype(dtype)


def _dense_op(dense, op):
    if op == Operation.transpose:
        return dense.T
    if op == Operation.conjugate_transpose:
        return dense.conj().T
    return dense


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op", OPS)
@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
@pytest.mark.parametrize("diag", [DiagType.non_unit, DiagType.unit])
def test_trsv_matrix(rng, dtype, op, fill, diag):
    m = 12
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=dtype, density=0.4, ensure_diag=True)
    dense = dense + np.eye(m) * 4  # well-conditioned triangles
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))])
    ind = np.nonzero(dense)[1]
    val = dense[dense != 0]
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=diag)
    b = _rand(rng, m, dtype)
    got = np.asarray(ast.trsv(1.0, A, descr, op, b))
    tri = np.tril(dense) if fill == FillMode.lower else np.triu(dense)
    if diag == DiagType.unit:
        tri = tri - np.diag(np.diag(tri)) + np.eye(m)
    want = np.linalg.solve(_dense_op(tri, op), b)
    assert_allclose_spec(got, want, dtype=dtype, scale=50)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op", OPS)
@pytest.mark.parametrize("order", [Order.row, Order.column])
def test_mm_matrix(rng, dtype, op, order):
    m, n, k = 11, 9, 4
    ptr, ind, val, dense = random_csr(rng, m, n, dtype=dtype, density=0.4)
    A = ast.create_csr(m, n, ptr, ind, val)
    dop = _dense_op(dense, op)
    B = _rand(rng, (dop.shape[1], k), dtype)
    C0 = _rand(rng, (dop.shape[0], k), dtype)
    alpha, beta = 1.25, -0.5
    if order == Order.column:
        got = ast.mm(alpha, A, MatrixDescriptor(), op, B.T, beta, C0.T, order=order)
        got = np.asarray(got).T
    else:
        got = np.asarray(ast.mm(alpha, A, MatrixDescriptor(), op, B, beta, C0))
    want = alpha * dop @ B + beta * C0
    assert_allclose_spec(got, want, dtype=dtype, scale=30)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op", OPS)
def test_dotmv_matrix(rng, dtype, op):
    m = 10
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=dtype, density=0.5)
    A = ast.create_csr(m, m, ptr, ind, val)
    x = _rand(rng, m, dtype)
    y0 = _rand(rng, m, dtype)
    alpha, beta = 0.75, 1.5
    y, d = ast.dotmv(alpha, A, MatrixDescriptor(), op, x, beta, y0)
    want_y = alpha * _dense_op(dense, op) @ x + beta * y0
    assert_allclose_spec(np.asarray(y), want_y, dtype=dtype, scale=30)
    # d = <x, y> conjugated on x for complex (reference dotmv semantics)
    want_d = np.vdot(x, want_y) if np.dtype(dtype).kind == "c" else np.dot(x, want_y)
    assert abs(complex(d) - complex(want_d)) <= 1e-4 * max(1.0, abs(complex(want_d)))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
@pytest.mark.parametrize("mtype", [MatrixType.symmetric, MatrixType.hermitian])
def test_mv_sym_herm_matrix(rng, dtype, fill, mtype):
    if mtype == MatrixType.hermitian and np.dtype(dtype).kind != "c":
        pytest.skip("hermitian is complex-only in effect")
    m = 12
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=dtype, density=0.4, ensure_diag=True)
    A = ast.create_csr(m, m, ptr, ind, val)
    x = _rand(rng, m, dtype)
    descr = MatrixDescriptor(type=mtype, fill_mode=fill)
    got = np.asarray(ast.mv(1.0, A, descr, Operation.none, x, 0.0))
    tri = np.tril(dense) if fill == FillMode.lower else np.triu(dense)
    strict = np.tril(dense, -1) if fill == FillMode.lower else np.triu(dense, 1)
    if mtype == MatrixType.symmetric:
        eff = tri + strict.T
    else:
        eff = np.tril(dense, -1) if fill == FillMode.lower else np.triu(dense, 1)
        eff = eff + eff.conj().T + np.diag(np.real(np.diag(dense)))
    assert_allclose_spec(got, eff @ x, dtype=dtype, scale=30)


@pytest.mark.parametrize("dtype", DTYPES)
def test_level1_matrix(rng, dtype):
    """Level-1 family across all dtypes in one pass (axpyi/doti/dotci/
    dotui/gthr/gthrz/sctr/roti semantics vs dense oracles)."""
    n, nnz = 40, 12
    idx = np.sort(rng.choice(n, nnz, replace=False)).astype(np.int32)
    xv = _rand(rng, nnz, dtype)
    yv = _rand(rng, n, dtype)
    a = np.asarray(_rand(rng, 1, dtype))[0]
    # axpyi
    got = np.asarray(ast.axpyi(a, xv, idx, yv))
    want = yv.copy()
    want[idx] += a * xv
    assert_allclose_spec(got, want, dtype=dtype, scale=10)
    # doti / dotci / dotui
    di = ast.doti(xv, idx, yv) if np.dtype(dtype).kind != "c" else None
    if di is not None:
        assert abs(complex(di) - complex(np.dot(xv, yv[idx]))) < 1e-5
    if np.dtype(dtype).kind == "c":
        dc = ast.dotci(xv, idx, yv)
        du = ast.dotui(xv, idx, yv)
        assert abs(complex(dc) - complex(np.vdot(xv, yv[idx]))) < 1e-4
        assert abs(complex(du) - complex(np.dot(xv, yv[idx]))) < 1e-4
    # gthr / gthrz
    g = np.asarray(ast.gthr(yv, idx))
    np.testing.assert_allclose(g, yv[idx], rtol=1e-6)
    gz, yz = ast.gthrz(yv, idx)
    assert np.allclose(np.asarray(gz), yv[idx], rtol=1e-6)
    assert np.allclose(np.asarray(yz)[idx], 0)
    # sctr
    s = np.asarray(ast.sctr(xv, idx, np.zeros(n, dtype)))
    want_s = np.zeros(n, dtype)
    want_s[idx] = xv
    np.testing.assert_allclose(s, want_s, rtol=1e-6)
    # roti (real only)
    if np.dtype(dtype).kind != "c":
        c, s_ = 0.6, 0.8
        xr, yr = ast.roti(xv, idx, yv, c, s_)
        np.testing.assert_allclose(
            np.asarray(xr), c * xv + s_ * yv[idx], rtol=1e-5
        )
