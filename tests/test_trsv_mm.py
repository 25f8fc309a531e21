"""TRSV/TRSM/SpMM tests (reference: trsv_tests.cpp, trsm_tests.cpp,
csrmm_tests.cpp): descriptor/op matrix of cases vs dense references, missing
diagonal detection, strided variant, multi-RHS."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    AoclSparseError,
    DiagType,
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    Order,
    Status,
)
from aoclsparse_tpu.utils.reference import ref_mm, ref_trsv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _mk(rng, m, n, dtype, **kw):
    ptr, ind, val, dense = random_csr(rng, m, n, dtype=dtype, **kw)
    return ast.create_csr(m, n, ptr, ind, val), (ptr, ind, val, dense)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
@pytest.mark.parametrize("diag", [DiagType.non_unit, DiagType.unit])
@pytest.mark.parametrize(
    "op", [Operation.none, Operation.transpose, Operation.conjugate_transpose]
)
def test_trsv_cases(rng, dtype, fill, diag, op):
    m = 37
    A, (ptr, ind, val, dense) = _mk(rng, m, m, dtype, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=diag)
    b = rng.standard_normal(m).astype(dtype)
    alpha = 1.4
    got = ast.trsv(alpha, A, descr, op, b)
    want = ref_trsv(alpha, m, ptr, ind, val, descr, op, b)
    assert_allclose_spec(got, want, dtype=dtype, scale=30)


def test_trsv_symmetric_descr_treated_triangular(rng):
    m = 12
    A, (ptr, ind, val, dense) = _mk(rng, m, m, np.float64, ensure_diag=True)
    descr_s = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower)
    descr_t = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    b = rng.standard_normal(m)
    assert_allclose_spec(
        ast.trsv(1.0, A, descr_s, Operation.none, b),
        ref_trsv(1.0, m, ptr, ind, val, descr_t, Operation.none, b),
        dtype=np.float64,
        scale=30,
    )


def test_trsv_missing_diag_rejected(rng):
    # build a lower-tri matrix with a zero row-diagonal structurally missing
    ptr = np.array([0, 1, 2])
    ind = np.array([0, 0])  # row 1 has no diagonal
    val = np.array([2.0, 3.0])
    A = ast.create_csr(2, 2, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    with pytest.raises(AoclSparseError) as e:
        ast.trsv(1.0, A, descr, Operation.none, np.ones(2))
    assert e.value.status == Status.invalid_value


def test_trsv_general_descr_rejected(rng):
    A, _ = _mk(rng, 4, 4, np.float64, ensure_diag=True)
    with pytest.raises(AoclSparseError) as e:
        ast.trsv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(4))
    assert e.value.status == Status.invalid_value


def test_trsv_large_blocked(rng):
    # m > block size exercises the scan over multiple blocks
    m = 300
    A, (ptr, ind, val, dense) = _mk(rng, m, m, np.float64, density=0.05, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.upper)
    b = rng.standard_normal(m)
    got = ast.trsv(1.0, A, descr, Operation.none, b)
    want = ref_trsv(1.0, m, ptr, ind, val, descr, Operation.none, b)
    assert_allclose_spec(got, want, dtype=np.float64, scale=100)


def test_trsv_strided(rng):
    m = 9
    A, (ptr, ind, val, dense) = _mk(rng, m, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b_full = rng.standard_normal(3 * m)
    got = ast.trsv_strided(1.0, A, descr, Operation.none, b_full, incb=3, incx=2)
    want = ref_trsv(1.0, m, ptr, ind, val, descr, Operation.none, b_full[: 3 * (m - 1) + 1 : 3])
    assert_allclose_spec(np.asarray(got)[:: 2][:m], want, dtype=np.float64, scale=30)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
def test_trsm(rng, dtype, fill):
    m, k = 21, 5
    A, (ptr, ind, val, dense) = _mk(rng, m, m, dtype, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill)
    B = rng.standard_normal((m, k)).astype(dtype)
    X = ast.trsm(2.0, A, descr, Operation.none, B)
    want = np.stack(
        [ref_trsv(2.0, m, ptr, ind, val, descr, Operation.none, B[:, j]) for j in range(k)],
        axis=1,
    )
    assert_allclose_spec(X, want, dtype=dtype, scale=30)
    # column-major interface round trip
    Xc = ast.trsm(2.0, A, descr, Operation.none, B.T, order=Order.column)
    assert_allclose_spec(np.asarray(Xc).T, want, dtype=dtype, scale=30)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose])
def test_mm_general(rng, dtype, op):
    m, n, k = 19, 13, 7
    A, (ptr, ind, val, dense) = _mk(rng, m, n, dtype)
    na, ma = (n, m) if op == Operation.none else (m, n)
    B = rng.standard_normal((na, k)).astype(dtype)
    C = rng.standard_normal((ma, k)).astype(dtype)
    got = ast.mm(1.5, A, MatrixDescriptor(), op, B, -0.5, C)
    want = ref_mm(1.5, m, n, ptr, ind, val, MatrixDescriptor(), op, B, -0.5, C)
    assert_allclose_spec(got, want, dtype=dtype, scale=10)


def test_mm_symmetric(rng):
    m, k = 15, 4
    A, (ptr, ind, val, dense) = _mk(rng, m, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.upper)
    B = rng.standard_normal((m, k))
    got = ast.mm(1.0, A, descr, Operation.none, B, 0.0)
    want = ref_mm(1.0, m, m, ptr, ind, val, descr, Operation.none, B, 0.0, np.zeros((m, k)))
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)


def test_mm_bad_shapes(rng):
    A, _ = _mk(rng, 5, 7, np.float64)
    with pytest.raises(AoclSparseError) as e:
        ast.mm(1.0, A, MatrixDescriptor(), Operation.none, np.ones((5, 3)), 0.0)
    assert e.value.status == Status.invalid_size
