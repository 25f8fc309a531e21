"""Remaining op-parameter combinations: column-order mm with beta, symgs kid
passthrough, gmres restart==1, trsm kid, dotmv with hint, sp2md transposes."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    AoclSparseError,
    MatrixDescriptor,
    MatrixType,
    Operation,
    Order,
    Status,
)
from aoclsparse_tpu.utils.reference import ref_mm, ref_mv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

GEN = MatrixDescriptor()


def test_mm_column_order_beta(rng):
    m, n, k = 11, 9, 4
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    A = ast.create_csr(m, n, ptr, ind, val)
    B = rng.standard_normal((n, k))
    C = rng.standard_normal((m, k))
    # column-major caller passes transposed buffers
    got = ast.mm(1.5, A, GEN, Operation.none, B.T, -0.25, C.T, order=Order.column)
    want = ref_mm(1.5, m, n, ptr, ind, val, GEN, Operation.none, B, -0.25, C)
    assert_allclose_spec(np.asarray(got).T, want, dtype=np.float64, scale=10)


def test_mm_transpose_column_order(rng):
    m, n, k = 8, 12, 3
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    A = ast.create_csr(m, n, ptr, ind, val)
    B = rng.standard_normal((m, k))
    got = ast.mm(1.0, A, GEN, Operation.transpose, B.T, 0.0, order=Order.column)
    want = dense.T @ B
    assert_allclose_spec(np.asarray(got).T, want, dtype=np.float64, scale=10)


def test_symgs_kid_passthrough(rng):
    m = 10
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.4, ensure_diag=True)
    A = ast.create_csr(m, m, ptr, ind, val)
    x0 = ast.symgs(Operation.none, A, GEN, 1.0, np.ones(m), kid=0)
    x1 = ast.symgs(Operation.none, A, GEN, 1.0, np.ones(m))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1))
    with pytest.raises(AoclSparseError) as e:
        ast.symgs(Operation.none, A, GEN, 1.0, np.ones(m), kid=77)
    assert e.value.status == Status.invalid_kid


def test_gmres_restart_one(rng):
    m = 20
    dense = rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.0] = 0
    np.fill_diagonal(dense, m)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 1)
    ast.itsol_option_set(h, "gmres iteration limit", 2000)
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-8)
    b = rng.standard_normal(m)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-5)


def test_trsm_kid_invalid(rng):
    m = 8
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.5, ensure_diag=True)
    A = ast.create_csr(m, m, ptr, ind, val)
    with pytest.raises(AoclSparseError) as e:
        ast.trsm(
            1.0,
            A,
            MatrixDescriptor(type=MatrixType.triangular),
            Operation.none,
            np.ones((m, 2)),
            kid=123,
        )
    assert e.value.status == Status.invalid_kid


def test_dotmv_after_hint_optimize(rng):
    m = 14
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.4)
    A = ast.create_csr(m, m, ptr, ind, val)
    ast.set_dotmv_hint(A, Operation.none, GEN, nop=10)
    ast.optimize(A)
    x = rng.standard_normal(m)
    y, d = ast.dotmv(1.0, A, GEN, Operation.none, x, 0.0)
    want_y = dense @ x
    assert_allclose_spec(np.asarray(y), want_y, dtype=np.float64, scale=10)
    assert abs(float(d) - x @ want_y) < 1e-8 * max(1, abs(x @ want_y))


@pytest.mark.parametrize(
    "opA,opB",
    [(Operation.transpose, Operation.none), (Operation.none, Operation.transpose)],
)
def test_sp2md_transposes(rng, opA, opB):
    k = 9
    if opA == Operation.none:
        pA, iA, vA, dA = random_csr(rng, 7, k, density=0.4)
        A = ast.create_csr(7, k, pA, iA, vA)
        da = dA
    else:
        pA, iA, vA, dA = random_csr(rng, k, 7, density=0.4)
        A = ast.create_csr(k, 7, pA, iA, vA)
        da = dA.T
    if opB == Operation.none:
        pB, iB, vB, dB = random_csr(rng, k, 6, density=0.4)
        B = ast.create_csr(k, 6, pB, iB, vB)
        db = dB
    else:
        pB, iB, vB, dB = random_csr(rng, 6, k, density=0.4)
        B = ast.create_csr(6, k, pB, iB, vB)
        db = dB.T
    got = ast.sp2md(opA, GEN, A, opB, GEN, B, 2.0)
    assert_allclose_spec(np.asarray(got), 2.0 * da @ db, dtype=np.float64, scale=30)
