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


# ---------------------------------------------------------------------------
# level-scheduled wavefront TRSV (KID 1; SURVEY §7 "lax.scan over levels")
# ---------------------------------------------------------------------------


def _circuit_tri(rng, m=96):
    full = np.tril(rng.random((m, m)) < 0.05) * rng.standard_normal((m, m))
    np.fill_diagonal(full, 2.0 + rng.random(m))
    full = np.tril(full) + np.triu(
        rng.standard_normal((m, m)) * (rng.random((m, m)) < 0.05), 1
    )
    ptr = np.concatenate([[0], np.cumsum((full != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(full)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, full[full != 0]), full


@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
@pytest.mark.parametrize("dt", [DiagType.non_unit, DiagType.unit])
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose])
def test_trsv_level_kid_parity(rng, fill, dt, op):
    A, full = _circuit_tri(rng)
    m = A.shape[0]
    b = rng.standard_normal(m)
    D = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=dt)
    x0 = np.asarray(ast.trsv(1.0, A, D, op, b, kid=0))
    x1 = np.asarray(ast.trsv(1.0, A, D, op, b, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12, atol=1e-12)
    # oracle parity (CLAUDE.md rule): both engines must track the scalar
    # reference, not merely each other
    _, _, _, rptr, rind, rval = ast.export_csr(A)
    want = ref_trsv(1.0, m, rptr, rind, rval, D, op, b)
    assert_allclose_spec(x1, want, dtype=np.float64, scale=30)


def test_trsv_level_shallow_dag(rng):
    """Circuit-class triangles have nlev << m — the wavefront's reason to
    exist (the blocked scan does m/nb sequential steps regardless)."""
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_level_form_for

    A, _ = _circuit_tri(rng, m=160)
    D = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    f = trsv_level_form_for(get_plan(A), D, Operation.none)
    assert f.nlev < 160 / 4


def test_trsv_level_refresh_and_trsm(rng):
    A, full = _circuit_tri(rng)
    m = A.shape[0]
    D = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    B = rng.standard_normal((m, 3))
    X0 = np.asarray(ast.trsm(1.0, A, D, Operation.none, B, kid=0))
    X1 = np.asarray(ast.trsm(1.0, A, D, Operation.none, B, kid=1))
    np.testing.assert_allclose(X1, X0, rtol=1e-12, atol=1e-12)
    # value update rebuilds the level form (plan.levels drops on refresh)
    _, _, _, ptr, ind, val = ast.export_csr(A)
    ast.update_values(A, np.asarray(val) * 2.0)
    b = rng.standard_normal(m)
    x0 = np.asarray(ast.trsv(1.0, A, D, Operation.none, b, kid=0))
    x1 = np.asarray(ast.trsv(1.0, A, D, Operation.none, b, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12, atol=1e-12)


def test_trsv_level_complex_conjtrans(rng):
    m = 48
    full = np.tril(rng.random((m, m)) < 0.08) * (
        rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    )
    np.fill_diagonal(full, 2.0 + rng.random(m))
    ptr = np.concatenate([[0], np.cumsum((full != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(full)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, full[full != 0])
    D = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    x0 = np.asarray(ast.trsv(1.0, A, D, Operation.conjugate_transpose, b, kid=0))
    x1 = np.asarray(ast.trsv(1.0, A, D, Operation.conjugate_transpose, b, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12, atol=1e-12)


def test_trsv_level_missing_diag(rng):
    m = 8
    ptr = np.arange(m + 1, dtype=np.int64)
    ind = np.zeros(m, np.int32)  # only column 0 entries: rows 1.. lack diag
    A = ast.create_csr(m, m, ptr, ind, np.ones(m))
    D = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.trsv(1.0, A, D, Operation.none, np.ones(m), kid=1)
    assert ei.value.status == Status.invalid_value


def test_trsv_strided_level_engine(rng):
    """trsv_strided forwards kid, so the level engine serves strided RHS
    identically to the blocked scan."""
    m = 48
    full = np.tril(rng.random((m, m)) < 0.1) * rng.standard_normal((m, m))
    np.fill_diagonal(full, 3.0)
    ptr = np.concatenate([[0], np.cumsum((full != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(full)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, full[full != 0])
    D = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    b = rng.standard_normal(2 * m)
    x0 = np.asarray(ast.trsv_strided(1.0, A, D, Operation.none, b, 2, kid=0))
    x1 = np.asarray(ast.trsv_strided(1.0, A, D, Operation.none, b, 2, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12)
