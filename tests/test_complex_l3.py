"""Complex-dtype level-3 sweeps (VERDICT r1 #8: thin complex coverage):
sp2m/sp2md/spmmd/syrk/syrkd/sypr/add over complex64/complex128 with all
supported op combos, against dense oracles with the reference tolerance
model. Reference: the c/z instantiations of the level-3 gtests
(sp2m_tests.cpp, syrk_tests.cpp, sypr_tests.cpp)."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import FillMode, MatrixType, Order, Request

GEN = MatrixDescriptor()


def _cmat(rng, m, n, dtype, density=0.3):
    dense = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))).astype(dtype)
    dense[np.abs(dense) < (1 - density) * 1.6] = 0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, n, ptr, ind, dense[dense != 0]), dense


def _tocsr_dense(C):
    m, n = C.shape
    _, _, _, ptr, ind, val = ast.export_csr(C)
    d = np.zeros((m, n), dtype=val.dtype)
    d[np.repeat(np.arange(m), np.diff(ptr)), ind] = val
    return d


def _opd(d, op):
    if op == Operation.transpose:
        return d.T
    if op == Operation.conjugate_transpose:
        return d.conj().T
    return d


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize(
    "opA,opB",
    [
        (Operation.none, Operation.none),
        (Operation.transpose, Operation.none),
        (Operation.conjugate_transpose, Operation.none),
        (Operation.none, Operation.transpose),
        (Operation.none, Operation.conjugate_transpose),
        (Operation.transpose, Operation.conjugate_transpose),
    ],
)
def test_sp2m_complex_ops(rng, dtype, opA, opB):
    mA, k, nB = 24, 20, 18
    shapeA = (mA, k) if opA == Operation.none else (k, mA)
    shapeB = (k, nB) if opB == Operation.none else (nB, k)
    A, dA = _cmat(rng, *shapeA, dtype)
    B, dB = _cmat(rng, *shapeB, dtype)
    C = ast.sp2m(opA, GEN, A, opB, GEN, B, Request.full_computation)
    got = _tocsr_dense(C)
    want = _opd(dA, opA) @ _opd(dB, opB)
    patt = got != 0
    tol = 1e-4 if dtype == np.complex64 else 1e-11
    np.testing.assert_allclose(got[patt], want[patt], atol=tol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_sp2m_staged_complex(rng, dtype):
    m = 20
    A, dA = _cmat(rng, m, m, dtype)
    B, dB = _cmat(rng, m, m, dtype)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.nnz_count)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.finalize, C)
    got = _tocsr_dense(C)
    patt = got != 0
    tol = 1e-4 if dtype == np.complex64 else 1e-11
    np.testing.assert_allclose(got[patt], (dA @ dB)[patt], atol=tol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("order", [Order.row, Order.column])
def test_sp2md_complex(rng, dtype, order):
    m, k, n = 16, 14, 12
    A, dA = _cmat(rng, m, k, dtype)
    B, dB = _cmat(rng, k, n, dtype)
    alpha, beta = 1.5 - 0.5j, 0.25 + 1j
    C0 = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))).astype(dtype)
    Cin = C0.T.copy() if order == Order.column else C0.copy()
    out = np.asarray(
        ast.sp2md(Operation.none, GEN, A, Operation.none, GEN, B, alpha, beta, C=Cin, order=order)
    )
    if order == Order.column:
        out = out.T
    want = alpha * dA @ dB + beta * C0
    tol = 1e-4 if dtype == np.complex64 else 1e-11
    np.testing.assert_allclose(out, want, atol=tol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_spmmd_complex(rng, dtype):
    m, k, n = 14, 12, 10
    A, dA = _cmat(rng, m, k, dtype)
    B, dB = _cmat(rng, k, n, dtype)
    out = np.asarray(ast.spmmd(A, B, order=Order.row))
    tol = 1e-4 if dtype == np.complex64 else 1e-11
    np.testing.assert_allclose(out, dA @ dB, atol=tol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_syrk_syrkd_complex(rng, dtype):
    # complex syrk: C = A A^H, Hermitian result, upper triangle
    m, n = 16, 12
    A, dA = _cmat(rng, m, n, dtype)
    S = ast.syrk(Operation.none, A)
    got = _tocsr_dense(S)
    want = dA @ dA.conj().T
    patt = got != 0
    tol = 1e-4 if dtype == np.complex64 else 1e-11
    assert np.all(np.nonzero(got)[1] >= np.nonzero(got)[0])  # upper
    np.testing.assert_allclose(got[patt], want[patt], atol=tol)
    # syrkd: alpha/beta use their REAL parts (reference note)
    C0 = (rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))).astype(dtype)
    out = np.asarray(ast.syrkd(Operation.none, A, 2.0 + 5j, 0.5 - 3j, C=C0.copy()))
    iu = np.triu_indices(m)
    want_u = 2.0 * want[iu] + 0.5 * C0[iu]
    np.testing.assert_allclose(out[iu], want_u, atol=tol)
    il = np.tril_indices(m, -1)
    np.testing.assert_allclose(out[il], C0[il])  # untouched lower


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_sypr_complex_hermitian(rng, dtype):
    # C = A B A^H with B Hermitian (upper stored)
    n, m = 10, 14
    A, dA = _cmat(rng, m, n, dtype)
    Bh = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Bh = (Bh + Bh.conj().T) / 2
    Bu = np.triu(Bh)
    ptr = np.concatenate([[0], np.cumsum((Bu != 0).sum(1))]).astype(np.int64)
    B = ast.create_csr(n, n, ptr, np.nonzero(Bu)[1].astype(np.int32), Bu[Bu != 0].astype(dtype))
    descrB = MatrixDescriptor(type=MatrixType.hermitian, fill_mode=FillMode.upper)
    S = ast.sypr(Operation.none, A, descrB, B)
    got = _tocsr_dense(S)
    want = dA @ Bh.astype(dtype) @ dA.conj().T
    patt = got != 0
    tol = 2e-4 if dtype == np.complex64 else 1e-10
    np.testing.assert_allclose(got[patt], want[patt], atol=tol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_add_complex(rng, dtype):
    m, n = 15, 13
    A, dA = _cmat(rng, m, n, dtype)
    B, dB = _cmat(rng, m, n, dtype)
    alpha = 0.5 + 2j
    C = ast.add(Operation.none, alpha, A, B)
    got = _tocsr_dense(C)
    want = alpha * dA + dB
    patt = (dA != 0) | (dB != 0)
    tol = 1e-5 if dtype == np.complex64 else 1e-12
    np.testing.assert_allclose(got[patt], want[patt], atol=tol)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_mm_complex_hermitian_descr(rng, dtype):
    m = 14
    dense = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    dense = (dense + dense.conj().T) / 2
    up = np.triu(dense).astype(dtype)
    ptr = np.concatenate([[0], np.cumsum((up != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(up)[1].astype(np.int32), up[up != 0])
    herm = MatrixDescriptor(type=MatrixType.hermitian, fill_mode=FillMode.upper)
    B = (rng.standard_normal((m, 5)) + 1j * rng.standard_normal((m, 5))).astype(dtype)
    out = np.asarray(ast.mm(1.0, A, herm, Operation.none, B, 0.0))
    full = np.triu(up) + np.triu(up, 1).conj().T
    tol = 1e-4 if dtype == np.complex64 else 1e-11
    np.testing.assert_allclose(out, full @ B, atol=tol)
