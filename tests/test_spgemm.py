"""SpGEMM family tests (reference: sp2m_tests.cpp, csr2m_tests.cpp,
spmm/spmmd/sp2md tests, syrk/syrkd, sypr/syprd, add_tests.cpp): staged
request protocol, op/descr combinations, dense-out fusion, upper-triangle
results, value-refresh finalize."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    AoclSparseError,
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    Request,
    Status,
)
from aoclsparse_tpu.utils.reference import csr_to_dense, effective_dense
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

GEN = MatrixDescriptor()


def _mk(rng, m, n, dtype=np.float64, **kw):
    ptr, ind, val, dense = random_csr(rng, m, n, dtype=dtype, **kw)
    return ast.create_csr(m, n, ptr, ind, val), dense


def _dense_of(h):
    m, n, nnz, ptr, ind, val = ast.export_csr(h)
    return csr_to_dense(m, n, ptr, ind, val)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize(
    "opA,opB",
    [
        (Operation.none, Operation.none),
        (Operation.transpose, Operation.none),
        (Operation.none, Operation.transpose),
        (Operation.conjugate_transpose, Operation.none),
    ],
)
def test_sp2m_ops(rng, dtype, opA, opB):
    mA, k, nB = 11, 8, 9
    if opA == Operation.none:
        A, dA = _mk(rng, mA, k, dtype)
        opA_d = dA
    else:
        A, dA = _mk(rng, k, mA, dtype)
        opA_d = dA.T if opA == Operation.transpose else dA.conj().T
    if opB == Operation.none:
        B, dB = _mk(rng, k, nB, dtype)
        opB_d = dB
    else:
        B, dB = _mk(rng, nB, k, dtype)
        opB_d = dB.T
    C = ast.sp2m(opA, GEN, A, opB, GEN, B)
    assert_allclose_spec(_dense_of(C), opA_d @ opB_d, dtype=dtype, scale=30)


def test_sp2m_two_stage_and_finalize(rng):
    A, dA = _mk(rng, 10, 7)
    B, dB = _mk(rng, 7, 12)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.nnz_count)
    want_pattern = (np.abs(dA) @ np.abs(dB)) != 0
    assert C.nnz == int(want_pattern.sum())
    # finalize fills values
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.finalize, C)
    assert_allclose_spec(_dense_of(C), dA @ dB, dtype=np.float64, scale=30)
    # update A values, finalize again (value-refresh path)
    m, n, nnz, ptr, ind, val = ast.export_csr(A)
    newval = np.asarray(val) * 2.0
    ast.update_values(A, newval)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.finalize, C)
    assert_allclose_spec(_dense_of(C), 2.0 * dA @ dB, dtype=np.float64, scale=30)


def test_csr2m_spmm(rng):
    A, dA = _mk(rng, 6, 5)
    B, dB = _mk(rng, 5, 8)
    C1 = ast.csr2m(Operation.none, GEN, A, Operation.none, GEN, B)
    C2 = ast.spmm(A, B)
    assert_allclose_spec(_dense_of(C1), dA @ dB, dtype=np.float64, scale=30)
    assert_allclose_spec(_dense_of(C2), dA @ dB, dtype=np.float64, scale=30)


def test_sp2m_symmetric_descriptors(rng):
    """sp2m with a symmetric descriptor expands the triangle first."""
    from aoclsparse_tpu import FillMode, MatrixType

    k = 8
    A, dA = _mk(rng, k, k, ensure_diag=True)
    B, dB = _mk(rng, k, k)
    descrA = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower)
    mA, nA, nnzA, pA, iA, vA = ast.export_csr(A)
    effA = effective_dense(k, k, pA, iA, vA, descrA)
    C = ast.sp2m(Operation.none, descrA, A, Operation.none, GEN, B)
    assert_allclose_spec(_dense_of(C), effA @ dB, dtype=np.float64, scale=30)


def test_sp2m_dim_mismatch(rng):
    A, _ = _mk(rng, 5, 4)
    B, _ = _mk(rng, 5, 4)
    with pytest.raises(AoclSparseError) as e:
        ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B)
    assert e.value.status == Status.invalid_size


def test_sp2md_spmmd(rng):
    A, dA = _mk(rng, 7, 6)
    B, dB = _mk(rng, 6, 9)
    C0 = rng.standard_normal((7, 9))
    got = ast.sp2md(Operation.none, GEN, A, Operation.none, GEN, B, 1.5, -0.5, C0)
    assert_allclose_spec(got, 1.5 * dA @ dB - 0.5 * C0, dtype=np.float64, scale=30)
    got2 = ast.spmmd(A, B)
    assert_allclose_spec(got2, dA @ dB, dtype=np.float64, scale=30)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose])
def test_syrk(rng, dtype, op):
    if dtype == np.complex128 and op == Operation.transpose:
        pytest.skip("reference parity: complex transpose unsupported")
    A, dA = _mk(rng, 8, 6, dtype)
    C = ast.syrk(op, A)
    opd = dA.conj().T if np.issubdtype(dtype, np.complexfloating) else dA.T
    want = dA @ opd if op == Operation.none else opd @ dA
    want = np.triu(want)  # upper-triangle result
    assert_allclose_spec(_dense_of(C), want, dtype=dtype, scale=30)


def test_syrk_complex_transpose_rejected(rng):
    A, _ = _mk(rng, 4, 4, np.complex128)
    with pytest.raises(AoclSparseError) as e:
        ast.syrk(Operation.transpose, A)
    assert e.value.status == Status.not_implemented


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_syrkd(rng, dtype):
    A, dA = _mk(rng, 8, 5, dtype)
    C0 = rng.standard_normal((8, 8)).astype(dtype)
    got = ast.syrkd(Operation.none, A, 2.0, 0.5, C0)
    opd = dA.conj().T if np.issubdtype(dtype, np.complexfloating) else dA.T
    want_full = 2.0 * (dA @ opd)
    want = np.triu(want_full) + np.tril(0.5 * C0, -1) + np.diag(np.diag(0.5 * C0)) * 0
    # only the upper triangle is authoritative; compare that
    got_u = np.triu(np.asarray(got))
    want_u = np.triu(want_full + 0.5 * C0)
    assert_allclose_spec(got_u, want_u, dtype=dtype, scale=30)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose, Operation.conjugate_transpose])
def test_sypr(rng, dtype, op):
    cplx = np.issubdtype(dtype, np.complexfloating)
    if cplx and op == Operation.transpose:
        pytest.skip("reference parity")
    if (not cplx) and op == Operation.conjugate_transpose:
        op = Operation.transpose
    mt = MatrixType.hermitian if cplx else MatrixType.symmetric
    if op == Operation.none:
        A, dA = _mk(rng, 7, 5, dtype)
        B, _ = _mk(rng, 5, 5, dtype, ensure_diag=True)
    else:
        A, dA = _mk(rng, 5, 7, dtype)
        B, _ = _mk(rng, 5, 5, dtype, ensure_diag=True)
    descrB = MatrixDescriptor(type=mt, fill_mode=FillMode.upper)
    mB, nB, nnzB, ptrB, indB, valB = ast.export_csr(B)
    dB = effective_dense(5, 5, ptrB, indB, valB, descrB)
    C = ast.sypr(op, A, descrB, B)
    if op == Operation.none:
        right = dA.conj().T if cplx else dA.T
        want = dA @ dB @ right
    else:
        left = dA.conj().T if cplx else dA.T
        want = left @ dB @ dA
    want = np.triu(want)
    assert_allclose_spec(_dense_of(C), want, dtype=dtype, scale=100)


def test_sypr_two_stage(rng):
    A, dA = _mk(rng, 6, 4)
    B, _ = _mk(rng, 4, 4, ensure_diag=True)
    descrB = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.upper)
    mB, nB, nnzB, ptrB, indB, valB = ast.export_csr(B)
    dB = effective_dense(4, 4, ptrB, indB, valB, descrB)
    C = ast.sypr(Operation.none, A, descrB, B, Request.nnz_count)
    C = ast.sypr(Operation.none, A, descrB, B, Request.finalize, C)
    want = np.triu(dA @ dB @ dA.T)
    assert_allclose_spec(_dense_of(C), want, dtype=np.float64, scale=100)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose, Operation.conjugate_transpose])
def test_syprd(rng, dtype, op):
    cplx = np.issubdtype(dtype, np.complexfloating)
    if cplx and op == Operation.transpose:
        pytest.skip("reference parity")
    if op == Operation.none:
        A, dA = _mk(rng, 6, 4, dtype)
        B = rng.standard_normal((4, 4))
    else:
        A, dA = _mk(rng, 4, 6, dtype)
        B = rng.standard_normal((4, 4))
    if cplx:
        B = B + 1j * rng.standard_normal(B.shape)
        B = (B + B.conj().T) / 2  # hermitian
    else:
        B = (B + B.T) / 2
    B = B.astype(dtype)
    got = ast.syprd(op, A, B, 1.0, 0.0)
    if op == Operation.none:
        right = dA.conj().T if cplx else dA.T
        want = dA @ B @ right
    else:
        left = dA.conj().T if cplx else dA.T
        want = (left if op == Operation.conjugate_transpose else dA.T) @ B @ dA
    assert_allclose_spec(
        np.triu(np.asarray(got)), np.triu(want), dtype=dtype, scale=100
    )


@pytest.mark.parametrize("op", [Operation.none, Operation.transpose])
def test_add(rng, op):
    if op == Operation.none:
        A, dA = _mk(rng, 6, 8)
        opd = dA
    else:
        A, dA = _mk(rng, 8, 6)
        opd = dA.T
    B, dB = _mk(rng, 6, 8)
    C = ast.add(op, 1.5, A, B)
    assert_allclose_spec(_dense_of(C), 1.5 * opd + dB, dtype=np.float64, scale=30)


def test_add_shape_mismatch(rng):
    A, _ = _mk(rng, 3, 4)
    B, _ = _mk(rng, 4, 4)
    with pytest.raises(AoclSparseError) as e:
        ast.add(Operation.none, 1.0, A, B)
    assert e.value.status == Status.invalid_size


def test_spgemm_host_numeric_engine(rng, monkeypatch):
    """The threaded host numeric engine (reference csr2m.cpp:405-545 on the
    expansion plan) matches the device segment-sum, including complex conj
    flows and the staged finalize protocol."""
    from aoclsparse_tpu import Request
    from aoclsparse_tpu.kernels.autotune import autotune_spgemm

    m = 96
    dense = (rng.random((m, m)) < 0.08) * (
        rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    )
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    want = dense @ dense
    monkeypatch.setenv("AOCLSPARSE_TPU_SPGEMM_HOST", "1")
    C = ast.spmm(A, A)
    _, _, _, cp, ci, cv = ast.export_csr(C)
    got = np.zeros((m, m), complex)
    for i in range(m):
        got[i, ci[cp[i] : cp[i + 1]]] = cv[cp[i] : cp[i + 1]]
    np.testing.assert_allclose(got, want, atol=1e-10)
    # syrk exercises the conj_b=True host flow for complex dtypes
    S = ast.syrk(Operation.none, A)
    _, _, _, sp, si, sv = ast.export_csr(S)
    wantH = dense @ np.conj(dense.T)
    gotH = np.zeros((m, m), complex)
    for i in range(m):
        gotH[i, si[sp[i] : sp[i + 1]]] = sv[sp[i] : sp[i + 1]]
    triu = np.triu(np.ones((m, m), bool))
    np.testing.assert_allclose(gotH[triu], wantH[triu], atol=1e-10)
    monkeypatch.delenv("AOCLSPARSE_TPU_SPGEMM_HOST")
    # autotune reports all available engines and finalize stays correct
    C2, results = autotune_spgemm(A, A)
    assert "expand" in results and "host" in results
    C2 = ast.sp2m(
        Operation.none,
        MatrixDescriptor(),
        A,
        Operation.none,
        MatrixDescriptor(),
        A,
        request=Request.finalize,
        C=C2,
    )
    _, _, _, cp, ci, cv = ast.export_csr(C2)
    got = np.zeros((m, m), complex)
    for i in range(m):
        got[i, ci[cp[i] : cp[i + 1]]] = cv[cp[i] : cp[i + 1]]
    np.testing.assert_allclose(got, want, atol=1e-10)
