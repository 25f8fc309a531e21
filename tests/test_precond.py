"""Preconditioner tests (reference: ilu_tests.cpp, symgs_tests.cpp,
sorv_tests.cpp): factorization vs IKJ oracle, smoother solves, SymGS descr
matrix vs the exact 2xSpMV+2xTRSV formula, SOR sweep vs sequential oracle,
unsupported-mode statuses."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    AoclSparseError,
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    SorType,
    Status,
)
from aoclsparse_tpu.utils.reference import csr_to_dense, effective_dense, ref_ilu0, ref_sor
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

GEN = MatrixDescriptor()


def _mk(rng, m, dtype=np.float64, density=0.3):
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=dtype, density=density, ensure_diag=True)
    return ast.create_csr(m, m, ptr, ind, val), (ptr, ind, val, dense)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_ilu0_factorization_matches_oracle(rng, dtype):
    m = 18
    A, (ptr, ind, val, dense) = _mk(rng, m, dtype)
    st = ast.ilu0_factorize(A)
    want_lu, _ = ref_ilu0(m, ptr, ind, val)
    assert_allclose_spec(np.asarray(st.lu), want_lu, dtype=dtype, scale=100)


def test_ilu_smoother_solves_lu(rng):
    m = 20
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64)
    b = rng.standard_normal(m)
    x = ast.ilu_smoother(A, GEN, b)
    lu, diag_ptr = ref_ilu0(m, ptr, ind, val)
    # reconstruct L (unit) and U densely from lu values
    L = np.eye(m)
    U = np.zeros((m, m))
    for i in range(m):
        for k in range(int(ptr[i]), int(ptr[i + 1])):
            j = int(ind[k])
            if j < i:
                L[i, j] = lu[k]
            else:
                U[i, j] = lu[k]
    want = np.linalg.solve(U, np.linalg.solve(L, b))
    assert_allclose_spec(x, want, dtype=np.float64, scale=100)


def test_ilu0_missing_diag(rng):
    ptr = np.array([0, 1, 2])
    ind = np.array([0, 0])
    A = ast.create_csr(2, 2, ptr, ind, np.array([1.0, 1.0]))
    with pytest.raises(AoclSparseError) as e:
        ast.ilu0_factorize(A)
    assert e.value.status == Status.invalid_value


def test_ilu0_cached(rng):
    A, _ = _mk(rng, 10)
    s1 = ast.ilu0_factorize(A)
    s2 = ast.ilu0_factorize(A)
    assert s1 is s2
    # update_values invalidates
    m, n, nnz, ptr, ind, val = ast.export_csr(A)
    ast.update_values(A, np.asarray(val) * 2)
    assert A.ilu_state is None


def _symgs_dense_formula(dense, alpha, b, x0):
    """The reference's exact 3-step formula (symgs.hpp:60-85)."""
    L = np.tril(dense, -1)
    U = np.triu(dense, 1)
    D = np.diag(np.diag(dense))
    q = alpha * (U @ x0)
    x1 = np.linalg.solve(L + D, b - q)
    r = L @ x1
    x = np.linalg.solve(U + D, b - r)
    return x


@pytest.mark.parametrize("alpha", [1.0, 0.7])
def test_symgs_general(rng, alpha):
    m = 16
    A, (ptr, ind, val, dense) = _mk(rng, m)
    b = rng.standard_normal(m)
    x = ast.symgs(Operation.none, A, GEN, alpha, b)
    want = _symgs_dense_formula(dense, alpha, b, np.zeros(m))
    assert_allclose_spec(x, want, dtype=np.float64, scale=100)


def test_symgs_general_x0(rng):
    m = 14
    A, (ptr, ind, val, dense) = _mk(rng, m)
    b = rng.standard_normal(m)
    x0 = rng.standard_normal(m)
    x = ast.symgs(Operation.none, A, GEN, 1.0, b, x0=x0)
    want = _symgs_dense_formula(dense, 1.0, b, x0)
    assert_allclose_spec(x, want, dtype=np.float64, scale=100)


def test_symgs_fused_refreshes_after_update_values(rng):
    # the fused one-dispatch sweep caches a jitted closure on the plan; a
    # value swap must re-trace it (same contract as the fused solvers)
    m = 16
    A, (ptr, ind, val, dense) = _mk(rng, m)
    b = rng.standard_normal(m)
    x1 = ast.symgs(Operation.none, A, GEN, 1.0, b)
    v2 = rng.standard_normal(len(val)) + 3.0
    ast.update_values(A, v2)
    d2 = np.zeros((m, m))
    d2[np.repeat(np.arange(m), np.diff(ptr)), ind] = v2
    x2 = ast.symgs(Operation.none, A, GEN, 1.0, b)
    want = _symgs_dense_formula(d2, 1.0, b, np.zeros(m))
    assert_allclose_spec(x2, want, dtype=np.float64, scale=100)


@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
def test_symgs_symmetric(rng, fill, make_csr):
    m = 12
    ptr, ind, val, dense = make_csr(m, m, ensure_diag=True)
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=fill)
    eff = effective_dense(m, m, ptr, ind, val, descr)
    b = np.random.default_rng(1).standard_normal(m)
    x = ast.symgs(Operation.none, A, descr, 1.0, b)
    want = _symgs_dense_formula(eff, 1.0, b, np.zeros(m))
    assert_allclose_spec(x, want, dtype=np.float64, scale=100)


def test_symgs_hermitian(rng):
    m = 10
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=np.complex128, ensure_diag=True)
    # a valid hermitian matrix stores a real diagonal (the reference's trsv
    # uses the stored triangle directly, symgs.hpp:130-149)
    val = np.array(val)
    for i in range(m):
        for k in range(int(ptr[i]), int(ptr[i + 1])):
            if int(ind[k]) == i:
                val[k] = val[k].real
                dense[i, i] = dense[i, i].real
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.hermitian, fill_mode=FillMode.lower)
    eff = effective_dense(m, m, ptr, ind, val, descr)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    x = ast.symgs(Operation.none, A, descr, 1.0, b)
    want = _symgs_dense_formula(eff, 1.0, b, np.zeros(m, complex))
    assert_allclose_spec(x, want, dtype=np.complex128, scale=100)


def test_symgs_triangular_quick_exit(rng):
    m = 11
    A, (ptr, ind, val, dense) = _mk(rng, m)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    x = ast.symgs(Operation.none, A, descr, 1.0, np.ones(m))
    want = np.linalg.solve(np.tril(dense), np.ones(m))
    assert_allclose_spec(x, want, dtype=np.float64, scale=100)


def test_symgs_mv_fused(rng):
    m = 9
    A, (ptr, ind, val, dense) = _mk(rng, m)
    b = rng.standard_normal(m)
    x, y = ast.symgs_mv(Operation.none, A, GEN, 1.0, b)
    assert_allclose_spec(y, dense @ np.asarray(x), dtype=np.float64, scale=100)


def test_symgs_general_conj_trans_rejected(rng):
    A, _ = _mk(rng, 5)
    with pytest.raises(AoclSparseError) as e:
        ast.symgs(Operation.conjugate_transpose, A, GEN, 1.0, np.ones(5))
    assert e.value.status == Status.not_implemented


def test_sorv_forward(rng):
    m = 15
    A, (ptr, ind, val, dense) = _mk(rng, m)
    b = rng.standard_normal(m)
    x0 = rng.standard_normal(m)
    omega = 1.3
    got = ast.sorv(SorType.forward, GEN, A, omega, 1.0, x0, b)
    want = ref_sor(omega, m, ptr, ind, val, x0, b, sweeps=1)
    assert_allclose_spec(got, want, dtype=np.float64, scale=100)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_sorv_complex(rng, dtype):
    """csorv/zsorv surface: the reference declares the c/z wrappers
    (aoclsparse_sorv.cpp:54-81) but stubs complex with not_implemented
    (aoclsparse_sorv.hpp:130-133); here the sweep is implemented — a
    superset of the reference surface, complex omega included."""
    m = 12
    A, (ptr, ind, val, dense) = _mk(rng, m, dtype)
    b = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(dtype)
    x0 = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(dtype)
    omega = 1.2 + 0.1j
    got = ast.sorv(SorType.forward, GEN, A, omega, 1.0, x0, b)
    want = ref_sor(omega, m, ptr, ind, val, x0, b, sweeps=1)
    assert_allclose_spec(got, want, dtype=dtype, scale=100)


def test_sorv_alpha_zero_starts_from_zero(rng):
    m = 8
    A, (ptr, ind, val, dense) = _mk(rng, m)
    b = rng.standard_normal(m)
    got = ast.sorv(SorType.forward, GEN, A, 1.0, 0.0, rng.standard_normal(m), b)
    want = ref_sor(1.0, m, ptr, ind, val, np.zeros(m), b, sweeps=1)
    assert_allclose_spec(got, want, dtype=np.float64, scale=100)


def test_sorv_unsupported_modes(rng):
    A, _ = _mk(rng, 5)
    with pytest.raises(AoclSparseError) as e:
        ast.sorv(SorType.backward, GEN, A, 1.0, 1.0, np.ones(5), np.ones(5))
    assert e.value.status == Status.not_implemented
    with pytest.raises(AoclSparseError) as e:
        ast.sorv(
            SorType.forward,
            MatrixDescriptor(type=MatrixType.symmetric),
            A,
            1.0,
            1.0,
            np.ones(5),
            np.ones(5),
        )
    assert e.value.status == Status.not_implemented


def test_ilu_smoother_level_engine(rng):
    """ilu_smoother kid=1 (level-scheduled factor sweeps) matches the
    blocked default exactly and rejects unknown kids."""
    m = 96
    dense = (rng.random((m, m)) < 0.06) * rng.standard_normal((m, m))
    np.fill_diagonal(dense, 4.0 + rng.random(m))
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    b = rng.standard_normal(m)
    x0 = np.asarray(ast.ilu_smoother(A, None, b))
    x1 = np.asarray(ast.ilu_smoother(A, None, b, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12, atol=1e-12)
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.ilu_smoother(A, None, b, kid=9)
    assert ei.value.status == Status.invalid_kid


def test_symgs_kid_level_engine(rng):
    """symgs forwards its kid to trsv, so kid=1 runs both triangular sweeps
    on the level-scheduled engine — exact parity with the default."""
    from aoclsparse_tpu import MatrixDescriptor, Operation

    m = 96
    dense = (rng.random((m, m)) < 0.06) * rng.standard_normal((m, m))
    dense = (dense + dense.T) / 2
    np.fill_diagonal(dense, 5.0 + rng.random(m))
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    b = rng.standard_normal(m)
    D = MatrixDescriptor()
    x0 = np.asarray(ast.symgs(Operation.none, A, D, 1.0, b, kid=0))
    x1 = np.asarray(ast.symgs(Operation.none, A, D, 1.0, b, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12, atol=1e-12)
