"""Iterative solver tests (reference: cg_tests.cpp, gmres_tests.cpp with
cg_ut_functions.hpp tol expected_precision(2.0), gmres tol (100)): forward
CG/PCG/GMRES convergence + residual checks, rinfo population, RCI manual
drive, maxit status, options registry validation."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation, Status
from aoclsparse_tpu.solvers import RINFO_ITER, RINFO_RES_NORM, RINFO_RHS_NORM, RciJob
from aoclsparse_tpu.utils.tolerances import expected_precision

GEN = MatrixDescriptor()


def _spd_csr(rng, m, density=0.3):
    B = rng.standard_normal((m, m))
    B[np.abs(B) < 1.2] = 0
    dense = B @ B.T + m * np.eye(m)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    val = dense[dense != 0]
    return ast.create_csr(m, m, ptr, ind, val), dense


def _general_csr(rng, m):
    dense = rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.0] = 0
    np.fill_diagonal(dense, m / 2.0)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    val = dense[dense != 0]
    return ast.create_csr(m, m, ptr, ind, val), dense


def test_cg_forward(rng):
    m = 25
    A, dense = _spd_csr(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    want = np.linalg.solve(dense, b)
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)
    assert rinfo[RINFO_ITER] > 0
    assert rinfo[RINFO_RES_NORM] <= expected_precision(np.float64, 2.0) * np.linalg.norm(b)
    assert abs(rinfo[RINFO_RHS_NORM] - np.linalg.norm(b)) < 1e-12


def test_pcg_sgs_converges_fewer_iters(rng):
    m = 40
    A, dense = _spd_csr(rng, m)
    b = rng.standard_normal(m)
    h1 = ast.itsol_init(np.float64)
    x1, r1, s1 = ast.itsol_solve(h1, m, A, GEN, b)
    h2 = ast.itsol_init(np.float64)
    ast.itsol_option_set(h2, "cg preconditioner", "SGS")
    x2, r2, s2 = ast.itsol_solve(h2, m, A, GEN, b)
    assert s2 == Status.success
    np.testing.assert_allclose(np.asarray(x2), np.linalg.solve(dense, b), atol=1e-6)
    assert r2[RINFO_ITER] <= r1[RINFO_ITER]


def test_cg_user_precond_jacobi(rng):
    m = 30
    A, dense = _spd_csr(rng, m)
    b = rng.standard_normal(m)
    d = np.diag(dense)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "cg preconditioner", "User")
    x, rinfo, status = ast.itsol_solve(
        h, m, A, GEN, b, precond=lambda u: np.asarray(u) / d
    )
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-6)


def test_cg_maxit(rng):
    m = 30
    A, dense = _spd_csr(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "cg iteration limit", 2)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.maxit


def test_cg_not_spd_raises(rng):
    # indefinite symmetric matrix -> p^T A p goes nonpositive -> numerical_error
    m = 10
    dense = -np.eye(m) * m
    dense[0, 1] = dense[1, 0] = 1.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    h = ast.itsol_init(np.float64)
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_solve(h, m, A, GEN, rng.standard_normal(m))
    assert e.value.status == Status.numerical_error


def test_gmres_forward(rng):
    m = 30
    A, dense = _general_csr(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-10)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-6)
    assert rinfo[RINFO_ITER] > 0


def test_gmres_ilu0_precond(rng):
    m = 40
    A, dense = _general_csr(rng, m)
    b = rng.standard_normal(m)
    h0 = ast.itsol_init(np.float64)
    ast.itsol_option_set(h0, "iterative method", "GMRES")
    ast.itsol_option_set(h0, "gmres rel tolerance", 1e-10)
    x0, r0, s0 = ast.itsol_solve(h0, m, A, GEN, b)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-10)
    ast.itsol_option_set(h, "gmres preconditioner", "ILU0")
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-6)
    assert rinfo[RINFO_ITER] <= r0[RINFO_ITER]


def test_gmres_restart(rng):
    m = 50
    A, dense = _general_csr(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 5)
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-10)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-5)


def test_rci_manual_drive(rng):
    """Drive the CG RCI loop by hand (the reference's RCI usage pattern,
    sample_itsol_d_rci.cpp analog)."""
    m = 20
    A, dense = _spd_csr(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_rci_input(h, m, b)
    rci = ast.itsol_rci_solve(h)
    job, u = rci.step()
    n_mv = 0
    while job != RciJob.stop:
        if job == RciJob.mv:
            n_mv += 1
            job, u = rci.step(ast.mv(1.0, A, GEN, Operation.none, u, 0.0))
        elif job == RciJob.precond:
            job, u = rci.step(u)
        else:
            job, u = rci.step()
    np.testing.assert_allclose(np.asarray(rci.x), np.linalg.solve(dense, b), atol=1e-6)
    assert n_mv == int(h.rinfo[RINFO_ITER]) + 1  # one mv per iter + initial residual


def test_gmres_rci_manual_drive(rng):
    """Drive the GMRES RCI stepper by hand with a user preconditioner."""
    m = 24
    A, dense = _general_csr(rng, m)
    b = rng.standard_normal(m)
    d = np.diag(dense)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-10)
    ast.itsol_option_set(h, "gmres preconditioner", "User")
    ast.itsol_rci_input(h, m, b)
    rci = ast.itsol_rci_solve(h)
    job, u = rci.step()
    bounces = 0
    while job != RciJob.stop and bounces < 10000:
        bounces += 1
        if job == RciJob.mv:
            job, u = rci.step(ast.mv(1.0, A, GEN, Operation.none, u, 0.0))
        elif job == RciJob.precond:
            job, u = rci.step(np.asarray(u) / d)  # Jacobi as user precond
        else:
            job, u = rci.step()
    np.testing.assert_allclose(np.asarray(rci.x), np.linalg.solve(dense, b), atol=1e-6)
    assert h.rinfo[RINFO_RES_NORM] <= 1e-10 * np.linalg.norm(b) * 1.01 or rci.rnorm2 < 1e-8


def test_rci_interrupt(rng):
    m = 20
    A, dense = _spd_csr(rng, m)
    h = ast.itsol_init(np.float64)
    ast.itsol_rci_input(h, m, np.ones(m))
    rci = ast.itsol_rci_solve(h)
    job, u = rci.step()
    # a user may simply stop driving the loop — state stays consistent
    assert job == RciJob.mv and rci.task == "init_res"


def test_options_validation():
    h = ast.itsol_init(np.float64)
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_option_set(h, "no such option", 1)
    assert e.value.status == Status.invalid_value
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_option_set(h, "cg iteration limit", 0)
    assert e.value.status == Status.invalid_value
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_option_set(h, "iterative method", "banana")
    assert e.value.status == Status.invalid_value
    # case/space-insensitive names like the reference registry
    ast.itsol_option_set(h, "CG Iteration Limit", 7)
    assert h.options.get("cg iteration limit") == 7
    out = h.options.print_options()
    assert "iterative method" in out


def test_monitoring_user_stop(rng):
    m = 25
    A, dense = _spd_csr(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    calls = []

    def monitor(r, rinfo):
        calls.append(rinfo[RINFO_ITER])
        return 1 if len(calls) >= 3 else 0

    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b, monitoring=monitor)
    assert status == Status.user_stop
    assert len(calls) == 3


def test_gmres_complex(rng):
    m = 20
    dense = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.2] = 0
    np.fill_diagonal(dense, m)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    b = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex128)
    h = ast.itsol_init(np.complex128)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-12)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-7)


def test_cg_complex_symmetric(rng):
    # complex-symmetric positive-definite-ish system (unconjugated dots, like
    # the reference's c/z CG loops)
    m = 16
    B = rng.standard_normal((m, m))
    dense = (B @ B.T + m * np.eye(m)).astype(np.complex128)
    dense += 1j * 0.01 * (np.ones((m, m)) + np.eye(m))
    dense = (dense + dense.T) / 2  # complex symmetric
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    b = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex128)
    h = ast.itsol_init(np.complex128)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-6)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_cg_dtypes(rng, dtype):
    m = 15
    A64, dense = _spd_csr(rng, m)
    m_, n_, nnz, ptr, ind, val = ast.export_csr(A64)
    A = ast.create_csr(m, m, ptr, ind, np.asarray(val).astype(dtype))
    b = rng.standard_normal(m).astype(dtype)
    h = ast.itsol_init(dtype)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    atol = 1e-3 if dtype == np.float32 else 1e-6
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=atol)
