"""RCI-GMRES monitoring and interrupt cases (VERDICT r1 #8; reference:
gmres_tests.cpp RCI-driven monitoring, aoclsparse_solvers.h job protocol):
residual history through stopping_criterion bounces, early interrupt with
a usable partial iterate, rinfo bookkeeping, restart-cycle monitoring."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation, Status
from aoclsparse_tpu.solvers import (
    RINFO_ITER,
    RINFO_RES_NORM,
    RINFO_RHS_NORM,
    RciJob,
)

GEN = MatrixDescriptor()


def _sys(rng, m):
    dense = rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.0] = 0
    np.fill_diagonal(dense, m / 2.0)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


def _drive(rci, matvec, precond=None, monitor=None, max_bounces=100000):
    job, u = rci.step()
    bounces = 0
    while job != RciJob.stop and bounces < max_bounces:
        bounces += 1
        if job == RciJob.mv:
            job, u = rci.step(matvec(u))
        elif job == RciJob.precond:
            job, u = rci.step(precond(u) if precond else u)
        else:  # stopping_criterion
            if monitor is not None and monitor(u):
                return "interrupted"
            job, u = rci.step()
    return "done"


def test_gmres_rci_monitoring_residual_history(rng):
    m = 40
    A, dense = _sys(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 8)
    ast.itsol_rci_input(h, m, b)
    rci = ast.itsol_rci_solve(h)
    history = []

    def monitor(u):
        # stopping_criterion bounce: rinfo[0] is the current residual norm
        history.append(float(h.rinfo[RINFO_RES_NORM]))
        return False

    _drive(rci, lambda u: dense @ np.asarray(u), monitor=monitor)
    assert len(history) >= 1
    # the cycle-end residuals must be non-increasing to convergence
    assert history[-1] <= history[0] + 1e-12
    assert h.rinfo[RINFO_RHS_NORM] == pytest.approx(np.linalg.norm(b))
    np.testing.assert_allclose(dense @ np.asarray(rci.x), b, atol=1e-6)


def test_gmres_rci_interrupt_partial_iterate(rng):
    # interrupt after the first monitoring bounce: the stepper's current x
    # must be a usable (better-than-zero) iterate, like the reference's
    # rci_interrupt semantics (aoclsparse_solvers.h:117)
    m = 60
    A, dense = _sys(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 4)
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-14)
    ast.itsol_rci_input(h, m, b)
    rci = ast.itsol_rci_solve(h)
    count = {"n": 0}

    def monitor(u):
        count["n"] += 1
        return count["n"] >= 2  # interrupt at the second bounce

    out = _drive(rci, lambda u: dense @ np.asarray(u), monitor=monitor)
    assert out == "interrupted"
    x_partial = np.asarray(rci.x)
    r_partial = np.linalg.norm(dense @ x_partial - b)
    assert r_partial < np.linalg.norm(b)  # progress was made


def test_cg_rci_monitoring_bounce_every_iteration(rng):
    m = 30
    B = rng.standard_normal((m, m))
    dense = B @ B.T + m * np.eye(m)
    dense[np.abs(dense) < 1e-12] = 0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "CG")
    ast.itsol_rci_input(h, m, b)
    rci = ast.itsol_rci_solve(h)
    bounces = []

    def monitor(u):
        bounces.append(int(h.rinfo[RINFO_ITER]))
        return False

    _drive(rci, lambda u: dense @ np.asarray(u), monitor=monitor)
    # CG bounces stopping_criterion once per check_conv (incl. iteration 0)
    assert bounces == sorted(bounces)
    assert len(bounces) >= 2
    np.testing.assert_allclose(dense @ np.asarray(rci.x), b, atol=1e-6)


def test_gmres_rci_restart_cycle_iteration_accounting(rng):
    # with restart r and maxit forcing multiple cycles, rinfo[30] counts
    # INNER iterations cumulatively (itsol_functions.hpp RINFO_ITER)
    m = 50
    A, dense = _sys(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 5)
    ast.itsol_option_set(h, "gmres rel tolerance", 1e-12)
    x, rinfo, st = ast.itsol_solve(h, m, A, GEN, b)
    assert st == Status.success
    iters = int(rinfo[RINFO_ITER])
    assert iters >= 5  # needed more than one cycle at this tolerance
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-8)


def test_gmres_rci_reuses_handle_after_interrupt(rng):
    # after an interrupt, a fresh rci_input + solve must work on the handle
    m = 24
    A, dense = _sys(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_rci_input(h, m, b)
    rci = ast.itsol_rci_solve(h)
    job, u = rci.step()
    job, u = rci.step(dense @ np.asarray(u))  # one bounce then abandon
    h.rci = None  # release (the forward driver does this in finally)
    x, rinfo, st = ast.itsol_solve(h, m, A, GEN, b)
    assert st == Status.success
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-6)


def test_rci_option_lock_during_solve(rng):
    m = 16
    A, dense = _sys(rng, m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_rci_input(h, m, np.ones(m))
    rci = ast.itsol_rci_solve(h)
    job, u = rci.step()
    with pytest.raises(ast.AoclSparseError) as e:
        ast.itsol_option_set(h, "gmres restart iterations", 3)
    assert e.value.status == Status.invalid_operation
