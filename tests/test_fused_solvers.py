"""Fused single-dispatch preconditioned solvers (solvers/fused.py) vs the
host RCI path: solution parity and iteration-count agreement (the reference
forward interface drives the same task machines, itsol_functions.hpp:1352,
1493 — iteration counts must match the RCI stepper on the same problem)."""

import jax.numpy as jnp
import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation, Status
from aoclsparse_tpu.solvers import RINFO_ITER

GEN = MatrixDescriptor()


def _spd(rng, m, density=0.25):
    B = rng.standard_normal((m, m))
    B[np.abs(B) < 1.1] = 0
    dense = B @ B.T + m * np.eye(m)
    dense[np.abs(dense) < 1e-12] = 0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


def _general(rng, m):
    dense = rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.0] = 0
    np.fill_diagonal(dense, m / 2.0)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


def _rci_iters(A, b, method, precond_name, restart=20):
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", method)
    if method == "CG":
        ast.itsol_option_set(h, "cg preconditioner", precond_name)
    else:
        ast.itsol_option_set(h, "gmres preconditioner", precond_name)
        ast.itsol_option_set(h, "gmres restart iterations", restart)
    x, rinfo, st = ast.itsol_solve(h, A.shape[0], A, GEN, b)
    assert st == Status.success
    return np.asarray(x), int(rinfo[RINFO_ITER])


@pytest.mark.parametrize("precond", [None, "sgs", "ilu0"])
def test_pcg_matches_rci(rng, precond):
    m = 48
    A, dense = _spd(rng, m)
    b = rng.standard_normal(m)
    x, it, rnorm = ast.pcg_solve(A, b, rtol=1e-8, maxit=200, precond=precond)
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-5)
    rci_name = {None: "None", "sgs": "SGS", "ilu0": "ILU0"}[precond]
    if precond in (None, "sgs"):  # RCI CG supports None/User/SGS
        _, it_rci = _rci_iters(A, b, "CG", rci_name)
        assert abs(it - it_rci) <= 1
    assert rnorm <= 1e-8 * np.linalg.norm(b) + 1e-12


def test_pcg_ilu0_reduces_iterations(rng):
    m = 64
    A, dense = _spd(rng, m)
    b = rng.standard_normal(m)
    _, it_plain, _ = ast.pcg_solve(A, b, rtol=1e-8, maxit=300, precond=None)
    _, it_ilu, _ = ast.pcg_solve(A, b, rtol=1e-8, maxit=300, precond="ilu0")
    assert it_ilu <= it_plain


@pytest.mark.parametrize("precond", [None, "ilu0"])
def test_pgmres_matches_rci(rng, precond):
    m = 40
    A, dense = _general(rng, m)
    b = rng.standard_normal(m)
    x, it, rnorm = ast.pgmres_solve(A, b, rtol=1e-8, maxit=200, restart=12, precond=precond)
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-5)
    rci_name = {None: "None", "ilu0": "ILU0"}[precond]
    _, it_rci = _rci_iters(A, b, "GMRES", rci_name, restart=12)
    # same engine, restart-cycle granularity may differ by one cycle
    assert abs(it - it_rci) <= 12


def test_pgmres_zero_rhs(rng):
    m = 16
    A, _ = _general(rng, m)
    x, it, rnorm = ast.pgmres_solve(A, np.zeros(m), rtol=1e-8, maxit=50)
    assert it == 0
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_pcg_exact_initial_guess(rng):
    m = 24
    A, dense = _spd(rng, m)
    xstar = rng.standard_normal(m)
    b = dense @ xstar
    x, it, rnorm = ast.pcg_solve(A, b, x0=xstar.copy(), rtol=1e-10, maxit=50)
    assert it == 0
    np.testing.assert_allclose(np.asarray(x), xstar)


def test_pcg_complex_symmetric_matches_rci(rng):
    # complex-symmetric system: fused PCG uses the reference's UNCONJUGATED
    # dots; iteration count must match the host RCI stepper at matched
    # tolerances
    m = 40
    B = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    dense = (B @ B.T + m * np.eye(m)).astype(np.complex128)
    dense[np.abs(dense) < 1e-12] = 0
    dense = (dense + dense.T) / 2
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    x, it, rn = ast.pcg_solve(A, b, rtol=1e-6, maxit=300)
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-4)
    h = ast.itsol_init(np.complex128)
    ast.itsol_option_set(h, "iterative method", "CG")
    ast.itsol_option_set(h, "cg rel tolerance", 1e-6)
    x2, ri, st = ast.itsol_solve(h, m, A, ast.MatrixDescriptor(), b)
    assert st == Status.success
    assert abs(it - int(ri[RINFO_ITER])) <= 1


def test_fused_cache_invalidated_by_update_values(rng):
    # regression: the jitted solver closure bakes the exec-form arrays as
    # constants; update_values must drop the fused cache or the solve runs
    # on stale values
    m = 64
    dense = np.zeros((m, m))
    for i in range(m):
        js = np.clip(i + rng.integers(-3, 4, 3), 0, m - 1)
        dense[i, js] = rng.standard_normal(js.size)
    dense = dense @ dense.T + m * np.eye(m)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])
    b = rng.standard_normal(m)
    x1, _, _ = ast.pcg_solve(A, b, rtol=1e-10)
    np.testing.assert_allclose(dense @ np.asarray(x1), b, atol=1e-7)
    ast.update_values(A, 2.0 * np.asarray(A.data.val))
    x2, _, _ = ast.pcg_solve(A, b, rtol=1e-10)
    np.testing.assert_allclose(2.0 * dense @ np.asarray(x2), b, atol=1e-7)


def test_pgmres_complex_solves(rng):
    # complex Givens (real c, complex s, conjugated CGS dots): the fused
    # solve must reach the same tolerance as the host RCI engine
    m = 40
    dense = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.4] = 0
    np.fill_diagonal(dense, m / 2.0 + 1j)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])
    b = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex128)
    x, it, rnorm = ast.pgmres_solve(A, b, rtol=1e-8, maxit=200, restart=12)
    np.testing.assert_allclose(dense @ np.asarray(x), b, atol=1e-5)
    assert rnorm <= 1e-8 * np.linalg.norm(b) + 1e-12
    h = ast.itsol_init(np.complex128)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 12)
    x2, ri, st = ast.itsol_solve(h, m, A, GEN, b)
    assert st == Status.success
    # same engine, restart-cycle granularity may differ by one cycle
    assert abs(it - int(ri[RINFO_ITER])) <= 12


def test_pgmres_complex_ilu0(rng):
    m = 48
    dense = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    dense[np.abs(dense) < 1.5] = 0
    np.fill_diagonal(dense, m + 0.5j)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])
    b = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex128)
    x_p, it_p, _ = ast.pgmres_solve(A, b, rtol=1e-8, maxit=200, restart=15, precond="ilu0")
    x_n, it_n, _ = ast.pgmres_solve(A, b, rtol=1e-8, maxit=200, restart=15)
    np.testing.assert_allclose(dense @ np.asarray(x_p), b, atol=1e-5)
    assert it_p <= it_n


# ---------------------------------------------------------------------------
# matrix-free operator solvers (SURVEY.md §7 functional RCI protocol)
# ---------------------------------------------------------------------------


def test_cg_operator_matches_pcg(rng):
    from aoclsparse_tpu.solvers import make_cg_operator, pcg_solve

    m = 48
    A, dense = _spd(rng, m)
    b = rng.standard_normal(m)
    dj = jnp.asarray(dense)
    solve = make_cg_operator(lambda v: dj @ v, maxit=300)
    x, it, rn = solve(b, rtol=1e-10)
    xr, itr, rnr = pcg_solve(A, b, rtol=1e-10, maxit=300)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xr), atol=1e-8)
    assert it == itr  # identical iteration path on the same operator


def test_cg_operator_jacobi_precond(rng):
    from aoclsparse_tpu.solvers import make_cg_operator

    m = 48
    A, dense = _spd(rng, m)
    b = rng.standard_normal(m)
    dj = jnp.asarray(dense)
    dinv = jnp.asarray(1.0 / np.diag(dense))
    plain = make_cg_operator(lambda v: dj @ v, maxit=500)
    pre = make_cg_operator(lambda v: dj @ v, precond=lambda r: dinv * r, maxit=500)
    x0_, i0, _ = plain(b, rtol=1e-10)
    x1, i1, _ = pre(b, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x1), np.linalg.solve(dense, b), atol=1e-7)
    assert i1 <= i0  # Jacobi can't be worse on this SPD class


def test_gmres_operator_matches_pgmres(rng):
    from aoclsparse_tpu.solvers import make_gmres_operator, pgmres_solve

    m = 40
    A, dense = _general(rng, m)
    b = rng.standard_normal(m)
    dj = jnp.asarray(dense)
    solve = make_gmres_operator(lambda v: dj @ v, maxit=300, restart=15)
    x, it, rn = solve(b, rtol=1e-10)
    xr, itr, _ = pgmres_solve(A, b, rtol=1e-10, maxit=300, restart=15)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xr), atol=1e-8)
    assert it == itr


def test_gmres_operator_reusable_across_rhs(rng):
    from aoclsparse_tpu.solvers import make_gmres_operator

    m = 32
    A, dense = _general(rng, m)
    dj = jnp.asarray(dense)
    solve = make_gmres_operator(lambda v: dj @ v, maxit=200, restart=10)
    for _ in range(3):
        b = rng.standard_normal(m)
        x, it, rn = solve(b, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-6)


def test_itsol_solve_operator_matches_matrix_path(rng):
    m = 40
    A, dense = _spd(rng, m)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "CG")
    x_mat, rinfo_mat, st_mat = ast.itsol_solve(h, m, A, GEN, b)
    it_mat = int(rinfo_mat[RINFO_ITER])

    h2 = ast.itsol_init(np.float64)
    ast.itsol_option_set(h2, "iterative method", "CG")
    dj = jnp.asarray(dense)
    x_op, rinfo_op, st_op = ast.itsol_solve_operator(h2, m, lambda v: dj @ v, b)
    assert st_mat == st_op == Status.success
    assert int(rinfo_op[RINFO_ITER]) == it_mat
    np.testing.assert_allclose(np.asarray(x_op), np.asarray(x_mat), atol=1e-9)


def test_itsol_solve_operator_user_precond_and_errors(rng):
    m = 32
    A, dense = _spd(rng, m)
    b = rng.standard_normal(m)
    dj = jnp.asarray(dense)
    dinv = jnp.asarray(1.0 / np.diag(dense))

    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "CG")
    ast.itsol_option_set(h, "cg preconditioner", "User")
    x, rinfo, st = ast.itsol_solve_operator(
        h, m, lambda v: dj @ v, b, precond=lambda r: dinv * r
    )
    assert st == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-7)

    # User option without a callable -> invalid_value
    h2 = ast.itsol_init(np.float64)
    ast.itsol_option_set(h2, "iterative method", "CG")
    ast.itsol_option_set(h2, "cg preconditioner", "User")
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.itsol_solve_operator(h2, m, lambda v: dj @ v, b)
    assert ei.value.status == Status.invalid_value

    # matrix-needing preconditioner -> invalid_value in matrix-free mode
    h3 = ast.itsol_init(np.float64)
    ast.itsol_option_set(h3, "iterative method", "CG")
    ast.itsol_option_set(h3, "cg preconditioner", "SGS")
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.itsol_solve_operator(h3, m, lambda v: dj @ v, b)
    assert ei.value.status == Status.invalid_value

    # null matvec -> invalid_pointer
    h4 = ast.itsol_init(np.float64)
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.itsol_solve_operator(h4, m, None, b)
    assert ei.value.status == Status.invalid_pointer
