"""Matrix-free (operator) solves — the functional analog of the reference's
RCI protocol (SURVEY.md §7; the reference reaches matrix-free use only by
hand-driving aoclsparse_itsol_?_rci_solve, sample_itsol_d_cg_rci.cpp).

Three interfaces over one operator — a 1-D shifted-Laplacian stencil that is
never materialized as a matrix:

  1. make_cg_operator    — whole fused CG solve = ONE compiled dispatch
  2. make_gmres_operator — same for restarted GMRES
  3. itsol_solve_operator — host-RCI forward twin (reference semantics,
     rinfo statistics, option registry)
"""

from _common import check, np

import jax.numpy as jnp

import aoclsparse_tpu as asp

n = 128


def op(v):
    """v -> A v for the shifted 1-D Laplacian (tridiagonal [-1, 2.5, -1])."""
    return 2.5 * v - jnp.pad(v[1:], (0, 1)) - jnp.pad(v[:-1], (1, 0))


xstar = np.sin(np.linspace(0, np.pi, n))
b = np.asarray(op(jnp.asarray(xstar)))

# 1) fused single-dispatch CG over the operator
solve_cg = asp.solvers.make_cg_operator(op, maxit=500)
x, iters, rnorm = solve_cg(b, rtol=1e-12)
check("matrix-free fused CG", x, xstar, tol=1e-6)
print(f"  CG iterations: {iters}, ||r|| = {rnorm:.3e}")

# ... with a user preconditioner (Jacobi: the stencil diagonal is 2.5)
solve_pcg = asp.solvers.make_cg_operator(op, precond=lambda r: r / 2.5, maxit=500)
xp, itp, _ = solve_pcg(b, rtol=1e-12)
check("matrix-free fused PCG", xp, xstar, tol=1e-6)

# 2) fused restarted GMRES over the same operator
solve_gm = asp.solvers.make_gmres_operator(op, maxit=500, restart=30)
xg, itg, _ = solve_gm(b, rtol=1e-12)
check("matrix-free fused GMRES", xg, xstar, tol=1e-5)

# 3) the host-RCI forward interface: reference option registry + rinfo
h = asp.itsol_init(np.float64)
asp.itsol_option_set(h, "iterative method", "CG")
xo, rinfo, st = asp.itsol_solve_operator(h, n, op, b)
assert st == asp.Status.success
check("itsol_solve_operator", xo, xstar, tol=1e-6)
print(f"  rinfo: ||r|| = {rinfo[0]:.3e}, iterations = {int(rinfo[30])}")
