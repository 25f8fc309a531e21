"""CG through both interfaces (sample_itsol_d_cg.cpp,
sample_itsol_d_cg_rci.cpp): the forward solve with a monitoring callback,
then the reverse-communication loop where the caller owns every SpMV."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation, RciJob

n = 8
ptr = np.array([0, 1, 2, 5, 6, 8, 11, 15, 18])
ind = np.array([0, 1, 0, 1, 2, 3, 1, 4, 0, 4, 5, 0, 3, 4, 6, 2, 5, 7])
val = np.array([19.0, 10, 1, 8, 11, 13, 2, 11, 2, 1, 9, 7, 9, 5, 12, 5, 5, 9])
A = asp.create_csr(n, n, ptr, ind, val)
sym = MatrixDescriptor().with_(type=1)  # symmetric, lower stored

L = np.zeros((n, n))
L[np.repeat(np.arange(n), np.diff(ptr)), ind] = val
S = np.tril(L) + np.tril(L, -1).T
expected = np.array([1.0, 0, 1, 0, 1, 0, 1, 0])
b = S @ expected

# ---- forward interface with monitoring (prints like the sample's printer) ----
h = asp.itsol_init(np.float64)
asp.itsol_option_set(h, "iterative method", "cg")
asp.itsol_option_set(h, "cg rel tolerance", 1e-10)
asp.itsol_handle_prn_options(h)


def monitor(xk, rinfo):
    print(f"  iter {int(rinfo[30]):3d}  residual {rinfo[0]:.3e}")
    return 0


x, rinfo, status = asp.itsol_solve(h, n, A, sym, b, monitoring=monitor)
check("cg forward solve", x, expected, tol=1e-6)

# ---- reverse-communication: the caller performs each requested SpMV ----
h2 = asp.itsol_init(np.float64)
asp.itsol_option_set(h2, "iterative method", "cg")
asp.itsol_rci_input(h2, n, b)
rci = asp.itsol_rci_solve(h2)
job, u = rci.step()
while job != RciJob.stop:
    if job == RciJob.mv:
        job, u = rci.step(asp.mv(1.0, A, sym, Operation.none, u, 0.0))
    elif job == RciJob.precond:
        job, u = rci.step(u)  # identity preconditioner
    else:
        job, u = rci.step()
check("cg rci solve", rci.x, expected, tol=1e-6)
print("rinfo: iters =", int(h2.rinfo[30]), " final residual =", h2.rinfo[0])
