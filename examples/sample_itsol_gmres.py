"""GMRES, real and complex (sample_itsol_d_gmres.cpp,
sample_itsol_d_gmres_rci.cpp, sample_itsol_z_gmres.cpp): forward solve with
ILU0 preconditioning, the RCI loop, and a complex system."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation, RciJob

rng = np.random.default_rng(7)
n = 12
D = np.diag(6.0 + rng.random(n)) + 0.5 * rng.standard_normal((n, n))
mask = (np.abs(D) > 0.4) | np.eye(n, dtype=bool)
Dm = np.where(mask, D, 0.0)
ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
A = asp.create_csr(n, n, ptr, np.nonzero(mask)[1], Dm[mask])
gen = MatrixDescriptor()

expected = rng.standard_normal(n)
b = Dm @ expected

h = asp.itsol_init(np.float64)
asp.itsol_option_set(h, "iterative method", "gmres")
asp.itsol_option_set(h, "gmres preconditioner", "ilu0")
asp.itsol_option_set(h, "gmres rel tolerance", 1e-12)
x, rinfo, status = asp.itsol_solve(h, n, A, gen, b)
check("gmres+ilu0 forward", x, expected, tol=1e-6)

# RCI with a user (Jacobi) preconditioner
h2 = asp.itsol_init(np.float64)
asp.itsol_option_set(h2, "iterative method", "gmres")
asp.itsol_option_set(h2, "gmres preconditioner", "user")
asp.itsol_rci_input(h2, n, b)
rci = asp.itsol_rci_solve(h2)
job, u = rci.step()
diag = np.diag(Dm)
while job != RciJob.stop:
    if job == RciJob.mv:
        job, u = rci.step(asp.mv(1.0, A, gen, Operation.none, u, 0.0))
    elif job == RciJob.precond:
        job, u = rci.step(np.asarray(u) / diag)
    else:
        job, u = rci.step()
check("gmres rci (jacobi)", rci.x, expected, tol=1e-6)

# complex system (sample_itsol_z_gmres.cpp)
Z = Dm.astype(np.complex128) + 1j * np.where(mask, 0.3 * rng.standard_normal((n, n)), 0.0)
Az = asp.create_csr(n, n, ptr, np.nonzero(mask)[1], Z[mask])
xz_ref = rng.standard_normal(n) + 1j * rng.standard_normal(n)
bz = Z @ xz_ref
hz = asp.itsol_init(np.complex128)
asp.itsol_option_set(hz, "iterative method", "gmres")
asp.itsol_option_set(hz, "gmres rel tolerance", 1e-12)
asp.itsol_option_set(hz, "gmres iteration limit", 200)
xz, rinfo_z, status_z = asp.itsol_solve(hz, n, Az, gen, bz)
check("gmres complex", xz, xz_ref, tol=1e-5)
