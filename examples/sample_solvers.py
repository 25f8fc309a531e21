"""Preconditioners and smoothers (sample_dsymgs.cpp, sample_dsymgs_mv.cpp,
sample_zsymgs.cpp, sample_dsorv.cpp, plus the ILU0 smoother): one SymGS
sweep, SOR iteration, and the ILU0 apply on the samples' SPD matrix."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import SorType

n = 8
ptr = np.array([0, 1, 2, 5, 6, 8, 11, 15, 18])
ind = np.array([0, 1, 0, 1, 2, 3, 1, 4, 0, 4, 5, 0, 3, 4, 6, 2, 5, 7])
val = np.array([19.0, 10, 1, 8, 11, 13, 2, 11, 2, 1, 9, 7, 9, 5, 12, 5, 5, 9])
L = np.zeros((n, n))
L[np.repeat(np.arange(n), np.diff(ptr)), ind] = val
S = np.tril(L) + np.tril(L, -1).T  # SPD

# store the FULL symmetric matrix for the sweeps
mask = S != 0
fptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
A = asp.create_csr(n, n, fptr, np.nonzero(mask)[1], S[mask])
gen = MatrixDescriptor()
sym = MatrixDescriptor().with_(type=1)

b = np.arange(1.0, n + 1)
x0 = np.zeros(n)

# one symmetric Gauss-Seidel sweep: forward then backward substitution
D, Lo, Up = np.diag(np.diag(S)), np.tril(S, -1), np.triu(S, 1)
x_half = np.linalg.solve(D + Lo, b - Up @ x0)
x_ref = np.linalg.solve(D + Up, b - Lo @ x_half)
check("symgs one sweep", asp.symgs(Operation.none, A, sym, 1.0, b, x0), x_ref)

xg, yg = asp.symgs_mv(Operation.none, A, sym, 1.0, b, x0)
check("symgs_mv x", xg, x_ref)
check("symgs_mv y = A x", yg, S @ x_ref)

# forward SOR iteration: x1 = x0 + omega*(D + omega*L)^-1 (b - A x0)
omega = 1.2
r = b - S @ x0
x_sor = x0 + omega * np.linalg.solve(D + omega * Lo, r)
check("sorv forward", asp.sorv(SorType.forward, gen, A, omega, 1.0, x0, b), x_sor)

# ILU0 smoothing: factor once, apply x = U^-1 L^-1 b
asp.set_lu_smoother_hint(A, Operation.none, gen, nop=10)
asp.optimize(A)
x_ilu = asp.ilu_smoother(A, gen, b)
state = asp.ilu0_factorize(A)  # IluState: combined L\U values + diag pointers
print("ilu factors cached:", np.asarray(state.lu).shape)
print("ilu_smoother residual norm:", float(np.linalg.norm(S @ np.asarray(x_ilu) - b)))
check("ilu solve consistency", S @ np.asarray(x_ilu), b, tol=2.0)  # smoother, not a solve
