"""SpMV through the optimized handle path (sample_mv_cpp.cpp,
sample_spmv_c.c): create CSR -> hint -> optimize -> mv, on the reference
samples' 8x8 symmetric matrix stored lower-triangular."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation

n = 8
ptr = np.array([0, 1, 2, 5, 6, 8, 11, 15, 18])
ind = np.array([0, 1, 0, 1, 2, 3, 1, 4, 0, 4, 5, 0, 3, 4, 6, 2, 5, 7])
val = np.array([19.0, 10, 1, 8, 11, 13, 2, 11, 2, 1, 9, 7, 9, 5, 12, 5, 5, 9])

A = asp.create_csr(n, n, ptr, ind, val)
descr = MatrixDescriptor().with_(type=1)  # symmetric, lower fill
asp.set_mv_hint(A, Operation.none, descr, nop=1000)
asp.optimize(A)

L = np.zeros((n, n))
L[np.repeat(np.arange(n), np.diff(ptr)), ind] = val
S = np.tril(L) + np.tril(L, -1).T

x = np.arange(1.0, n + 1)
y0 = np.ones(n)
check("mv  y = 1.5*S@x + 0.5*y", asp.mv(1.5, A, descr, Operation.none, x, 0.5, y0),
      1.5 * S @ x + 0.5 * y0)

# general descriptor uses the stored (lower-triangular) pattern as-is
gen = MatrixDescriptor()
check("mv  general", asp.mv(1.0, A, gen, Operation.none, x, 0.0), L @ x)
check("mv  transpose", asp.mv(1.0, A, gen, Operation.transpose, x, 0.0), L.T @ x)

# fused mv + dot (sample_dotmv.cpp)
y, d = asp.dotmv(1.0, A, gen, Operation.none, x, 0.0)
check("dotmv y", y, L @ x)
check("dotmv d = <x, y>", d, float(np.dot(x, L @ x)))
