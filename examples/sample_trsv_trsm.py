"""Triangular solves (sample_dtrsv.cpp, sample_trsv_cpp.cpp,
sample_dtrsm.cpp, sample_ztrsm.cpp): alpha*b = op(L) x with single and
multiple right-hand sides, real and complex."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation

n = 6
rng = np.random.default_rng(0)
dense = np.tril(rng.standard_normal((n, n))) + 4.0 * np.eye(n)
mask = dense != 0
ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
ind = np.nonzero(mask)[1]
val = dense[mask]

A = asp.create_csr(n, n, ptr, ind, val)
low = MatrixDescriptor().with_(type=3)  # triangular, lower fill
asp.set_sv_hint(A, Operation.none, low, nop=100)
asp.optimize(A)

b = rng.standard_normal(n)
check("trsv  L x = 2b", asp.trsv(2.0, A, low, Operation.none, b),
      np.linalg.solve(dense, 2.0 * b))
check("trsv  L^T x = b", asp.trsv(1.0, A, low, Operation.transpose, b),
      np.linalg.solve(dense.T, b))

# strided variant (aoclsparse_?trsv_strided)
bs = np.zeros(3 * n)
bs[::3] = b
xs = asp.trsv_strided(1.0, A, low, Operation.none, bs, incb=3, incx=3)
check("trsv_strided", np.asarray(xs)[::3], np.linalg.solve(dense, b))

# multi-RHS (trsm)
B = rng.standard_normal((n, 4))
check("trsm  L X = B", asp.trsm(1.0, A, low, Operation.none, B),
      np.linalg.solve(dense, B))

# complex
zc = dense.astype(np.complex128) + 1j * np.tril(rng.standard_normal((n, n)))
zval = zc[mask]
Az = asp.create_csr(n, n, ptr, ind, zval)
bz = b + 1j * rng.standard_normal(n)
check("trsv  complex L^H x = b",
      asp.trsv(1.0, Az, low, Operation.conjugate_transpose, bz),
      np.linalg.solve(np.tril(zc).conj().T, bz), tol=1e-8)
