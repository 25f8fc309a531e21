"""SuiteSparse-style workflow: MatrixMarket in -> optimize -> mv / solve.

The reference's bench consumes downloaded .mtx files
(tests/benchmarks/aoclsparse_test.cpp --mtx=...); this sample runs the
same flow end-to-end — write a small FEM-band operand as MatrixMarket,
read it back through the library reader (symmetry expansion and all),
plan it, and drive SpMV + ILU0-preconditioned CG on the handle.
"""

import os
import tempfile

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.io import read_mtx, write_mtx
from aoclsparse_tpu.solvers.fused import pcg_solve

rng = np.random.default_rng(11)
m = 512
half, k = 8, 6
rows = np.repeat(np.arange(m), k)
cols = np.clip(rows + rng.integers(-half, half + 1, rows.size), 0, m - 1)
d = np.arange(m)
rows, cols = np.concatenate([rows, cols, d]), np.concatenate([cols, rows, d])
order = np.lexsort((cols, rows))
rows, cols = rows[order], cols[order]
keep = np.concatenate([[True], (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])])
rows, cols = rows[keep], cols[keep]
lo = np.minimum(rows, cols)
hi = np.maximum(rows, cols)
uq, inv = np.unique(lo * m + hi, return_inverse=True)
val = rng.standard_normal(uq.size)[inv]  # symmetric values (f64 like the samples)
val[rows == cols] = 2.0 * k  # diagonally dominant -> SPD
ptr = np.zeros(m + 1, np.int64)
np.add.at(ptr, rows + 1, 1)
A = asp.create_csr(m, m, np.cumsum(ptr), cols.astype(np.int32), val)

path = os.path.join(tempfile.gettempdir(), "sample_realmat.mtx")
write_mtx(path, A)
B = read_mtx(path, dtype=np.float64)  # the --mtx ingestion path
asp.set_mv_hint(B, Operation.none, MatrixDescriptor(), nop=1000)
asp.optimize(B)

dense = np.zeros((m, m))
dense[rows, cols] = val
x = rng.standard_normal(m)
check("mv on the read-back handle",
      asp.mv(1.0, B, MatrixDescriptor(), Operation.none, x, 0.0), dense @ x)

b = rng.standard_normal(m)
xs, iters, rnorm = pcg_solve(B, b, rtol=1e-6, maxit=200, precond="ilu0")
res = np.linalg.norm(dense @ np.asarray(xs, dtype=np.float64) - b) / np.linalg.norm(b)
print(f"pcg(ilu0): {iters} iterations, true relres {res:.2e}")
assert res < 1e-5
os.remove(path)
print("ok")
