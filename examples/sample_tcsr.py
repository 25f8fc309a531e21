"""TCSR ingestion (sample_tcsr_dspmv.cpp, sample_tcsr_dtrsv.cpp,
sample_tcsr_ztrsv.cpp): create a matrix from its two stored triangles, run
SpMV on the merged operator and TRSV on one triangle."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation

n = 5
# full matrix with unit-free diagonal; triangles stored separately with the
# diagonal duplicated in each (TCSR contract, auxiliary.h:516-598)
rng = np.random.default_rng(2)
full = np.tril(rng.standard_normal((n, n)), -1) * 0.5 + np.triu(rng.standard_normal((n, n)), 1) * 0.5 + np.diag(3.0 + rng.random(n))

Lpart = np.tril(full)  # strictly-lower + diag
Upart = np.triu(full)  # diag + strictly-upper
mL, mU = Lpart != 0, Upart != 0
ptr_L = np.concatenate([[0], np.cumsum(mL.sum(1))])
ptr_U = np.concatenate([[0], np.cumsum(mU.sum(1))])
nnz = int((full != 0).sum())

A = asp.create_tcsr(
    n, n, nnz,
    ptr_L, ptr_U,
    np.nonzero(mL)[1], np.nonzero(mU)[1],
    Lpart[mL], Upart[mU],
)

gen = MatrixDescriptor()
x = np.arange(1.0, n + 1)
check("tcsr mv (merged)", asp.mv(1.0, A, gen, Operation.none, x, 0.0), full @ x)

low = MatrixDescriptor().with_(type=3)  # triangular, lower
check("tcsr trsv L", asp.trsv(1.0, A, low, Operation.none, x),
      np.linalg.solve(np.tril(full), x))
up = MatrixDescriptor().with_(type=3, fill_mode=1)
check("tcsr trsv U", asp.trsv(1.0, A, up, Operation.none, x),
      np.linalg.solve(np.triu(full), x))
