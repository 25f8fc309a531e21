"""Creation, conversion, export (sample code for create_?csr/?csc/?coo/?bsr,
convert_csr, export_?csr, order_mat, set_value/update_values): round-trip a
matrix through the format zoo, use the two-phase query+convert API, and
refresh values in place."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import FormatType, IndexBase

m, n = 4, 5
dense = np.array([
    [1.0, 0, 2, 0, 0],
    [0, 3.0, 0, 0, 4],
    [5.0, 0, 6, 7, 0],
    [0, 0, 0, 8.0, 9],
])
mask = dense != 0
ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
ind = np.nonzero(mask)[1]
val = dense[mask]

# one-based create like the Fortran-style reference samples
A1 = asp.create_csr(m, n, ptr + 1, ind + 1, val, base=IndexBase.one)
_, _, _, p0, i0, v0 = asp.export_csr(A1)  # exports zero-based by default
check("one-based create -> export", np.asarray(v0), val)

# COO + CSC creation agree with CSR
rows = np.repeat(np.arange(m), mask.sum(1))
Ac = asp.create_coo(m, n, rows, ind, val)
x = np.arange(1.0, n + 1)
gen = MatrixDescriptor()
check("coo mv", asp.mv(1.0, Ac, gen, Operation.none, x, 0.0), dense @ x)

cmask = mask.T
cptr = np.concatenate([[0], np.cumsum(cmask.sum(1))])
Acsc = asp.create_csc(m, n, cptr, np.nonzero(cmask)[1], dense.T[cmask])
check("csc mv", asp.mv(1.0, Acsc, gen, Operation.none, x, 0.0), dense @ x)

# handle-level conversion (aoclsparse_convert_csr with transpose)
At = asp.convert_csr(Ac, Operation.transpose)
_, _, _, pt, it_, vt = asp.export_csr(At)
Td = np.zeros((n, m))
Td[np.repeat(np.arange(n), np.diff(np.asarray(pt))), np.asarray(it_)] = np.asarray(vt)
check("convert_csr transpose", Td, dense.T)

# two-phase ELL conversion via the sizing query
w = asp.csr2ell_width(m, len(val), ptr)
print("csr2ell_width ->", w)
from aoclsparse_tpu.convert.conversions import csr_to_ell
from aoclsparse_tpu.core.formats import CSR

E = csr_to_ell(CSR(ptr, ind, val, shape=(m, n)), width=w)
check("ellmv after query", asp.ellmv(Operation.none, 1.0, m, n, len(val),
                                     np.asarray(E.val), np.asarray(E.ind), w, gen, x, 0.0), dense @ x)

# set_value / update_values refresh every cached execution form
A2 = asp.create_csr(m, n, ptr, ind, val)
asp.set_mv_hint(A2, Operation.none, gen, nop=100)
asp.optimize(A2)
_ = asp.mv(1.0, A2, gen, Operation.none, x, 0.0)  # builds + caches the plan
asp.set_value(A2, 2, 3, 70.0)  # dense[2,3] = 7 -> 70
dense2 = dense.copy()
dense2[2, 3] = 70.0
check("set_value refresh", asp.mv(1.0, A2, gen, Operation.none, x, 0.0), dense2 @ x)
asp.update_values(A2, val * 3)
check("update_values refresh", asp.mv(1.0, A2, gen, Operation.none, x, 0.0), 3 * dense @ x)
