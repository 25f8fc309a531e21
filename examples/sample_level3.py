"""Level-3 products (sample_csrmm.cpp, sample_csr2m.cpp, sample_zsp2m.cpp,
sample_spmmd.cpp, sample_sp2md.cpp, sample_dsyrk.cpp, sample_dsyrkd.cpp,
sample_zsypr.cpp, sample_syprd.cpp): dense and sparse outputs of
sparse x dense and sparse x sparse."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation

rng = np.random.default_rng(1)
m, k, n = 6, 5, 4
Ad = np.where(rng.random((m, k)) < 0.6, rng.standard_normal((m, k)), 0.0)
Bd = np.where(rng.random((k, n)) < 0.6, rng.standard_normal((k, n)), 0.0)


def to_handle(D):
    mask = D != 0
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
    return asp.create_csr(D.shape[0], D.shape[1], ptr, np.nonzero(mask)[1], D[mask])


A, B = to_handle(Ad), to_handle(Bd)
gen = MatrixDescriptor()

# sparse x dense -> dense (csrmm)
X = rng.standard_normal((k, 3))
check("mm  C = 2 A X", asp.mm(2.0, A, gen, Operation.none, X, 0.0), 2.0 * Ad @ X)

# sparse x sparse -> sparse (sp2m, two-stage request protocol)
from aoclsparse_tpu.core.types import Request

C1 = asp.sp2m(Operation.none, gen, A, Operation.none, gen, B, Request.nnz_count)
C1 = asp.sp2m(Operation.none, gen, A, Operation.none, gen, B, Request.finalize, C1)
_, _, _, pc, ic, vc = asp.export_csr(C1)
Cd = np.zeros((m, n))
Cd[np.repeat(np.arange(m), np.diff(np.asarray(pc))), np.asarray(ic)] = np.asarray(vc)
check("sp2m  C = A B", Cd, Ad @ Bd)

# legacy csr2m single shot
C2 = asp.csr2m(Operation.none, gen, A, Operation.none, gen, B)
_, _, _, pc2, ic2, vc2 = asp.export_csr(C2)
C2d = np.zeros((m, n))
C2d[np.repeat(np.arange(m), np.diff(np.asarray(pc2))), np.asarray(ic2)] = np.asarray(vc2)
check("csr2m", C2d, Ad @ Bd)

# sparse x sparse -> dense (spmmd / sp2md)
check("spmmd", asp.spmmd(A, B), Ad @ Bd)
check("sp2md alpha/beta", asp.sp2md(Operation.none, gen, A, Operation.none, gen, B, 2.0, 0.5,
                                    np.ones((m, n))), 2.0 * Ad @ Bd + 0.5)

# syrk / syrkd: A A^T upper triangle
S = asp.syrk(Operation.none, A)
_, _, _, ps, is_, vs = asp.export_csr(S)
Sd = np.zeros((m, m))
Sd[np.repeat(np.arange(m), np.diff(np.asarray(ps))), np.asarray(is_)] = np.asarray(vs)
check("syrk upper(A A^T)", Sd, np.triu(Ad @ Ad.T))
check("syrkd", np.triu(asp.syrkd(Operation.none, A, 1.0)), np.triu(Ad @ Ad.T))

# sypr / syprd: B S B^T with symmetric S
Ssym = np.triu(rng.standard_normal((m, m)))
Sh = to_handle(Ssym)
sym_u = MatrixDescriptor().with_(type=1, fill_mode=1)
full = np.triu(Ssym) + np.triu(Ssym, 1).T
P = asp.sypr(Operation.transpose, A, sym_u, Sh)  # A^T S A (k x k)
_, _, _, pp, ip, vp = asp.export_csr(P)
Pd = np.zeros((k, k))
Pd[np.repeat(np.arange(k), np.diff(np.asarray(pp))), np.asarray(ip)] = np.asarray(vp)
check("sypr upper(A^T S A)", Pd, np.triu(Ad.T @ full @ Ad))

# add
D2 = asp.add(Operation.none, 1.0, A, to_handle(np.where(rng.random((m, k)) < 0.5, 1.0, 0.0)))
_, _, _, pa, ia, va = asp.export_csr(D2)
print("add: C pattern nnz =", len(np.asarray(ia)), "(sum of structures)")
