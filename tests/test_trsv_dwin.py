"""Diagonal-window blocked TRSV ("dwin") — wide-band few-diagonal
triangles (pwtk-class FEM stencils) solved ON DEVICE instead of the
0.09 GF/s host fallback (VERDICT r4 item 3).

The dense (nb, WL) rolling window is refused for half-bandwidths in the
thousands (nblk*nb*WL storage); the dwin form stores the left part as
per-element-diagonal value lanes and reconstructs the left contribution
with static slices of the rolling solved-x window. Reference sequential
kernel being replaced: level2/aoclsparse_trsv_kt.cpp:65.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType
from aoclsparse_tpu.planner.plan import get_plan
from aoclsparse_tpu.planner.triangular import trsv_form_for


def _stencil_triangle(rng, m=20000, offs=(0, 7, 123, 456, 499), dtype=np.float64):
    """Lower triangle carrying few element diagonals at wide offsets —
    use_win refuses (m*WL storage vs 8*nnz) but the diagonal count is
    tiny, exactly the pwtk shape."""
    rows_l, cols_l, vals_l = [], [], []
    for o in offs:
        r = np.arange(o, m)
        rows_l.append(r)
        cols_l.append(r - o)
        v = rng.standard_normal(r.size) * 0.1
        if o == 0:
            v = np.full(r.size, 4.0)
        vals_l.append(v)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l).astype(dtype)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    return np.cumsum(ptr), cols.astype(np.int32), vals, rows, cols


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_dwin_form_selected_and_parity(rng, dtype):
    ptr, ind, val, r, c = _stencil_triangle(rng, dtype=dtype)
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    form = trsv_form_for(get_plan(A), descr, Operation.none)
    assert form.kind == "dwin"
    assert form.dwin_offs is not None and len(form.dwin_offs) <= 8
    b = rng.standard_normal(m).astype(dtype)
    x = np.asarray(ast.trsv(1.0, A, descr, Operation.none, b))
    S = sp.csr_matrix((val.astype(np.float64), (r, c)), shape=(m, m))
    want = spla.spsolve_triangular(S, b.astype(np.float64), lower=True)
    tol = 1e-8 if dtype == np.float64 else 2e-3
    assert np.abs(x - want).max() / max(1.0, np.abs(want).max()) < tol


def test_dwin_trsm_multi_rhs(rng):
    ptr, ind, val, r, c = _stencil_triangle(rng, m=8000, offs=(0, 3, 200, 311))
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    assert trsv_form_for(get_plan(A), descr, Operation.none).kind == "dwin"
    B = rng.standard_normal((m, 5))
    X = np.asarray(ast.trsm(1.0, A, descr, Operation.none, B))
    S = sp.csr_matrix((val, (r, c)), shape=(m, m))
    want = spla.spsolve_triangular(S, B, lower=True)
    assert np.abs(X - want).max() / max(1.0, np.abs(want).max()) < 1e-8


def test_dwin_upper_triangle_reversed(rng):
    # upper solve rides the reversal permutation onto the same dwin scan
    ptr, ind, val, r, c = _stencil_triangle(rng, m=8000, offs=(0, 17, 402))
    m = ptr.size - 1
    # transpose host-side: upper triangle with the same diagonal structure
    S = sp.csr_matrix((val, (r, c)), shape=(m, m)).T.tocsr()
    S.sort_indices()
    A = ast.create_csr(m, m, S.indptr, S.indices, S.data)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.upper)
    form = trsv_form_for(get_plan(A), descr, Operation.none)
    assert form.kind == "dwin" and form.reversed_
    b = rng.standard_normal(m)
    x = np.asarray(ast.trsv(1.0, A, descr, Operation.none, b))
    want = spla.spsolve_triangular(S, b, lower=False)
    assert np.abs(x - want).max() / max(1.0, np.abs(want).max()) < 1e-8


def test_dwin_unit_diag_and_refresh(rng):
    ptr, ind, val, r, c = _stencil_triangle(rng, m=8000, offs=(0, 29, 333))
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.unit
    )
    form = trsv_form_for(get_plan(A), descr, Operation.none)
    assert form.kind == "dwin"
    b = rng.standard_normal(m)
    x = np.asarray(ast.trsv(1.0, A, descr, Operation.none, b))
    Sl = sp.csr_matrix((val, (r, c)), shape=(m, m))
    L1 = sp.tril(Sl, k=-1) + sp.eye(m)
    want = spla.spsolve_triangular(L1.tocsr(), b, lower=True)
    assert np.abs(x - want).max() / max(1.0, np.abs(want).max()) < 1e-8
    # update_values must refresh the dwin lanes through the scatter maps
    val2 = val * 2.0
    ast.update_values(A, val2)
    x2 = np.asarray(ast.trsv(1.0, A, descr, Operation.none, b))
    S2 = sp.csr_matrix((val2, (r, c)), shape=(m, m))
    L2 = sp.tril(S2, k=-1) + sp.eye(m)
    want2 = spla.spsolve_triangular(L2.tocsr(), b, lower=True)
    assert np.abs(x2 - want2).max() / max(1.0, np.abs(want2).max()) < 1e-8


def test_dwin_ilu0_apply_on_device(rng):
    # pwtk-class ILU0: the factor triangles share A's wide-band diagonal
    # structure, so the applies must ride the dwin scan (not the blocked
    # window refusal -> host substitution detour)
    ptr, ind, val, r, c = _stencil_triangle(rng, m=8000, offs=(0, 5, 250, 397))
    m = ptr.size - 1
    # symmetrize pattern so ILU0 sees upper entries too
    S = sp.csr_matrix((val, (r, c)), shape=(m, m))
    Sym = (S + S.T).tocsr()
    Sym.sort_indices()
    A = ast.create_csr(m, m, Sym.indptr, Sym.indices, Sym.data)
    st = ast.ilu0_factorize(A)
    assert st.l_form is not None and st.l_form.kind in ("dwin", "win")
    assert st.u_form is not None and st.u_form.kind in ("dwin", "win")
    assert st.l_form.kind == "dwin" or st.u_form.kind == "dwin"
    b = rng.standard_normal(m)
    z = np.asarray(ast.ilu_smoother(A, b=b))
    # oracle: dense IKJ ILU0 over the same pattern
    lu = np.asarray(st.lu)
    cl = st.lu_clean
    rows_h = np.repeat(np.arange(m), np.diff(np.asarray(cl.ptr)))
    D = np.zeros((m, m))
    D[rows_h, np.asarray(cl.ind)] = lu
    L = np.tril(D, -1) + np.eye(m)
    U = np.triu(D)
    want = np.linalg.solve(U, np.linalg.solve(L, b))
    assert np.abs(z - want).max() / max(1.0, np.abs(want).max()) < 1e-6
