"""TCSR ingestion API (aoclsparse_create_?tcsr,
include/aoclsparse_auxiliary.h:516-598): round trips through export/mv/trsv
and the documented status table (invalid_size / invalid_index_value /
invalid_value for diagonal problems / unsorted_input for mis-partitioned
or diagonal-displaced input)."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation, Status
from aoclsparse_tpu.core.types import DiagType, FillMode, IndexBase, MatrixType

GEN = MatrixDescriptor()


def _split_tcsr(dense):
    """Build TCSR arrays from a dense matrix with full diagonal: L part is
    strictly-lower then diag, U part is diag then strictly-upper."""
    m = dense.shape[0]
    pL, iL, vL = [0], [], []
    pU, iU, vU = [0], [], []
    for i in range(m):
        low = [j for j in range(i) if dense[i, j] != 0]
        up = [j for j in range(i + 1, m) if dense[i, j] != 0]
        iL.extend(low + [i])
        vL.extend([dense[i, j] for j in low] + [dense[i, i]])
        pL.append(len(iL))
        iU.extend([i] + up)
        vU.extend([dense[i, i]] + [dense[i, j] for j in up])
        pU.append(len(iU))
    nnz = len(iL) + len(iU) - m
    return (
        nnz,
        np.array(pL, np.int64),
        np.array(pU, np.int64),
        np.array(iL, np.int64),
        np.array(iU, np.int64),
        np.array(vL),
        np.array(vU),
    )


@pytest.fixture
def tri_dense(rng):
    m = 24
    dense = rng.standard_normal((m, m))
    dense[np.abs(dense) < 0.8] = 0
    np.fill_diagonal(dense, 3.0 + rng.random(m))
    return dense


def test_tcsr_create_export_roundtrip(tri_dense):
    m = tri_dense.shape[0]
    nnz, pL, pU, iL, iU, vL, vU = _split_tcsr(tri_dense)
    A = ast.create_tcsr(m, m, nnz, pL, pU, iL, iU, vL, vU)
    assert A.nnz == nnz
    m2, n2, nnz2, ptr, ind, val = ast.export_csr(A)
    d2 = np.zeros((m, m))
    d2[np.repeat(np.arange(m), np.diff(ptr)), ind] = val
    np.testing.assert_allclose(d2, tri_dense)


def test_tcsr_mv_parity(tri_dense, rng):
    m = tri_dense.shape[0]
    nnz, *arrs = _split_tcsr(tri_dense)
    A = ast.create_tcsr(m, m, nnz, *arrs)
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0))
    np.testing.assert_allclose(y, tri_dense @ x, atol=1e-12)
    yt = np.asarray(ast.mv(2.0, A, GEN, Operation.transpose, x, 0.0))
    np.testing.assert_allclose(yt, 2.0 * tri_dense.T @ x, atol=1e-12)


def test_tcsr_trsv_both_triangles(tri_dense, rng):
    m = tri_dense.shape[0]
    nnz, *arrs = _split_tcsr(tri_dense)
    A = ast.create_tcsr(m, m, nnz, *arrs)
    b = rng.standard_normal(m)
    for fm, tri in ((FillMode.lower, np.tril(tri_dense)), (FillMode.upper, np.triu(tri_dense))):
        descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fm)
        x = np.asarray(ast.trsv(1.0, A, descr, Operation.none, b))
        np.testing.assert_allclose(tri @ x, b, atol=1e-10)


def test_tcsr_one_based(tri_dense):
    m = tri_dense.shape[0]
    nnz, pL, pU, iL, iU, vL, vU = _split_tcsr(tri_dense)
    A = ast.create_tcsr(
        m, m, nnz, pL + 1, pU + 1, iL + 1, iU + 1, vL, vU, base=IndexBase.one
    )
    _, _, _, ptr, ind, val = ast.export_csr(A, base=IndexBase.zero)
    d2 = np.zeros((m, m))
    d2[np.repeat(np.arange(m), np.diff(ptr)), ind] = val
    np.testing.assert_allclose(d2, tri_dense)


def test_tcsr_unsorted_within_triangle_ok(rng):
    # reference: "indices within L or U group may not be sorted" — accepted
    m = 4
    dense = np.array(
        [[2.0, 0, 0, 0], [1.0, 3.0, 0, 0], [0.5, 0.25, 4.0, 0], [0, 1.5, 0, 5.0]]
    )
    pL = np.array([0, 1, 3, 6, 8])
    iL = np.array([0, 0, 1, 1, 0, 2, 1, 3])  # row 2 lower entries unsorted (1, 0)
    vL = np.array([2.0, 1.0, 3.0, 0.25, 0.5, 4.0, 1.5, 5.0])
    pU = np.array([0, 1, 2, 3, 4])
    iU = np.array([0, 1, 2, 3])
    vU = np.array([2.0, 3.0, 4.0, 5.0])
    A = ast.create_tcsr(m, m, 8, pL, pU, iL, iU, vL, vU)
    x = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(
        np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0)), dense @ x
    )


def test_tcsr_error_statuses(tri_dense):
    m = tri_dense.shape[0]
    nnz, pL, pU, iL, iU, vL, vU = _split_tcsr(tri_dense)
    # non-square
    with pytest.raises(AoclSparseError) as e:
        ast.create_tcsr(m, m + 1, nnz, pL, pU, iL, iU, vL, vU)
    assert e.value.status == Status.invalid_size
    # wrong nnz
    with pytest.raises(AoclSparseError) as e:
        ast.create_tcsr(m, m, nnz + 1, pL, pU, iL, iU, vL, vU)
    assert e.value.status == Status.invalid_size
    # upper element smuggled into the L part
    iL_bad = iL.copy()
    iL_bad[0] = m - 1  # row 0's first L entry (the diagonal 0) -> upper
    with pytest.raises(AoclSparseError) as e:
        ast.create_tcsr(m, m, nnz, pL, pU, iL_bad, iU, vL, vU)
    assert e.value.status == Status.unsorted_input
    # out-of-range index
    iU_bad = iU.copy()
    iU_bad[-1] = m + 3
    with pytest.raises(AoclSparseError) as e:
        ast.create_tcsr(m, m, nnz, pL, pU, iL, iU_bad, vL, vU)
    assert e.value.status == Status.invalid_index_value
    # diagonal displaced from the last slot of an L row (swap with a lower)
    row = int(np.argmax(np.diff(pL) >= 2))
    if pL[row + 1] - pL[row] >= 2:
        iL_sw = iL.copy()
        vL_sw = vL.copy()
        a, b = pL[row + 1] - 1, pL[row + 1] - 2
        iL_sw[[a, b]] = iL_sw[[b, a]]
        vL_sw[[a, b]] = vL_sw[[b, a]]
        with pytest.raises(AoclSparseError) as e:
            ast.create_tcsr(m, m, nnz, pL, pU, iL_sw, iU, vL, vU)
        assert e.value.status == Status.unsorted_input


def test_tcsr_update_values_not_implemented(tri_dense):
    m = tri_dense.shape[0]
    nnz, *arrs = _split_tcsr(tri_dense)
    A = ast.create_tcsr(m, m, nnz, *arrs)
    with pytest.raises(AoclSparseError) as e:
        ast.update_values(A, np.zeros(nnz))
    assert e.value.status == Status.not_implemented


def test_tcsr_in_solver(tri_dense, rng):
    # TCSR handle must flow through the solver stack like any matrix
    m = tri_dense.shape[0]
    spd = tri_dense @ tri_dense.T + m * np.eye(m)
    spd[np.abs(spd) < 1e-12] = 0
    nnz, *arrs = _split_tcsr(spd)
    A = ast.create_tcsr(m, m, nnz, *arrs)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "CG")
    x, rinfo, st = ast.itsol_solve(h, m, A, GEN, b)
    assert st == Status.success
    np.testing.assert_allclose(spd @ np.asarray(x), b, atol=1e-6)
