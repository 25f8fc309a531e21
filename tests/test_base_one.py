"""One-based-index sweep: every major op family driven through a base-1
handle against the 0-based dense oracle.

The reference tests base permutations pervasively (bench_tests.cmake:85-138
registers base-0/base-1 variants of every op; unit tests assert wrong-base
statuses, e.g. csrmv_tests.cpp). Here the contract is: `create_*(..., base=1)`
handles must behave identically to 0-based ones through mv/trsv/trsm/mm/
sp2m/add/dotmv/symgs/sorv/ilu/itsol, exports must round-trip the original
base, and mixed-base products must carry values correctly.
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    SorType,
    Status,
)
from aoclsparse_tpu.utils.reference import ref_mv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

GEN = MatrixDescriptor()
# base-1 handles require base-1 descriptors: the reference errors on a
# descriptor/matrix base mismatch (aoclsparse_mv.cpp:71-73) and so do we
GEN1 = MatrixDescriptor(base=1)
TRI_L1 = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower, base=1)
TRI_U1 = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.upper, base=1)


def _spd(rng, m, density=0.35):
    """Symmetric positive-definite dense + its CSR triplets (0-based)."""
    d = rng.standard_normal((m, m)) * (rng.random((m, m)) < density)
    d = d + d.T + np.eye(m) * (np.abs(d).sum() / m + 4.0)
    mask = d != 0
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
    return ptr, np.nonzero(mask)[1], d[mask], d


def _base1(m, n, ptr, ind, val):
    return ast.create_csr(m, n, np.asarray(ptr) + 1, np.asarray(ind) + 1, val, base=1)


@pytest.mark.parametrize(
    "op", [Operation.none, Operation.transpose, Operation.conjugate_transpose]
)
def test_mv_base1_all_ops(rng, op):
    m, n = 17, 13
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    A1 = _base1(m, n, ptr, ind, val)
    x = rng.standard_normal(m if op != Operation.none else n)
    y0 = rng.standard_normal(n if op != Operation.none else m)
    got = ast.mv(1.25, A1, GEN1, op, x, -0.5, y0)
    want = ref_mv(1.25, m, n, ptr, ind, val, GEN, op, x, -0.5, y0)
    assert_allclose_spec(np.asarray(got), want, dtype=np.float64, scale=10)


def test_mv_base1_symmetric(rng):
    m = 14
    ptr, ind, val, dense = _spd(rng, m)
    A1 = _base1(m, m, ptr, ind, val)
    x = rng.standard_normal(m)
    descr = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower, base=1)
    got = ast.mv(1.0, A1, descr, Operation.none, x, 0.0)
    sym = np.tril(dense) + np.tril(dense, -1).T
    assert_allclose_spec(np.asarray(got), sym @ x, dtype=np.float64, scale=10)


@pytest.mark.parametrize("descr,tri", [(TRI_L1, np.tril), (TRI_U1, np.triu)])
def test_trsv_trsm_base1(rng, descr, tri):
    m = 15
    ptr, ind, val, dense = _spd(rng, m)
    A1 = _base1(m, m, ptr, ind, val)
    b = rng.standard_normal(m)
    got = ast.trsv(2.0, A1, descr, Operation.none, b)
    want = np.linalg.solve(tri(dense), 2.0 * b)
    assert_allclose_spec(np.asarray(got), want, dtype=np.float64, scale=30)
    B = rng.standard_normal((m, 3))
    gotm = ast.trsm(1.0, A1, descr, Operation.none, B)
    wantm = np.linalg.solve(tri(dense), B)
    assert_allclose_spec(np.asarray(gotm), wantm, dtype=np.float64, scale=30)


def test_mm_base1(rng):
    m, n, k = 12, 9, 5
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    A1 = _base1(m, n, ptr, ind, val)
    B = rng.standard_normal((n, k))
    C = rng.standard_normal((m, k))
    got = ast.mm(0.75, A1, GEN1, Operation.none, B, 1.5, C)
    assert_allclose_spec(np.asarray(got), 0.75 * dense @ B + 1.5 * C, dtype=np.float64, scale=10)


@pytest.mark.parametrize("baseB", [0, 1])
def test_sp2m_mixed_bases(rng, baseB):
    """Product of a base-1 A with a base-0 or base-1 B: values must agree
    with the dense product regardless of operand bases (the reference
    normalizes via the clean-CSR zero-basing, csr_util.hpp:764)."""
    m, k, n = 10, 8, 11
    ptrA, indA, valA, dA = random_csr(rng, m, k, density=0.4)
    ptrB, indB, valB, dB = random_csr(rng, k, n, density=0.4)
    A1 = _base1(m, k, ptrA, indA, valA)
    B = (
        _base1(k, n, ptrB, indB, valB)
        if baseB
        else ast.create_csr(k, n, ptrB, indB, valB)
    )
    P = ast.sp2m(Operation.none, GEN1, A1, Operation.none,
                 GEN1 if baseB else GEN, B)
    mo, no, nnzo, po, io, vo = ast.export_csr(P)
    base_out = int(po[0])
    dP = np.zeros((m, n))
    np.add.at(dP, (np.repeat(np.arange(m), np.diff(po)), np.asarray(io) - base_out), vo)
    assert_allclose_spec(dP, dA @ dB, dtype=np.float64, scale=20)


def test_add_base1(rng):
    m, n = 9, 7
    ptrA, indA, valA, dA = random_csr(rng, m, n, density=0.4)
    ptrB, indB, valB, dB = random_csr(rng, m, n, density=0.4)
    C = ast.add(Operation.none, 2.0, _base1(m, n, ptrA, indA, valA), _base1(m, n, ptrB, indB, valB))
    mo, no, nnzo, po, io, vo = ast.export_csr(C)
    b0 = int(po[0])
    dC = np.zeros((m, n))
    np.add.at(dC, (np.repeat(np.arange(m), np.diff(po)), np.asarray(io) - b0), vo)
    assert_allclose_spec(dC, 2.0 * dA + dB, dtype=np.float64, scale=10)


def test_dotmv_base1(rng):
    m = 13
    ptr, ind, val, dense = _spd(rng, m)
    A1 = _base1(m, m, ptr, ind, val)
    x = rng.standard_normal(m)
    y, d = ast.dotmv(1.0, A1, GEN1, Operation.none, x, 0.0)
    assert_allclose_spec(np.asarray(y), dense @ x, dtype=np.float64, scale=10)
    assert abs(float(d) - float(x @ (dense @ x))) < 1e-8 * max(1.0, abs(float(d)))


def test_symgs_base1_matches_base0(rng):
    m = 12
    ptr, ind, val, dense = _spd(rng, m)
    A0 = ast.create_csr(m, m, ptr, ind, val)
    A1 = _base1(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower)
    descr1 = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower, base=1)
    b = rng.standard_normal(m)
    x0 = rng.standard_normal(m)
    g0 = ast.symgs(Operation.none, A0, descr, 1.0, b, x0)
    g1 = ast.symgs(Operation.none, A1, descr1, 1.0, b, x0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-12, atol=1e-12)


def test_sorv_base1_matches_base0(rng):
    m = 11
    ptr, ind, val, dense = _spd(rng, m)
    A0 = ast.create_csr(m, m, ptr, ind, val)
    A1 = _base1(m, m, ptr, ind, val)
    b = rng.standard_normal(m)
    x = np.zeros(m)
    g0 = ast.sorv(SorType.forward, GEN, A0, 1.2, 1.0, x, b)
    g1 = ast.sorv(SorType.forward, GEN1, A1, 1.2, 1.0, x, b)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-12, atol=1e-12)


def test_ilu_smoother_base1(rng):
    m = 10
    ptr, ind, val, dense = _spd(rng, m)
    A0 = ast.create_csr(m, m, ptr, ind, val)
    A1 = _base1(m, m, ptr, ind, val)
    b = rng.standard_normal(m)
    g0 = ast.ilu_smoother(A0, GEN, b)
    g1 = ast.ilu_smoother(A1, GEN1, b)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-10, atol=1e-10)


def test_itsol_cg_base1(rng):
    m = 20
    ptr, ind, val, dense = _spd(rng, m)
    A1 = _base1(m, m, ptr, ind, val)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "CG")
    out = ast.itsol_solve(h, m, A1, GEN1, b)
    x = out[0]
    np.testing.assert_allclose(dense @ np.asarray(x), b, rtol=0, atol=1e-6)


def test_create_csc_coo_base1(rng):
    m, n = 8, 6
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    # CSC of dense: column-compressed
    cptr = np.concatenate([[0], np.cumsum((dense != 0).sum(0))])
    crow = np.nonzero(dense.T != 0)[1]
    cval = dense.T[dense.T != 0]
    C1 = ast.create_csc(m, n, cptr + 1, crow + 1, cval, base=1)
    x = rng.standard_normal(n)
    y = ast.mv(1.0, C1, GEN1, Operation.none, x, 0.0)
    assert_allclose_spec(np.asarray(y), dense @ x, dtype=np.float64, scale=10)
    rows, cols = np.nonzero(dense)
    O1 = ast.create_coo(m, n, rows + 1, cols + 1, dense[rows, cols], base=1)
    y2 = ast.mv(1.0, O1, GEN1, Operation.none, x, 0.0)
    assert_allclose_spec(np.asarray(y2), dense @ x, dtype=np.float64, scale=10)


def test_base1_out_of_range_rejected(rng):
    """Base-1 indices of 0 (i.e. below base) or > n must be rejected with
    invalid_index_value, mirroring the reference's mat_check_internal."""
    ptr = np.array([1, 2, 3])
    for bad in (np.array([0, 1]), np.array([1, 4])):
        with pytest.raises(ast.AoclSparseError) as e:
            ast.create_csr(2, 3, ptr, bad, np.ones(2), base=1)
        assert e.value.status == Status.invalid_index_value


def test_export_preserves_base1_after_ops(rng):
    m, n = 7, 7
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.5)
    A1 = _base1(m, n, ptr, ind, val)
    ast.optimize(A1)
    mo, no, nnzo, pe, ie, ve = ast.export_csr(A1)
    assert int(pe[0]) == 1 and int(np.min(ie)) >= 1
    np.testing.assert_array_equal(np.asarray(pe), np.asarray(ptr) + 1)


def test_base_mismatch_rejected(rng):
    """Descriptor/matrix base mismatch is invalid_value on every entry
    that takes both (aoclsparse_mv.cpp:71-73 and siblings)."""
    m = 6
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.5, ensure_diag=True)
    A0 = ast.create_csr(m, m, ptr, ind, val)
    A1 = _base1(m, m, ptr, ind, val)
    x = rng.standard_normal(m)
    for fn in (
        lambda: ast.mv(1.0, A1, GEN, Operation.none, x, 0.0),
        lambda: ast.mv(1.0, A0, GEN1, Operation.none, x, 0.0),
        lambda: ast.trsv(1.0, A1, MatrixDescriptor(type=MatrixType.triangular), Operation.none, x),
        lambda: ast.mm(1.0, A1, GEN, Operation.none, rng.standard_normal((m, 2)), 0.0),
        lambda: ast.symgs(
            Operation.none,
            A1,
            MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower),
            1.0,
            x,
            x,
        ),
        lambda: ast.sorv(SorType.forward, GEN, A1, 1.0, 1.0, x, x),
        lambda: ast.set_mv_hint(A1, Operation.none, GEN, nop=1),
    ):
        with pytest.raises(ast.AoclSparseError) as e:
            fn()
        assert e.value.status == Status.invalid_value
