"""Extreme-value (NaN/Inf/max/min) IEEE-propagation tests, mirroring the
reference's extreme_value_tests.cpp:23-60 methodology: matrices seeded with
specials at known slots, outputs compared against the dense oracle with
equal_nan. Specials live in the STORED VALUES (the reference's setup);
x/B stay finite — a dense-window execution form is only IEEE-equivalent to
the sparse sum when the un-stored slots multiply finite x (0*finite == 0)."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation, Status
from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType, Request
from aoclsparse_tpu.utils.reference import csr_to_dense, ref_mv

from conftest import random_csr

GEN = MatrixDescriptor()
NAN = float("nan")
INF = float("inf")


def _seeded_csr(rng, m, n, dtype=np.float64, specials=((0, "nan"), (2, "inf"), (4, "max"))):
    dense = rng.standard_normal((m, n)).astype(dtype)
    dense[np.abs(dense) < 1.2] = 0
    dense[np.arange(m), np.arange(m) % n] = 1.0  # ensure stored slots
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    val = dense[dense != 0].astype(dtype)
    fi = np.finfo(dtype)
    picks = {"nan": dtype(NAN), "inf": dtype(INF), "max": fi.max, "min": fi.tiny}
    for row, kind in specials:
        lo, hi = int(ptr[row]), int(ptr[row + 1])
        if hi > lo:
            val[lo] = picks[kind]
    dense2 = np.zeros((m, n), dtype=dtype)
    dense2[np.repeat(np.arange(m), np.diff(ptr)), ind] = val
    return ptr, ind, val, dense2


@pytest.mark.parametrize("kid", [0, 1, 2])  # segsum / ell / ellhyb kernels
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_mv_special_values_propagate(rng, kid, dtype):
    m = n = 24
    ptr, ind, val, dense = _seeded_csr(rng, m, n, dtype)
    A = ast.create_csr(m, n, ptr, ind, val)
    x = (rng.random(n) + 0.5).astype(dtype)
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=kid))
    # oracle in the SAME dtype (float32 overflows max*x to inf exactly like
    # the kernel must; a float64 oracle would stay finite)
    want = dense @ x
    # rows with a NaN slot are NaN; rows with inf are +/-inf; rest finite
    np.testing.assert_array_equal(np.isnan(y), np.isnan(want))
    np.testing.assert_array_equal(np.isinf(y), np.isinf(want))
    fin = np.isfinite(want)
    rtol = 2e-5 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(
        y[fin].astype(np.float64), want[fin].astype(np.float64), rtol=rtol
    )


def test_mv_alpha_nan_contaminates_everything(rng):
    m = 12
    ptr, ind, val, dense = _seeded_csr(rng, m, m, specials=())
    A = ast.create_csr(m, m, ptr, ind, val)
    y = np.asarray(ast.mv(NAN, A, GEN, Operation.none, np.ones(m), 0.0))
    assert np.all(np.isnan(y))


def test_mv_beta_inf_with_zero_y(rng):
    # inf * 0 = NaN must propagate through the beta epilogue (IEEE)
    m = 12
    ptr, ind, val, dense = _seeded_csr(rng, m, m, specials=())
    A = ast.create_csr(m, m, ptr, ind, val)
    y0 = np.zeros(m)
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, np.ones(m), INF, y=y0))
    assert np.all(np.isnan(y))


def test_trsv_nan_propagates_to_dependents(rng):
    # NaN in L[2, 0]: x[0], x[1] clean; x[2] and every row depending on it NaN
    m = 8
    dense = np.tril(np.ones((m, m)))
    np.fill_diagonal(dense, 2.0)
    dense[2, 0] = NAN
    ptr = np.concatenate([[0], np.cumsum((~np.isnan(dense) & (dense != 0) | np.isnan(dense)).sum(1))]).astype(np.int64)
    mask = (dense != 0) | np.isnan(dense)
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))]).astype(np.int64)
    ind = np.nonzero(mask)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[mask])
    tri = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    b = np.ones(m)
    x = np.asarray(ast.trsv(1.0, A, tri, Operation.none, b))
    assert np.isfinite(x[0]) and np.isfinite(x[1])
    assert np.isnan(x[2:]).all()  # dense lower rows all depend on x[2]


def test_mm_special_values(rng):
    m, n, k = 16, 14, 5
    ptr, ind, val, dense = _seeded_csr(rng, m, n)
    A = ast.create_csr(m, n, ptr, ind, val)
    B = rng.random((n, k)) + 0.5
    C = np.asarray(ast.mm(1.0, A, GEN, Operation.none, B, 0.0))
    want = dense @ B
    np.testing.assert_array_equal(np.isnan(C), np.isnan(want))
    fin = np.isfinite(want)
    np.testing.assert_allclose(C[fin], want[fin], rtol=1e-10)


def test_sp2m_special_values(rng):
    mA, nA, nB = 14, 12, 10
    ptrA, indA, valA, dA = _seeded_csr(rng, mA, nA, specials=((1, "nan"), (3, "inf")))
    ptrB, indB, valB, dB = _seeded_csr(rng, nA, nB, specials=())
    A = ast.create_csr(mA, nA, ptrA, indA, valA)
    B = ast.create_csr(nA, nB, ptrB, indB, valB)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    _, _, _, ptr, ind, valc = ast.export_csr(C)
    dC = np.full((mA, nB), 0.0)
    dC[np.repeat(np.arange(mA), np.diff(ptr)), ind] = valc
    # SPARSE-product oracle: sum only stored products (a dense reference
    # would inject NaN via inf*0 against unstored B slots — the sparse
    # semantics the reference's scalar kernels define never touch those)
    want = np.zeros((mA, nB))
    rowsA = np.repeat(np.arange(mA), np.diff(ptrA))
    for p in range(valA.size):
        i, k, av = rowsA[p], indA[p], valA[p]
        lo, hi = int(ptrB[k]), int(ptrB[k + 1])
        np.add.at(want[i], indB[lo:hi], av * valB[lo:hi])
    patt = np.zeros((mA, nB), bool)
    patt[np.repeat(np.arange(mA), np.diff(ptr)), ind] = True
    np.testing.assert_array_equal(np.isnan(dC[patt]), np.isnan(want[patt]))
    fin = patt & np.isfinite(want) & ~np.isnan(want)
    np.testing.assert_allclose(dC[fin], want[fin], rtol=1e-10)


def test_dot_axpyi_specials():
    x = np.array([1.0, NAN, 2.0])
    ind = np.array([0, 2, 4], np.int32)
    y = np.ones(6)
    d = ast.doti(x, ind, y)
    assert np.isnan(float(d))
    out = np.asarray(ast.axpyi(2.0, x, ind, y.copy()))
    assert np.isnan(out[2]) and np.isfinite(out[0]) and np.isfinite(out[4])


def test_max_values_overflow_to_inf(rng):
    # max * max overflows to inf in the product (reference pins this in
    # sp2m extreme tests)
    dtype = np.float64
    big = np.finfo(dtype).max
    ptr = np.array([0, 1], np.int64)
    ind = np.array([0], np.int32)
    A = ast.create_csr(1, 1, ptr, ind, np.array([big]))
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, np.array([big]), 0.0))
    assert np.isinf(y[0])


def test_tiny_values_preserved(rng):
    dtype = np.float64
    tiny = np.finfo(dtype).tiny
    ptr = np.array([0, 1], np.int64)
    ind = np.array([0], np.int32)
    A = ast.create_csr(1, 1, ptr, ind, np.array([tiny]))
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, np.array([1.0]), 0.0))
    assert y[0] == tiny


def test_ilu0_inf_pivot_status(rng):
    # a zero pivot must surface numerical_error, not silently produce inf
    m = 3
    dense = np.array([[0.0, 1.0, 0], [1.0, 1.0, 0], [0, 1.0, 1.0]])
    dense[0, 0] = 0.0
    mask = np.array([[True, True, False], [True, True, False], [False, True, True]])
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))]).astype(np.int64)
    ind = np.nonzero(mask)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[mask])
    with pytest.raises(ast.AoclSparseError) as e:
        ast.ilu0_factorize(A)
    assert e.value.status == Status.numerical_error


def test_nonfinite_beta_propagates_without_y(rng):
    """beta = inf/nan with NO accumulate target: beta * 0 must still
    contaminate (the y=None dispatch fast path only applies to finite
    beta == 0; extreme_value_tests.cpp IEEE policy)."""
    m, n = 12, 10
    mask = rng.random((m, n)) < 0.5
    dense = np.where(mask, rng.standard_normal((m, n)), 0.0)
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
    A = ast.create_csr(m, n, ptr, np.nonzero(mask)[1], dense[mask])
    x = rng.standard_normal(n)
    B = rng.standard_normal((n, 3))
    for bad in (float("inf"), float("nan")):
        y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, bad))
        assert np.all(np.isnan(y))
        C = np.asarray(ast.mm(1.0, A, GEN, Operation.none, B, bad))
        assert np.all(np.isnan(C))
    # empty matrix + non-finite alpha contaminates through the quick exit
    A0 = ast.create_csr(m, n, np.zeros(m + 1, np.int64), np.zeros(0, np.int64), np.zeros(0))
    C0 = rng.standard_normal((m, 3))
    out = np.asarray(ast.mm(float("inf"), A0, GEN, Operation.none, B, 1.0, C0))
    assert np.all(np.isnan(out))


def test_beta_zero_does_not_read_y(rng):
    """beta == 0 overwrites y WITHOUT reading it: a NaN/Inf-filled y must
    not contaminate the result (reference zeroes y directly,
    csrmv_kr.hpp:54-56). NaN beta still propagates (compares != 0)."""
    m = 6
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.5)
    A = ast.create_csr(m, m, ptr, ind, val)
    x = rng.standard_normal(m)
    bad_y = np.full(m, np.nan)
    got = ast.mv(1.5, A, GEN, Operation.none, x, 0.0, bad_y)
    np.testing.assert_allclose(np.asarray(got), 1.5 * dense @ x, rtol=1e-12)
    # quick-exit path (alpha == 0) with NaN y and beta == 0 -> zeros
    got0 = ast.mv(0.0, A, GEN, Operation.none, x, 0.0, bad_y)
    assert not np.any(np.isnan(np.asarray(got0)))
    # NaN beta DOES propagate
    gnan = ast.mv(1.0, A, GEN, Operation.none, x, np.nan, np.ones(m))
    assert np.all(np.isnan(np.asarray(gnan)))


def test_beta_zero_does_not_read_C_mm_sp2md_syrkd(rng):
    m, n, k = 5, 4, 3
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.6)
    A = ast.create_csr(m, n, ptr, ind, val)
    B = rng.standard_normal((n, k))
    badC = np.full((m, k), np.inf)
    got = ast.mm(2.0, A, GEN, Operation.none, B, 0.0, badC)
    np.testing.assert_allclose(np.asarray(got), 2.0 * dense @ B, rtol=1e-12)
    # sp2md
    ptrB, indB, valB, dB = random_csr(rng, n, m, density=0.6)
    Bs = ast.create_csr(n, m, ptrB, indB, valB)
    badCm = np.full((m, m), np.nan)
    got2 = ast.sp2md(Operation.none, GEN, A, Operation.none, GEN, Bs, 1.0, 0.0, badCm)
    np.testing.assert_allclose(np.asarray(got2), dense @ dB, rtol=1e-10, atol=1e-12)
    # syrkd upper triangle: beta=0 must not pull NaN into j >= i; the
    # strict lower keeps the caller's C verbatim (even non-finite)
    sq_ptr, sq_ind, sq_val, sq_d = random_csr(rng, m, m, density=0.5)
    S = ast.create_csr(m, m, sq_ptr, sq_ind, sq_val)
    badSq = np.full((m, m), np.nan)
    got3 = np.asarray(ast.syrkd(Operation.none, S, 1.0, 0.0, badSq))
    want_up = sq_d @ sq_d.T
    iu = np.triu_indices(m)
    np.testing.assert_allclose(got3[iu], want_up[iu], rtol=1e-10, atol=1e-12)
    il = np.tril_indices(m, -1)
    assert np.all(np.isnan(got3[il]))
