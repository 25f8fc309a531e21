"""Conversion tests against dense reference (reference: conversion gtest
suites csr2csc/csr2ell/csr2dia/csr2bsr/csr2dense/convert_csr tests)."""

import numpy as np
import pytest

import aoclsparse_tpu as asp
from aoclsparse_tpu.convert import conversions as cv
from aoclsparse_tpu.core.formats import CSR, COO
from aoclsparse_tpu.utils.reference import csr_to_dense


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex128])
def test_csr_transpose(make_csr, dtype):
    ptr, ind, val, dense = make_csr(7, 5, dtype=dtype)
    A = CSR(ptr, ind, val, shape=(7, 5))
    T = cv.csr_transpose(A)
    np.testing.assert_allclose(csr_to_dense(5, 7, T.ptr, T.ind, T.val), dense.T)
    H = cv.csr_transpose(A, conj=True)
    np.testing.assert_allclose(csr_to_dense(5, 7, H.ptr, H.ind, H.val), dense.conj().T)


def test_sort_csr(make_csr):
    ptr, ind, val, dense = make_csr(6, 6, sorted_ind=False)
    A = cv.sort_csr(CSR(ptr, ind, val, shape=(6, 6)))
    ind_s = np.asarray(A.ind)
    p = np.asarray(A.ptr)
    for i in range(6):
        row = ind_s[p[i] : p[i + 1]]
        assert np.all(np.diff(row) > 0)
    np.testing.assert_allclose(csr_to_dense(6, 6, A.ptr, A.ind, A.val), dense)


def test_coo_to_csr_with_duplicates():
    A = COO(
        np.array([1, 0, 1, 0], np.int32),
        np.array([1, 0, 1, 2], np.int32),
        np.array([5.0, 1.0, 7.0, 2.0]),
        shape=(2, 3),
    )
    B = cv.coo_to_csr(A, sum_duplicates=True)
    np.testing.assert_allclose(
        csr_to_dense(2, 3, B.ptr, B.ind, B.val), [[1, 0, 2], [0, 12, 0]]
    )


@pytest.mark.parametrize("width", [None, 6])
def test_csr_to_ell_roundtrip(make_csr, width):
    ptr, ind, val, dense = make_csr(9, 9, density=0.4)
    A = CSR(ptr, ind, val, shape=(9, 9))
    E = cv.csr_to_ell(A, width)
    back = cv.to_csr(E)
    np.testing.assert_allclose(csr_to_dense(9, 9, back.ptr, back.ind, back.val), dense)


def test_csr_to_ellhyb(make_csr):
    ptr, ind, val, dense = make_csr(12, 12, density=0.5)
    A = CSR(ptr, ind, val, shape=(12, 12))
    ell, spill = cv.csr_to_ellhyb(A, width=3)
    d1 = csr_to_dense(12, 12, *(lambda c: (c.ptr, c.ind, c.val))(cv.to_csr(ell)))
    d2 = csr_to_dense(12, 12, spill.ptr, spill.ind, spill.val)
    np.testing.assert_allclose(d1 + d2, dense)


def test_csr_to_dia(make_csr):
    ptr, ind, val, dense = make_csr(8, 8, density=0.3)
    A = CSR(ptr, ind, val, shape=(8, 8))
    D = cv.csr_to_dia(A)
    back = cv.to_csr(D)
    np.testing.assert_allclose(csr_to_dense(8, 8, back.ptr, back.ind, back.val), dense)


@pytest.mark.parametrize("bs", [2, 3])
def test_csr_to_bsr_roundtrip(make_csr, bs):
    m = n = 6
    ptr, ind, val, dense = make_csr(m, n, density=0.4)
    A = CSR(ptr, ind, val, shape=(m, n))
    B = cv.csr_to_bsr(A, bs)
    back = cv.bsr_to_csr(B)
    np.testing.assert_allclose(
        csr_to_dense(m, n, back.ptr, back.ind, back.val), dense
    )


def test_csr_to_sell_roundtrip(make_csr):
    ptr, ind, val, dense = make_csr(20, 150, density=0.2)
    A = CSR(ptr, ind, val, shape=(20, 150))
    S = cv.csr_to_sell(A, slice_rows=8, lane=16)
    # reconstruct densely from SELL
    sp = np.asarray(S.slice_ptr)
    sw = np.asarray(S.slice_width)
    si = np.asarray(S.ind)
    sv = np.asarray(S.val)
    out = np.zeros((20, 150))
    for s in range(S.nslices):
        w = int(sw[s])
        for r in range(S.slice_rows):
            i = s * S.slice_rows + r
            if i >= 20:
                continue
            o = int(sp[s]) + r * w
            for k in range(w):
                if si[o + k] >= 0:
                    out[i, si[o + k]] += sv[o + k]
    np.testing.assert_allclose(out, dense)


def test_dense_roundtrip(make_csr):
    ptr, ind, val, dense = make_csr(5, 7)
    A = CSR(ptr, ind, val, shape=(5, 7))
    d = cv.csr_to_dense(A)
    np.testing.assert_allclose(np.asarray(d), dense)
    col = cv.csr_to_dense(A, order="column")
    np.testing.assert_allclose(np.asarray(col), dense.T)
    back = cv.dense_to_csr(dense)
    np.testing.assert_allclose(csr_to_dense(5, 7, back.ptr, back.ind, back.val), dense)


def test_to_csc(make_csr):
    ptr, ind, val, dense = make_csr(6, 4)
    A = CSR(ptr, ind, val, shape=(6, 4))
    C = cv.to_csc(A)
    assert C.shape == (6, 4)
    # csc arrays read as CSR give the transpose
    np.testing.assert_allclose(csr_to_dense(4, 6, C.ptr, C.ind, C.val), dense.T)
    back = cv.to_csr(C)
    np.testing.assert_allclose(csr_to_dense(6, 4, back.ptr, back.ind, back.val), dense)
