"""Conversion sweep (reference: conversion/create/export test files):
round-trips across every format pair and dtype, base handling, ELLHYB split
semantics, SELL build, dense interop."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu.convert import conversions as cv
from aoclsparse_tpu.core.formats import CSR
from aoclsparse_tpu.utils.reference import csr_to_dense

from conftest import random_csr

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _dense_of_csr(A: CSR):
    return csr_to_dense(A.m, A.n, np.asarray(A.ptr), np.asarray(A.ind), np.asarray(A.val))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", [(9, 7), (7, 9), (8, 8), (1, 5), (5, 1)])
def test_roundtrip_all_formats(rng, dtype, shape):
    m, n = shape
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.35, dtype=dtype)
    A = CSR(ptr, ind, val, shape=(m, n))
    # csc
    np.testing.assert_allclose(_dense_of_csr(cv.to_csr(cv.to_csc(A))), dense)
    # coo
    np.testing.assert_allclose(_dense_of_csr(cv.to_csr(cv.to_coo(A))), dense)
    # ell
    np.testing.assert_allclose(_dense_of_csr(cv.to_csr(cv.csr_to_ell(A))), dense)
    # dia
    np.testing.assert_allclose(_dense_of_csr(cv.to_csr(cv.csr_to_dia(A))), dense)
    # bsr (block 2 and 3)
    for bs in (2, 3):
        np.testing.assert_allclose(_dense_of_csr(cv.bsr_to_csr(cv.csr_to_bsr(A, bs))), dense)
    # dense
    np.testing.assert_allclose(np.asarray(cv.csr_to_dense(A)), dense)
    np.testing.assert_allclose(_dense_of_csr(cv.dense_to_csr(dense)), dense)


def test_ellhyb_split_semantics(rng):
    m, n = 12, 12
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    A = CSR(ptr, ind, val, shape=(m, n))
    ell, spill = cv.csr_to_ellhyb(A, width=2)
    # head holds at most 2 entries/row; union reconstructs the matrix
    d1 = _dense_of_csr(cv.to_csr(ell))
    d2 = _dense_of_csr(spill) if spill.nnz else np.zeros_like(dense)
    np.testing.assert_allclose(d1 + d2, dense)
    assert ell.width == 2
    assert np.all(np.sum(np.asarray(ell.ind) >= 0, axis=1) <= 2)


def test_sell_roundtrip_structure(rng):
    m, n = 20, 16
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.3)
    A = CSR(ptr, ind, val, shape=(m, n))
    S = cv.csr_to_sell(A, slice_rows=8, lane=4)
    # every stored entry appears once
    sind = np.asarray(S.ind)
    sval = np.asarray(S.val)
    got = np.zeros_like(dense)
    sp = np.asarray(S.slice_ptr)
    w = np.asarray(S.slice_width)
    for s in range(S.nslices):
        for r in range(S.slice_rows):
            i = s * S.slice_rows + r
            if i >= m:
                continue
            o = int(sp[s]) + r * int(w[s])
            for t in range(int(w[s])):
                if sind[o + t] >= 0:
                    got[i, sind[o + t]] += sval[o + t]
    np.testing.assert_allclose(got, dense)


def test_sort_csr_unsorted_input(rng):
    m = 10
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.4, sorted_ind=False)
    A = CSR(ptr, ind, val, shape=(m, m))
    S = cv.sort_csr(A)
    ind_s = np.asarray(S.ind)
    p = np.asarray(S.ptr)
    for i in range(m):
        row = ind_s[p[i] : p[i + 1]]
        assert np.all(np.diff(row) > 0)
    np.testing.assert_allclose(_dense_of_csr(S), dense)


@pytest.mark.parametrize("op", [ast.Operation.transpose, ast.Operation.conjugate_transpose])
def test_csr_apply_operation(rng, op):
    m, n = 6, 8
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4, dtype=np.complex128)
    A = CSR(ptr, ind, val, shape=(m, n))
    T = cv.csr_apply_operation(A, op)
    want = dense.T if op == ast.Operation.transpose else dense.conj().T
    np.testing.assert_allclose(_dense_of_csr(T), want)


def test_create_export_one_based_all_formats(rng):
    m, n = 6, 6
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    A1 = ast.create_csr(m, n, np.asarray(ptr) + 1, np.asarray(ind) + 1, val,
                        base=ast.IndexBase.one)
    # export in both bases
    _, _, _, p0, i0, v0 = ast.export_csr(A1, base=ast.IndexBase.zero)
    np.testing.assert_allclose(csr_to_dense(m, n, p0, i0, v0), dense)
    _, _, _, p1, i1, v1 = ast.export_csr(A1)  # handle's own base (one)
    assert p1[0] == 1 and (i1 >= 1).all()
    np.testing.assert_allclose(csr_to_dense(m, n, p1 - 1, i1 - 1, v1), dense)


def test_export_csc_coo_consistency(rng):
    m, n = 7, 5
    ptr, ind, val, dense = random_csr(rng, m, n, density=0.4)
    h = ast.create_csr(m, n, ptr, ind, val)
    mc, nc, nnzc, cp, ci, cval = ast.export_csc(h)
    # rebuild dense from CSC
    d = np.zeros((m, n))
    for j in range(n):
        for k in range(int(cp[j]), int(cp[j + 1])):
            d[int(ci[k]), j] += cval[k]
    np.testing.assert_allclose(d, dense)
    mo, no, nnzo, orow, ocol, oval = ast.export_coo(h)
    d2 = np.zeros((m, n))
    for r, c, v in zip(orow, ocol, oval):
        d2[int(r), int(c)] += v
    np.testing.assert_allclose(d2, dense)


def test_copy_independent(rng):
    m = 5
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.5, ensure_diag=True)
    h = ast.create_csr(m, m, ptr, ind, val)
    h2 = ast.copy(h)
    ast.update_values(h2, np.asarray(val) * 2)
    # original unchanged
    _, _, _, p, i, v = ast.export_csr(h)
    np.testing.assert_allclose(csr_to_dense(m, m, p, i, v), dense)
