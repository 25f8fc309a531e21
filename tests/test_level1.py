"""Level-1 op tests (reference: tests/unit_tests/{axpyi,dot,gthr,roti,sctr}_tests.cpp):
null args, size mismatches, wrong dtype, empty-nnz quick exits, numeric
parity vs scalar references for all dtypes."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, Status
from aoclsparse_tpu.ops import (
    axpyi,
    dotci,
    doti,
    dotui,
    gthr,
    gthrs,
    gthrz,
    roti,
    sctr,
    sctrs,
)
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _sparse_vec(rng, nnz, m, dtype):
    indx = rng.choice(m, size=nnz, replace=False).astype(np.int32)
    x = rng.standard_normal(nnz)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        x = x + 1j * rng.standard_normal(nnz)
    y = rng.standard_normal(m)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        y = y + 1j * rng.standard_normal(m)
    return x.astype(dtype), indx, y.astype(dtype)


@pytest.mark.parametrize("dtype", DTYPES)
def test_axpyi(rng, dtype):
    x, indx, y = _sparse_vec(rng, 6, 20, dtype)
    a = 1.5
    got = axpyi(a, x, indx, y)
    want = y.copy()
    want[indx] += a * x
    assert_allclose_spec(got, want, dtype=dtype)


def test_axpyi_empty(rng):
    y = rng.standard_normal(5)
    got = axpyi(2.0, np.zeros(0), np.zeros(0, np.int32), y)
    assert_allclose_spec(got, y)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_doti(rng, dtype):
    x, indx, y = _sparse_vec(rng, 7, 25, dtype)
    got = doti(x, indx, y)
    assert_allclose_spec(np.asarray(got), np.sum(x * y[indx]), dtype=dtype, scale=10)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_dotci_dotui(rng, dtype):
    x, indx, y = _sparse_vec(rng, 7, 25, dtype)
    assert_allclose_spec(np.asarray(dotci(x, indx, y)), np.sum(np.conj(x) * y[indx]), dtype=dtype, scale=10)
    assert_allclose_spec(np.asarray(dotui(x, indx, y)), np.sum(x * y[indx]), dtype=dtype, scale=10)


def test_dotci_real_rejected(rng):
    x, indx, y = _sparse_vec(rng, 3, 10, np.float64)
    with pytest.raises(AoclSparseError) as e:
        dotci(x, indx, y)
    assert e.value.status == Status.wrong_type


@pytest.mark.parametrize("dtype", DTYPES)
def test_gthr_gthrz(rng, dtype):
    _, indx, y = _sparse_vec(rng, 5, 18, dtype)
    got = gthr(y, indx)
    assert_allclose_spec(got, y[indx], dtype=dtype)
    x2, y2 = gthrz(y, indx)
    assert_allclose_spec(x2, y[indx], dtype=dtype)
    want_y = y.copy()
    want_y[indx] = 0
    assert_allclose_spec(y2, want_y, dtype=dtype)


def test_gthrs_sctrs(rng):
    y = rng.standard_normal(12)
    got = gthrs(y, 3)
    assert_allclose_spec(got, y[::3])
    x = rng.standard_normal(4)
    y2 = sctrs(x, 3, y)
    want = y.copy()
    want[::3] = x
    assert_allclose_spec(y2, want)
    with pytest.raises(AoclSparseError) as e:
        gthrs(y, -1)
    assert e.value.status == Status.invalid_size
    with pytest.raises(AoclSparseError) as e:
        sctrs(np.ones(10), 3, y)
    assert e.value.status == Status.invalid_size


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_roti(rng, dtype):
    x, indx, y = _sparse_vec(rng, 6, 20, dtype)
    c, s = 0.8, 0.6
    xn, yn = roti(x, indx, y, c, s)
    want_x = c * x + s * y[indx]
    want_y = y.copy()
    want_y[indx] = c * y[indx] - s * x
    assert_allclose_spec(xn, want_x, dtype=dtype, scale=10)
    assert_allclose_spec(yn, want_y, dtype=dtype, scale=10)


def test_roti_complex_rejected(rng):
    x, indx, y = _sparse_vec(rng, 3, 10, np.complex128)
    with pytest.raises(AoclSparseError) as e:
        roti(x, indx, y, 1.0, 0.0)
    assert e.value.status == Status.wrong_type


@pytest.mark.parametrize("dtype", DTYPES)
def test_sctr(rng, dtype):
    x, indx, y = _sparse_vec(rng, 5, 15, dtype)
    got = sctr(x, indx, y)
    want = y.copy()
    want[indx] = x
    assert_allclose_spec(got, want, dtype=dtype)


def test_null_and_mismatch():
    with pytest.raises(AoclSparseError) as e:
        axpyi(1.0, None, None, np.ones(3))
    assert e.value.status == Status.invalid_pointer
    with pytest.raises(AoclSparseError) as e:
        doti(np.ones(3), np.zeros(2, np.int32), np.ones(5))
    assert e.value.status == Status.invalid_size
    with pytest.raises(AoclSparseError) as e:
        sctr(np.ones(3), np.zeros(3, np.int32), None)
    assert e.value.status == Status.invalid_pointer
