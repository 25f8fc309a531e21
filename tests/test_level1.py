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


def test_level1_kid_override_and_invalid(rng):
    """_kid-variant parity (aoclsparse_?axpyi_kid, ?doti_kid, ?gthr_kid,
    ?roti_kid, ?sctr_kid, …): kid=0 names each op's registered row and must
    produce the same result as the auto path; an unknown kid raises
    invalid_kid like the reference KAT validation."""
    import aoclsparse_tpu as ast

    x, indx, y = _sparse_vec(rng, 5, 16, np.float64)
    np.testing.assert_allclose(ast.axpyi(2.0, x, indx, y, kid=0), ast.axpyi(2.0, x, indx, y))
    np.testing.assert_allclose(ast.doti(x, indx, y, kid=0), ast.doti(x, indx, y))
    np.testing.assert_allclose(ast.gthr(y, indx, kid=0), ast.gthr(y, indx))
    g0, z0 = ast.gthrz(y, indx, kid=0)
    g1, z1 = ast.gthrz(y, indx)
    np.testing.assert_allclose(g0, g1)
    np.testing.assert_allclose(z0, z1)
    np.testing.assert_allclose(ast.gthrs(y, 2, kid=0), ast.gthrs(y, 2))
    xr, yr = ast.roti(x, indx, y, 0.8, 0.6, kid=0)
    xw, yw = ast.roti(x, indx, y, 0.8, 0.6)
    np.testing.assert_allclose(xr, xw)
    np.testing.assert_allclose(yr, yw)
    np.testing.assert_allclose(ast.sctr(x, indx, y, kid=0), ast.sctr(x, indx, y))
    np.testing.assert_allclose(ast.sctrs(x, 3, np.zeros(32), kid=0), ast.sctrs(x, 3, np.zeros(32)))
    xc = x.astype(np.complex128) + 1j
    np.testing.assert_allclose(ast.dotci(xc, indx, y.astype(np.complex128), kid=0),
                               ast.dotci(xc, indx, y.astype(np.complex128)))
    np.testing.assert_allclose(ast.dotui(xc, indx, y.astype(np.complex128), kid=0),
                               ast.dotui(xc, indx, y.astype(np.complex128)))
    for fn, args in [
        (ast.axpyi, (2.0, x, indx, y)),
        (ast.doti, (x, indx, y)),
        (ast.gthr, (y, indx)),
        (ast.gthrz, (y, indx)),
        (ast.gthrs, (y, 2)),
        (ast.roti, (x, indx, y, 0.8, 0.6)),
        (ast.sctr, (x, indx, y)),
        (ast.sctrs, (x, 3, np.zeros(32))),
    ]:
        with pytest.raises(AoclSparseError) as e:
            fn(*args, kid=99)
        assert e.value.status == Status.invalid_kid


@pytest.mark.parametrize(
    "op",
    ["axpyi", "doti", "dotci", "dotui", "gthr", "gthrz", "sctr", "roti"],
)
@pytest.mark.parametrize("bad", [-1, 99])
def test_level1_invalid_index(rng, op, bad):
    """Out-of-range compressed indices surface invalid_index_value on every
    level-1 op (reference *_tests.cpp InvalidIndx cases; an XLA gather would
    silently clamp instead)."""
    import aoclsparse_tpu.ops.level1 as l1

    n = 8
    dt = np.complex128 if op in ("dotci", "dotui") else np.float64
    x = rng.standard_normal(3).astype(dt)
    y = rng.standard_normal(n).astype(dt)
    indx = np.array([0, bad, 2], np.int32)
    fn = getattr(l1, op)
    with pytest.raises(ast.AoclSparseError) as ei:
        if op == "axpyi":
            fn(2.0, x, indx, y)
        elif op in ("doti", "dotci", "dotui"):
            fn(x, indx, y)
        elif op in ("gthr", "gthrz"):
            fn(y, indx)
        elif op == "sctr":
            fn(x, indx, y)
        else:  # roti
            fn(x, indx, y, 0.8, 0.6)
    assert ei.value.status == ast.Status.invalid_index_value
