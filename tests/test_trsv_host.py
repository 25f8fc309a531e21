"""Host sequential TRSV engine: KID 2 + autotune pin routing
(native.trsv_seq, planner/triangular.py TrsvHostForm).

The engine answers the dispatch-latency weakness for tiny solves: the whole
substitution runs on the host (native C++; row-loop numpy fallback), the
same policy as the host mv engine (KID 11). Reference role analog: the
scalar substitution kernel (level2/aoclsparse_trsv_kr.hpp) — the
reference's TRSV is host-sequential by construction."""

import jax
import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    AoclSparseError,
    DiagType,
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    Status,
)
from aoclsparse_tpu.native import _trsv_seq_numpy, trsv_seq
from aoclsparse_tpu.ops.level2.trsv import HOST_TRSV_KID
from aoclsparse_tpu.planner.plan import get_plan
from aoclsparse_tpu.utils.reference import ref_trsv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr


def _mk(rng, m, dtype, **kw):
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=dtype, **kw)
    return ast.create_csr(m, m, ptr, ind, val), (ptr, ind, val, dense)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64, np.complex128])
@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
@pytest.mark.parametrize("diag", [DiagType.non_unit, DiagType.unit])
@pytest.mark.parametrize(
    "op", [Operation.none, Operation.transpose, Operation.conjugate_transpose]
)
def test_host_trsv_cases(rng, dtype, fill, diag, op):
    m = 33
    A, (ptr, ind, val, dense) = _mk(rng, m, dtype, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=diag)
    b = rng.standard_normal(m).astype(dtype)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        b = b + 1j * rng.standard_normal(m).astype(dtype)
    got = ast.trsv(1.4, A, descr, op, b, kid=HOST_TRSV_KID)
    assert isinstance(got, np.ndarray)  # nothing touches the device
    want = ref_trsv(1.4, m, ptr, ind, val, descr, op, b)
    assert_allclose_spec(got, want, dtype=dtype, scale=30)
    # parity with the default device engine on the same operand
    dev = ast.trsv(1.4, A, descr, op, b)
    assert_allclose_spec(got, np.asarray(dev), dtype=dtype, scale=60)


def test_host_trsv_numpy_fallback_parity(rng):
    m = 29
    _, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    tril = np.tril(dense)
    tptr, tind, tval = _triangle_csr(tril)
    b = rng.standard_normal(m)
    xn = _trsv_seq_numpy(m, tptr, tind, tval, b, True)
    xc = trsv_seq(m, tptr, tind, tval, b, True)
    np.testing.assert_allclose(xn, np.linalg.solve(tril, b), rtol=1e-10)
    np.testing.assert_allclose(xc, xn, rtol=1e-12)
    # upper sweep direction
    triu = np.triu(dense)
    uptr, uind, uval = _triangle_csr(triu)
    np.testing.assert_allclose(
        trsv_seq(m, uptr, uind, uval, b, False), np.linalg.solve(triu, b), rtol=1e-10
    )
    np.testing.assert_allclose(
        _trsv_seq_numpy(m, uptr, uind, uval, b, False),
        np.linalg.solve(triu, b),
        rtol=1e-10,
    )


def _triangle_csr(T):
    m = T.shape[0]
    mask = T != 0
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))]).astype(np.int64)
    return ptr, np.nonzero(mask)[1].astype(np.int64), T[mask]


def test_host_trsv_traced_kid_raises(rng):
    A, _ = _mk(rng, 8, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)

    def f(b):
        return ast.trsv(1.0, A, descr, Operation.none, b, kid=HOST_TRSV_KID)

    with pytest.raises(AoclSparseError) as e:
        jax.jit(f)(np.ones(8))
    assert e.value.status == Status.not_implemented


def test_host_trsv_pin_routes_and_falls_back(rng):
    m = 16
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = np.linspace(1.0, 2.0, m)
    ast.optimize(A)
    plan = get_plan(A)
    plan._trsv_engine = {
        (descr.fill_mode, descr.diag_type, Operation.none): "host"
    }
    got = ast.trsv(1.0, A, descr, Operation.none, b)
    assert isinstance(got, np.ndarray)  # pin routed to the host engine
    want = ref_trsv(1.0, m, ptr, ind, val, descr, Operation.none, b)
    assert_allclose_spec(got, want, dtype=np.float64, scale=30)
    # a traced caller must silently fall back to the device form
    x = jax.jit(lambda bb: ast.trsv(1.0, A, descr, Operation.none, bb))(b)
    assert_allclose_spec(np.asarray(x), want, dtype=np.float64, scale=30)


def test_host_trsv_update_values_refresh(rng):
    m = 12
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = rng.standard_normal(m)
    x0 = ast.trsv(1.0, A, descr, Operation.none, b, kid=HOST_TRSV_KID)
    new_val = val * 2.0
    ast.update_values(A, new_val)
    x1 = ast.trsv(1.0, A, descr, Operation.none, b, kid=HOST_TRSV_KID)
    want = ref_trsv(1.0, m, ptr, ind, new_val, descr, Operation.none, b)
    assert_allclose_spec(x1, want, dtype=np.float64, scale=30)
    assert not np.allclose(x0, x1)


def test_host_trsv_strided_kid(rng):
    m = 10
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = rng.standard_normal(2 * m)
    x = ast.trsv_strided(1.0, A, descr, Operation.none, b, 2, 3, kid=HOST_TRSV_KID)
    want = ref_trsv(1.0, m, ptr, ind, val, descr, Operation.none, b[::2])
    assert_allclose_spec(np.asarray(x)[:: 3], want, dtype=np.float64, scale=30)


def test_host_trsv_general_descr_still_rejected(rng):
    A, _ = _mk(rng, 6, np.float64, ensure_diag=True)
    with pytest.raises(AoclSparseError) as e:
        ast.trsv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(6), kid=HOST_TRSV_KID)
    assert e.value.status == Status.invalid_value


def test_autotune_trsv_times_host_engine(rng):
    from aoclsparse_tpu.kernels.autotune import autotune_trsv

    A, _ = _mk(rng, 24, np.float64, ensure_diag=True)
    res = autotune_trsv(A, iters=2, chunks=1)
    assert "host" in res  # the host candidate was measured


def test_host_pin_traced_alpha_falls_back(rng):
    # a host pin must not crash a jitted caller that traces only alpha
    m = 14
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = np.linspace(1.0, 2.0, m)
    from aoclsparse_tpu import optimize

    optimize(A)
    get_plan(A)._trsv_engine = {
        (descr.fill_mode, descr.diag_type, Operation.none): "host"
    }
    x = jax.jit(lambda a: ast.trsv(a, A, descr, Operation.none, b))(1.5)
    want = ref_trsv(1.5, m, ptr, ind, val, descr, Operation.none, b)
    assert_allclose_spec(np.asarray(x), want, dtype=np.float64, scale=30)
    # explicit kid=2 with a traced alpha raises (cannot run host on tracers)
    with pytest.raises(AoclSparseError) as e:
        jax.jit(lambda a: ast.trsv(a, A, descr, Operation.none, b, kid=2))(1.5)
    assert e.value.status == Status.not_implemented


def test_trsm_host_kid(rng):
    # trsm KID 2: the multi-RHS host engine (columns threaded in C++)
    m = 18
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    B = rng.standard_normal((m, 5))
    X = ast.trsm(1.3, A, descr, Operation.none, B, kid=2)
    assert isinstance(X, np.ndarray)  # nothing touches the device
    L = np.tril(dense)
    np.testing.assert_allclose(X, np.linalg.solve(L, 1.3 * B), rtol=1e-9)
    # device parity + column order + transpose op
    Xd = ast.trsm(1.3, A, descr, Operation.none, B)
    np.testing.assert_allclose(X, np.asarray(Xd), rtol=1e-9)
    from aoclsparse_tpu import Order

    Xc = ast.trsm(1.0, A, descr, Operation.transpose, B.T, order=Order.column, kid=2)
    np.testing.assert_allclose(np.asarray(Xc).T, np.linalg.solve(L.T, B), rtol=1e-9)
    # the host engine never runs under a trace: explicit kid raises
    with pytest.raises(AoclSparseError) as e:
        jax.jit(lambda bb: ast.trsm(1.0, A, descr, Operation.none, bb, kid=2))(B)
    assert e.value.status == Status.not_implemented
    # a trsv host pin must NOT hijack trsm (single-RHS measurement only)
    from aoclsparse_tpu import optimize

    optimize(A)
    get_plan(A)._trsv_engine = {
        (descr.fill_mode, descr.diag_type, Operation.none): "host"
    }
    Xp = ast.trsm(1.0, A, descr, Operation.none, B)
    assert not isinstance(Xp, np.ndarray)  # stayed on the device form


def test_trsm_seq_threaded_matches_single(rng):
    from aoclsparse_tpu.native import trsm_seq

    m, k = 40, 9  # k >= 4 triggers the threaded column split
    _, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    L = np.tril(dense)
    mask = L != 0
    tptr = np.concatenate([[0], np.cumsum(mask.sum(1))]).astype(np.int64)
    tind = np.nonzero(mask)[1].astype(np.int64)
    B = rng.standard_normal((m, k))
    X = trsm_seq(m, tptr, tind, L[mask], B, True)
    np.testing.assert_allclose(X, np.linalg.solve(L, B), rtol=1e-9)


def test_host_refresh_is_lazy_and_numpy_update_free(rng):
    # CleanCSR keeps a host value twin after a numpy update_values, so the
    # host engine rebuild does not touch the device at all
    m = 12
    A, (ptr, ind, val, dense) = _mk(rng, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = rng.standard_normal(m)
    ast.trsv(1.0, A, descr, Operation.none, b, kid=2)
    new_val = np.asarray(val) * 0.5
    ast.update_values(A, new_val)
    assert get_plan(A).clean.val_host is not None  # numpy update filled it
    x = ast.trsv(1.0, A, descr, Operation.none, b, kid=2)
    want = ref_trsv(1.0, m, ptr, ind, new_val, descr, Operation.none, b)
    assert_allclose_spec(x, want, dtype=np.float64, scale=30)
