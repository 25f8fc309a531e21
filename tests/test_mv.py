"""SpMV tests: the csrmv/ellmv/bsrmv/diamv/dotmv test-matrix of the reference
(tests/unit_tests/csrmv_tests.cpp, mv_tests.cpp, dotmv_tests.cpp): wrong
sizes, all dtypes, descriptor semantics (general/symmetric/hermitian/
triangular x fill x diag x op), format fast paths, hint/optimize interplay,
kid override, value refresh after update_values."""

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
from aoclsparse_tpu.utils.reference import ref_mv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _mk(rng, m, n, dtype, **kw):
    ptr, ind, val, dense = random_csr(rng, m, n, dtype=dtype, **kw)
    return ast.create_csr(m, n, ptr, ind, val), (ptr, ind, val)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose, Operation.conjugate_transpose])
def test_mv_general(rng, dtype, op):
    m, n = 23, 17
    A, (ptr, ind, val) = _mk(rng, m, n, dtype)
    descr = MatrixDescriptor()
    nx, ny = (n, m) if op == Operation.none else (m, n)
    x = rng.standard_normal(nx).astype(dtype)
    y = rng.standard_normal(ny).astype(dtype)
    alpha, beta = 1.7, -0.3
    got = ast.mv(alpha, A, descr, op, x, beta, y)
    want = ref_mv(alpha, m, n, ptr, ind, val, descr, op, x, beta, y)
    assert_allclose_spec(got, want, dtype=dtype, scale=10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("fill", [FillMode.lower, FillMode.upper])
@pytest.mark.parametrize(
    "mtype", [MatrixType.symmetric, MatrixType.hermitian, MatrixType.triangular]
)
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose, Operation.conjugate_transpose])
def test_mv_descr_semantics(rng, dtype, fill, mtype, op):
    m = 19
    A, (ptr, ind, val) = _mk(rng, m, m, dtype, ensure_diag=True)
    descr = MatrixDescriptor(type=mtype, fill_mode=fill)
    x = rng.standard_normal(m).astype(dtype)
    y = rng.standard_normal(m).astype(dtype)
    got = ast.mv(0.9, A, descr, op, x, 1.1, y)
    want = ref_mv(0.9, m, m, ptr, ind, val, descr, op, x, 1.1, y)
    assert_allclose_spec(got, want, dtype=dtype, scale=10)


@pytest.mark.parametrize("diag", [DiagType.non_unit, DiagType.unit, DiagType.zero])
def test_mv_triangular_diag_types(rng, diag):
    m = 15
    A, (ptr, ind, val) = _mk(rng, m, m, np.float64, ensure_diag=True)
    descr = MatrixDescriptor(type=MatrixType.triangular, diag_type=diag)
    x = rng.standard_normal(m)
    got = ast.mv(1.0, A, descr, Operation.none, x, 0.0)
    want = ref_mv(1.0, m, m, ptr, ind, val, descr, Operation.none, x, 0.0, np.zeros(m))
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)


def test_mv_wrong_sizes(rng):
    A, _ = _mk(rng, 5, 7, np.float64)
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(5), 0.0)
    assert e.value.status == Status.invalid_size
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(7), 1.0, np.ones(9))
    assert e.value.status == Status.invalid_size
    # non-square symmetric rejected
    with pytest.raises(AoclSparseError):
        ast.mv(
            1.0,
            A,
            MatrixDescriptor(type=MatrixType.symmetric),
            Operation.none,
            np.ones(7),
            0.0,
        )


def test_mv_null_args(rng):
    A, _ = _mk(rng, 4, 4, np.float64)
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, None, MatrixDescriptor(), Operation.none, np.ones(4), 0.0)
    assert e.value.status == Status.invalid_pointer
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, A, MatrixDescriptor(), Operation.none, None, 0.0)
    assert e.value.status == Status.invalid_pointer


def test_mv_alpha_zero_quick_exit(rng):
    m = 9
    A, _ = _mk(rng, m, m, np.float64)
    y = rng.standard_normal(m)
    got = ast.mv(0.0, A, MatrixDescriptor(), Operation.none, np.ones(m), 2.0, y)
    assert_allclose_spec(got, 2.0 * y, dtype=np.float64)


def test_mv_hint_optimize_paths(rng):
    m, n = 40, 40
    A, (ptr, ind, val) = _mk(rng, m, n, np.float64, density=0.1)
    descr = MatrixDescriptor()
    ast.set_mv_hint(A, Operation.none, descr, nop=100)
    ast.set_mv_hint(A, Operation.transpose, descr, nop=10)
    ast.optimize(A)
    assert A.plan is not None
    x = rng.standard_normal(n)
    got = ast.mv(1.0, A, descr, Operation.transpose, x, 0.0)
    want = ref_mv(1.0, m, n, ptr, ind, val, descr, Operation.transpose, x, 0.0, np.zeros(n))
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)


@pytest.mark.parametrize("kid,ok", [(0, True), (99, False)])
def test_mv_kid_override(rng, kid, ok):
    m = 12
    A, (ptr, ind, val) = _mk(rng, m, m, np.float64)
    x = np.ones(m)
    # force segsum exec form so kid 0 is compatible
    from aoclsparse_tpu.planner.plan import get_plan

    get_plan(A).exec_form_for(MatrixDescriptor(), Operation.none, kind="segsum")
    if ok:
        got = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0, kid=kid)
        want = ref_mv(
            1.0, m, m, ptr, ind, val, MatrixDescriptor(), Operation.none, x, 0.0, np.zeros(m)
        )
        assert_allclose_spec(got, want, dtype=np.float64, scale=10)
    else:
        with pytest.raises(AoclSparseError) as e:
            ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0, kid=kid)
        assert e.value.status == Status.invalid_kid


def test_mv_formats_ell_dia_bsr(rng):
    m = 16
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.2, dtype=np.float64)
    x = rng.standard_normal(m)
    want = dense @ x

    from aoclsparse_tpu.convert import conversions as cv
    from aoclsparse_tpu.core.formats import CSR

    A_csr = CSR(ptr, ind, val, shape=(m, m))
    # ELL input
    E = cv.csr_to_ell(A_csr)
    hE = ast.SparseMatrix(E, ast.FormatType.ell)
    got = ast.mv(1.0, hE, MatrixDescriptor(), Operation.none, x, 0.0)
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)
    # DIA input
    D = cv.csr_to_dia(A_csr)
    hD = ast.SparseMatrix(D, ast.FormatType.dia)
    got = ast.mv(1.0, hD, MatrixDescriptor(), Operation.none, x, 0.0)
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)
    # BSR input
    B = cv.csr_to_bsr(A_csr, 4)
    hB = ast.SparseMatrix(B, ast.FormatType.bsr)
    got = ast.mv(1.0, hB, MatrixDescriptor(), Operation.none, x, 0.0)
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)


def test_mv_update_values_refresh(rng):
    m = 14
    A, (ptr, ind, val) = _mk(rng, m, m, np.float64)
    x = rng.standard_normal(m)
    ast.set_mv_hint(A, Operation.none, MatrixDescriptor())
    ast.optimize(A)
    _ = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0)
    newval = rng.standard_normal(val.size)
    ast.update_values(A, newval)
    got = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0)
    want = ref_mv(
        1.0, m, m, ptr, ind, newval, MatrixDescriptor(), Operation.none, x, 0.0, np.zeros(m)
    )
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)


@pytest.mark.parametrize(
    "mtype", [MatrixType.symmetric, MatrixType.hermitian]
)
@pytest.mark.parametrize("op", [Operation.none, Operation.transpose, Operation.conjugate_transpose])
def test_mv_complex_descr_refresh_after_update(rng, mtype, op):
    """Regression: the conjugation pattern (mirror/all/nonmirror) must be
    reapplied identically when update_values refreshes cached copies."""
    m = 13
    A, (ptr, ind, val) = _mk(rng, m, m, np.complex128, ensure_diag=True)
    descr = MatrixDescriptor(type=mtype, fill_mode=FillMode.lower)
    x = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex128)
    _ = ast.mv(1.0, A, descr, op, x, 0.0)  # build + cache the copy
    newval = (rng.standard_normal(len(val)) + 1j * rng.standard_normal(len(val))).astype(
        np.complex128
    )
    ast.update_values(A, newval)
    got = ast.mv(1.0, A, descr, op, x, 0.0)
    want = ref_mv(1.0, m, m, ptr, ind, newval, descr, op, x, 0.0, np.zeros(m, complex))
    assert_allclose_spec(got, want, dtype=np.complex128, scale=10)


def test_dotmv(rng):
    m = 21
    A, (ptr, ind, val) = _mk(rng, m, m, np.float64)
    x = rng.standard_normal(m)
    y0 = rng.standard_normal(m)
    y, d = ast.dotmv(1.3, A, MatrixDescriptor(), Operation.none, x, 0.4, y0)
    want_y = ref_mv(1.3, m, m, ptr, ind, val, MatrixDescriptor(), Operation.none, x, 0.4, y0)
    assert_allclose_spec(y, want_y, dtype=np.float64, scale=10)
    assert abs(float(d) - float(x @ want_y)) < 1e-8 * max(1.0, abs(float(x @ want_y)))


def test_dotmv_complex_conjugates_x(rng):
    m = 11
    A, (ptr, ind, val) = _mk(rng, m, m, np.complex128)
    x = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype(np.complex128)
    y, d = ast.dotmv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0)
    want = np.vdot(x, np.asarray(y))
    assert abs(complex(d) - want) < 1e-8 * max(1.0, abs(want))


def test_debug_dispatcher():
    info = ast.debug_dispatcher("mv", fmt="segsum")
    assert info["name"] == "xla_segsum" and info["kid"] == 0


def test_mv_unsorted_input_handled(rng):
    m = 13
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=np.float64, sorted_ind=False)
    A = ast.create_csr(m, m, ptr, ind, val)
    x = rng.standard_normal(m)
    got = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_mv_restricted_memory_policy(rng):
    m = 18
    A, (ptr, ind, val) = _mk(rng, m, m, np.float64)
    ast.set_memory_hint(A, ast.MemoryPolicy.restricted)
    x = rng.standard_normal(m)
    got = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0)
    want = ref_mv(1.0, m, m, ptr, ind, val, MatrixDescriptor(), Operation.none, x, 0.0, np.zeros(m))
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)
