"""Regression tests for the round-1 advisor findings (ADVICE.md):

- GMRES happy breakdown mid-cycle (identity / fast-converging systems) must
  return the solution, not crash on a singular Hessenberg column.
- GMRES with b = 0 (or an exact initial guess) must converge to the current
  x instead of dividing by beta = 0 and filling the basis with NaN.
- mv/mm/trsv/trsm must reject operand dtypes the matrix dtype cannot
  represent (wrong_type), instead of silently narrowing.
- syrkd must leave the caller's strict lower triangle unmodified
  (reference beta loops only touch j >= i, aoclsparse_syrkd.hpp).
- bsr_to_csr keeps explicitly stored in-band zeros (pattern stability).
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation, Status
from aoclsparse_tpu.core.types import FillMode, MatrixType
from aoclsparse_tpu.solvers import RINFO_ITER, RINFO_RES_NORM

GEN = MatrixDescriptor()


def _identity_csr(m, dtype=np.float64):
    ptr = np.arange(m + 1, dtype=np.int32)
    ind = np.arange(m, dtype=np.int32)
    val = np.ones(m, dtype=dtype)
    return ast.create_csr(m, m, ptr, ind, val)


def test_gmres_happy_breakdown_identity():
    # identity converges in 1 Arnoldi step << restart: the happy-breakdown
    # path must produce a complete triangular H column and solve
    m = 12
    A = _identity_csr(m)
    b = np.arange(1.0, m + 1.0)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), b, atol=1e-10)


def test_gmres_happy_breakdown_fast_converging(rng):
    # rank-structure that converges in ~2 iterations with restart=10
    m = 20
    dense = 5.0 * np.eye(m)
    dense[0, 1] = 1.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    val = dense[dense != 0]
    A = ast.create_csr(m, m, ptr, ind, val)
    b = rng.standard_normal(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    ast.itsol_option_set(h, "gmres restart iterations", 10)
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b)
    assert status == Status.success
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense, b), atol=1e-8)


def test_gmres_zero_rhs_converges():
    m = 8
    A = _identity_csr(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, np.zeros(m))
    assert status == Status.success
    assert not np.any(np.isnan(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_gmres_exact_initial_guess():
    m = 8
    A = _identity_csr(m)
    b = np.ones(m)
    h = ast.itsol_init(np.float64)
    ast.itsol_option_set(h, "iterative method", "GMRES")
    x, rinfo, status = ast.itsol_solve(h, m, A, GEN, b, x0=b.copy())
    assert status == Status.success
    assert not np.any(np.isnan(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x), b, atol=1e-12)


def test_mv_rejects_complex_x_on_real_matrix():
    A = _identity_csr(4, np.float64)
    x = np.ones(4, dtype=np.complex128) + 2j
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, A, GEN, Operation.none, x, 0.0)
    assert e.value.status == Status.wrong_type


def test_mv_rejects_narrowing_float64_x_on_float32_matrix():
    A = _identity_csr(4, np.float32)
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, A, GEN, Operation.none, np.ones(4, dtype=np.float64), 0.0)
    assert e.value.status == Status.wrong_type


def test_mv_upcasts_float32_x_on_float64_matrix():
    A = _identity_csr(4, np.float64)
    y = ast.mv(2.0, A, GEN, Operation.none, np.ones(4, dtype=np.float32), 0.0)
    assert np.asarray(y).dtype == np.float64
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_trsv_trsm_mm_reject_narrowing():
    m = 4
    dense = np.tril(np.ones((m, m))) + np.eye(m)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0].astype(np.float32))
    tri = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    b64 = np.ones(m, dtype=np.float64)
    with pytest.raises(AoclSparseError) as e:
        ast.trsv(1.0, A, tri, Operation.none, b64)
    assert e.value.status == Status.wrong_type
    with pytest.raises(AoclSparseError) as e:
        ast.trsm(1.0, A, tri, Operation.none, np.ones((m, 2), dtype=np.float64))
    assert e.value.status == Status.wrong_type
    with pytest.raises(AoclSparseError) as e:
        ast.mm(1.0, A, GEN, Operation.none, np.ones((m, 2), dtype=np.float64), 0.0)
    assert e.value.status == Status.wrong_type


def test_syrkd_preserves_lower_triangle(rng):
    m, n = 5, 4
    dense = rng.standard_normal((m, n))
    dense[np.abs(dense) < 0.6] = 0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int32)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, n, ptr, ind, dense[dense != 0])
    C0 = rng.standard_normal((m, m))
    alpha, beta = 1.5, 0.5
    out = np.asarray(ast.syrkd(Operation.none, A, alpha, beta, C=C0.copy()))
    expect = C0.copy()
    full = alpha * dense @ dense.T
    iu = np.triu_indices(m)
    expect[iu] = full[iu] + beta * C0[iu]
    np.testing.assert_allclose(out, expect, atol=1e-12)
    # beta = 0 must still leave the strict lower triangle untouched, not zero it
    out0 = np.asarray(ast.syrkd(Operation.none, A, 1.0, 0.0, C=C0.copy()))
    il = np.tril_indices(m, k=-1)
    np.testing.assert_allclose(out0[il], C0[il])


def test_bsr_roundtrip_keeps_stored_zeros():
    from aoclsparse_tpu.convert.conversions import bsr_to_csr, csr_to_bsr
    from aoclsparse_tpu.core.formats import CSR

    # 4x4 with an explicitly stored zero at (0,1)
    ptr = np.array([0, 2, 3, 4, 5], np.int32)
    ind = np.array([0, 1, 1, 2, 3], np.int32)
    val = np.array([1.0, 0.0, 2.0, 3.0, 4.0])
    A = CSR(ptr, ind, val, shape=(4, 4))
    B = csr_to_bsr(A, 2)
    A2 = bsr_to_csr(B)
    # every entry of the original pattern must still be present (block
    # in-band zeros included), with identical values at original slots
    d0 = np.zeros((4, 4))
    d0[np.repeat(np.arange(4), np.diff(ptr)), ind] = val
    d2 = np.zeros((4, 4))
    p2, i2, v2 = np.asarray(A2.ptr), np.asarray(A2.ind), np.asarray(A2.val)
    d2[np.repeat(np.arange(4), np.diff(p2)), i2] = v2
    np.testing.assert_allclose(d2, d0)
    # the stored-zero slot (0,1) must exist in the pattern
    row0 = i2[p2[0] : p2[1]]
    assert 1 in row0


# ---- round-4 advisor findings ----


def _tridiag_csr(m, dtype=np.float64):
    rows, cols, vals = [], [], []
    for i in range(m):
        if i > 0:
            rows.append(i), cols.append(i - 1), vals.append(-1.0)
        rows.append(i), cols.append(i), vals.append(4.0)
        if i < m - 1:
            rows.append(i), cols.append(i + 1), vals.append(-1.0)
    rows = np.asarray(rows)
    ptr = np.concatenate([[0], np.cumsum(np.bincount(rows, minlength=m))]).astype(np.int32)
    return ast.create_csr(m, m, ptr, np.asarray(cols, np.int32), np.asarray(vals, dtype))


def test_ilu_smoother_deep_dag_host_path_matrix_rhs(rng):
    # tridiagonal factor: chain DAG of depth m in both triangles, so
    # nlev(L)+nlev(U) = 2m > 8192 routes eager callers to the sequential
    # host substitution. ADVICE r4: a 2-D b through that path returned a
    # wrong-shaped result (native trsv_seq is single-vector).
    m = 5000
    A = _tridiag_csr(m)
    from aoclsparse_tpu.solvers import ilu as ilu_mod

    st = ilu_mod.ilu0_factorize(A)
    st.l_form = st.u_form = None  # simulate blocked-window refusal
    assert ilu_mod._ilu_level_stats(st) > 8192
    B = rng.standard_normal((m, 3))
    X = np.asarray(ast.ilu_smoother(A, b=B))
    assert X.shape == (m, 3)
    for j in range(3):
        xj = np.asarray(ast.ilu_smoother(A, b=B[:, j].copy()))
        np.testing.assert_allclose(X[:, j], xj, rtol=1e-12, atol=1e-12)
    # stats-first routing must not have built the level forms on this path
    assert st.l_level is None and st.u_level is None


def test_mm_token_stream_parse_fallback(monkeypatch):
    # ADVICE r4: np.fromstring text mode is deprecated; the parse must
    # survive its removal through the supported fallback.
    from aoclsparse_tpu.io.mm import _parse_token_stream

    text = "1 2 3.5\n4 5 -6.25\n"
    expect = np.array([1, 2, 3.5, 4, 5, -6.25])
    np.testing.assert_allclose(_parse_token_stream(text), expect)

    def _removed(*a, **k):
        raise AttributeError("np.fromstring was removed")

    monkeypatch.setattr(np, "fromstring", _removed, raising=False)
    np.testing.assert_allclose(_parse_token_stream(text), expect)
