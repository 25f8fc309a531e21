"""Round-4 feature regressions: band-first pattern-only SpGEMM plans,
oversized-window solve fallbacks, wide-diag unrolled kernel, level runs."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import (
    DiagType,
    FillMode,
    MatrixDescriptor,
    MatrixType,
    Operation,
    Request,
)

GEN = MatrixDescriptor()


def _banded(rng, m, half, k):
    rows = np.repeat(np.arange(m, dtype=np.int64), k)
    cols = np.clip(rows + rng.integers(-half, half + 1, rows.size), 0, m - 1)
    d = np.arange(m, dtype=np.int64)
    rows = np.concatenate([rows, d])
    cols = np.concatenate([cols, d])
    o = np.lexsort((cols, rows))
    rows, cols = rows[o], cols[o]
    keep = np.concatenate([[True], (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])])
    rows, cols = rows[keep], cols[keep]
    val = rng.standard_normal(rows.size).astype(np.float32)
    val[rows == cols] = 4.0
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, rows + 1, 1)
    return np.cumsum(ptr), cols.astype(np.int32), val


def test_pattern_only_band_first_plan(monkeypatch):
    monkeypatch.setenv("AOCLSPARSE_TPU_FORCE_BANDGEMM", "1")
    rng = np.random.default_rng(3)
    m = 1024
    ptr, ind, val = _banded(rng, m, 12, 6)
    A = ast.create_csr(m, m, ptr, ind, val)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, A)
    pl = C._spgemm_plan
    assert pl.band is not None
    assert pl.pa is None and pl.P  # pattern-only symbolic, product count kept
    # oracle: dense product
    rows = np.repeat(np.arange(m), np.diff(ptr))
    D = np.zeros((m, m))
    D[rows, ind] = val
    CC = D @ D
    _, _, _, Cp, Ci, Cv = ast.export_csr(C)
    Dg = np.zeros((m, m))
    Dg[np.repeat(np.arange(m), np.diff(np.asarray(Cp))), np.asarray(Ci)] = np.asarray(Cv)
    assert np.abs(Dg - CC).max() / np.abs(CC).max() < 1e-5
    # finalize on the cached pattern-only plan after update_values
    ast.update_values(A, (val * 2).astype(np.float32))
    C2 = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, A,
                  request=Request.finalize, C=C)
    _, _, _, _, _, Cv2 = ast.export_csr(C2)
    assert np.allclose(np.asarray(Cv2), 4 * np.asarray(Cv), rtol=1e-5)
    # host engine backfills the expansion lazily on the same plan
    monkeypatch.setenv("AOCLSPARSE_TPU_SPGEMM_HOST", "1")
    C3 = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, A,
                  request=Request.finalize, C=C2)
    _, _, _, _, _, Cv3 = ast.export_csr(C3)
    # engines differ only in accumulation order; absolute tolerance scaled
    # to the product magnitude (near-zero cancellation entries)
    scale = float(np.abs(np.asarray(Cv2)).max())
    assert np.allclose(np.asarray(Cv3), np.asarray(Cv2), rtol=1e-5, atol=1e-5 * scale)


def _wide_triangle(rng, m=1500):
    r = np.concatenate([np.arange(m), np.arange(1, m), rng.integers(100, m, 200)])
    c = np.concatenate([np.arange(m), np.arange(m - 1), rng.integers(0, 99, 200)])
    keep = c <= r
    r, c = r[keep], c[keep]
    o = np.lexsort((c, r))
    r, c = r[o], c[o]
    k = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
    r, c = r[k], c[k]
    v = rng.standard_normal(r.size).astype(np.float32)
    v[r == c] = 5.0
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, r + 1, 1)
    return np.cumsum(ptr), c.astype(np.int32), v, r, c


def test_trsv_window_cap_fallback(monkeypatch):
    monkeypatch.setenv("AOCLSPARSE_TPU_TRSV_WIN_CAP", "1e4")
    rng = np.random.default_rng(5)
    ptr, ind, val, r, c = _wide_triangle(rng)
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    b = rng.standard_normal(m).astype(np.float32)
    x = np.asarray(ast.trsv(1.0, A, descr, Operation.none, b))
    D = np.zeros((m, m))
    D[r, c] = val
    want = np.linalg.solve(np.tril(D), b)
    assert np.abs(x - want).max() < 1e-3
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.trsv(1.0, A, descr, Operation.none, b, kid=0)
    assert ei.value.status == ast.Status.memory_error


def test_trsm_window_cap_fallback_shallow_level(monkeypatch):
    # VERDICT r4 item 9: multi-RHS solves share trsv's stats-first
    # fallback — a refused blocked window routes a SHALLOW DAG to the
    # level engine with the matrix rhs intact (no memory_error detour).
    monkeypatch.setenv("AOCLSPARSE_TPU_TRSV_WIN_CAP", "1e4")
    rng = np.random.default_rng(8)
    ptr, ind, val, r, c = _wide_triangle(rng)
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    B = rng.standard_normal((m, 3)).astype(np.float32)
    X = np.asarray(ast.trsm(1.0, A, descr, Operation.none, B))
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    S = sp.csr_matrix((val.astype(np.float64), (r, c)), shape=(m, m))
    want = spla.spsolve_triangular(S.tocsr(), B.astype(np.float64), lower=True)
    assert np.abs(X - want).max() < 1e-3
    with pytest.raises(ast.AoclSparseError) as ei:
        ast.trsm(1.0, A, descr, Operation.none, B, kid=0)
    assert ei.value.status == ast.Status.memory_error


def test_trsm_window_cap_fallback_deep_dag_host(monkeypatch):
    # ...and a DEEP DAG (nlev > 4096: the level form's run arrays would
    # be doomed) routes eager multi-RHS callers to the host engine's
    # solve_mat — stats are read before any level form is built.
    monkeypatch.setenv("AOCLSPARSE_TPU_TRSV_WIN_CAP", "1e4")
    rng = np.random.default_rng(9)
    ptr, ind, val, r, c = _wide_triangle(rng, m=6000)
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_level_stats_for

    nlev, _ = trsv_level_stats_for(get_plan(A), descr, Operation.none)
    assert nlev > 4096
    B = rng.standard_normal((m, 3)).astype(np.float32)
    X = np.asarray(ast.trsm(1.0, A, descr, Operation.none, B))
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    S = sp.csr_matrix((val.astype(np.float64), (r, c)), shape=(m, m))
    want = spla.spsolve_triangular(S.tocsr(), B.astype(np.float64), lower=True)
    assert np.abs(X - want).max() < 1e-2


def test_ilu0_window_cap_level_fallback(monkeypatch):
    monkeypatch.setenv("AOCLSPARSE_TPU_TRSV_WIN_CAP", "1e4")
    rng = np.random.default_rng(6)
    ptr, ind, val, r, c = _wide_triangle(rng)
    m = ptr.size - 1
    A = ast.create_csr(m, m, ptr, ind, val)
    st = ast.ilu0_factorize(A)
    assert st.l_form is None  # blocked windows refused -> level sweeps
    b = rng.standard_normal(m).astype(np.float32)
    z = np.asarray(ast.ilu_smoother(A, b=b))
    lu = np.asarray(st.lu)
    cl = st.lu_clean
    rows = np.repeat(np.arange(m), np.diff(np.asarray(cl.ptr)))
    D = np.zeros((m, m))
    D[rows, np.asarray(cl.ind)] = lu
    L = np.tril(D, -1) + np.eye(m)
    U = np.triu(D)
    want = np.linalg.solve(U, np.linalg.solve(L, b))
    assert np.abs(z - want).max() < 1e-3


def test_diag_unrolled_many_diagonals():
    from aoclsparse_tpu.kernels.xla.spmv import _spmv_diag_unrolled

    rng = np.random.default_rng(7)
    m = 512
    offs = tuple(sorted(rng.choice(np.arange(-60, 61), 110, replace=False).tolist()))
    L = 64
    n_pad = m + 128
    dvals = rng.standard_normal((len(offs), m)).astype(np.float32)
    x = rng.standard_normal(m).astype(np.float32)
    got = np.asarray(
        _spmv_diag_unrolled(jnp.asarray(dvals), jnp.asarray(x), offs, m, L, n_pad)
    )
    xp = np.pad(x, (L, n_pad - L - m))
    want = np.zeros(m, dtype=np.float64)
    for k, d in enumerate(offs):
        want += dvals[k].astype(np.float64) * xp[d + L : d + L + m]
    assert np.abs(got - want).max() / max(1.0, np.abs(want).max()) < 1e-5


def test_level_runs_cover_and_tighten():
    from aoclsparse_tpu.kernels.xla.trsv_level import _level_runs

    counts = np.array([50000, 3000, 800, 200, 60, 20, 8, 4, 2, 1, 1, 1])
    wlev = np.array([2, 4, 6, 8, 8, 8, 4, 4, 2, 1, 1, 1])
    runs = _level_runs(counts, wlev)
    # contiguity + full coverage
    assert runs[0][0] == 0 and runs[-1][1] == counts.size
    for (a, b, _, _), (a2, _, _, _) in zip(runs, runs[1:]):
        assert b == a2
    # every level fits its run's shapes
    for lo, hi, R, W in runs:
        assert counts[lo:hi].max() <= R
        assert wlev[lo:hi].max() <= max(W, 1)
    padded = sum((hi - lo) * R * (W + 1) for lo, hi, R, W in runs)
    old = counts.size * counts.max() * (wlev.max() + 1)
    assert padded < old / 5  # the skewed case the bucketing exists for


def test_level_form_global_materialization_parity():
    """The on-demand global padded layout (dist twin) must agree with the
    per-run arrays the solve path uses."""
    from aoclsparse_tpu.kernels.xla.trsv_level import (
        _solve_levels_jit,
        build_level_form,
    )

    rng = np.random.default_rng(9)
    m = 600
    r = np.repeat(np.arange(m), 3)
    c = (r - rng.integers(1, 30, r.size)).clip(0)
    keep = c < r
    r2 = np.concatenate([r[keep], np.arange(m)])
    c2 = np.concatenate([c[keep], np.arange(m)])
    o = np.lexsort((c2, r2))
    r2, c2 = r2[o], c2[o]
    k = np.concatenate([[True], (r2[1:] != r2[:-1]) | (c2[1:] != c2[:-1])])
    r2, c2 = r2[k], c2[k]
    v = rng.standard_normal(r2.size).astype(np.float32)
    v[r2 == c2] = 3.0
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, r2 + 1, 1)
    ptr = np.cumsum(ptr)
    form = build_level_form(
        ptr, c2.astype(np.int64), np.arange(c2.size, dtype=np.int64),
        m, False, False, jnp.asarray(v),
    )
    b = rng.standard_normal(m).astype(np.float32)
    x_runs = np.asarray(form.solve(b))
    rows_g, rv_g, cols_g, cv_g = form.global_arrays()
    Lval_g, Dinv_g = form.full_vals()
    x_glob = np.asarray(
        _solve_levels_jit(
            jnp.asarray(rows_g), jnp.asarray(rv_g), jnp.asarray(cols_g),
            jnp.asarray(cv_g), Lval_g, Dinv_g, jnp.asarray(b)[:, None], m,
        )
    )[:, 0]
    assert np.abs(x_runs - x_glob).max() < 1e-5
    D = np.zeros((m, m))
    D[r2, c2] = v
    want = np.linalg.solve(np.tril(D), b)
    assert np.abs(x_runs - want).max() < 1e-3
