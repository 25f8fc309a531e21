"""MatrixMarket I/O tests (reference reader: aoclsparse_init.hpp:451-744):
coordinate real/complex/pattern, symmetric/hermitian expansion, round-trip,
gzip, array format."""

import gzip

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu.io import read_mtx, read_mtx_arrays, write_mtx
from aoclsparse_tpu.utils.reference import csr_to_dense


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_coordinate_real(tmp_path):
    p = _write(
        tmp_path,
        "a.mtx",
        "%%MatrixMarket matrix coordinate real general\n"
        "% comment line\n"
        "3 3 4\n"
        "1 1 1.5\n2 2 2.5\n3 1 -1.0\n3 3 4.0\n",
    )
    h = read_mtx(p)
    m, n, nnz, ptr, ind, val = ast.export_csr(h)
    dense = csr_to_dense(m, n, ptr, ind, val)
    want = np.array([[1.5, 0, 0], [0, 2.5, 0], [-1.0, 0, 4.0]])
    np.testing.assert_allclose(dense, want)


def test_coordinate_symmetric_expansion(tmp_path):
    p = _write(
        tmp_path,
        "s.mtx",
        "%%MatrixMarket matrix coordinate real symmetric\n3 3 4\n"
        "1 1 2.0\n2 1 1.0\n3 2 3.0\n3 3 5.0\n",
    )
    h = read_mtx(p)
    m, n, nnz, ptr, ind, val = ast.export_csr(h)
    dense = csr_to_dense(m, n, ptr, ind, val)
    want = np.array([[2, 1, 0], [1, 0, 3], [0, 3, 5.0]])
    np.testing.assert_allclose(dense, want)


def test_coordinate_hermitian(tmp_path):
    p = _write(
        tmp_path,
        "h.mtx",
        "%%MatrixMarket matrix coordinate complex hermitian\n2 2 2\n"
        "1 1 2.0 0.0\n2 1 1.0 -1.0\n",
    )
    m, n, row, col, val = read_mtx_arrays(p)
    dense = np.zeros((2, 2), complex)
    dense[row, col] = val
    want = np.array([[2, 1 + 1j], [1 - 1j, 0]])
    np.testing.assert_allclose(dense, want)


def test_coordinate_pattern(tmp_path):
    p = _write(
        tmp_path,
        "p.mtx",
        "%%MatrixMarket matrix coordinate pattern general\n2 3 2\n1 3\n2 1\n",
    )
    m, n, row, col, val = read_mtx_arrays(p)
    assert (m, n) == (2, 3)
    np.testing.assert_array_equal(val, [1.0, 1.0])


def test_array_format(tmp_path):
    p = _write(
        tmp_path,
        "d.mtx",
        "%%MatrixMarket matrix array real general\n2 2\n1.0\n3.0\n2.0\n4.0\n",
    )
    m, n, row, col, val = read_mtx_arrays(p)
    dense = np.zeros((2, 2))
    dense[row, col] = val
    np.testing.assert_allclose(dense, [[1, 2], [3, 4.0]])


def test_gzip_roundtrip(tmp_path, rng):
    from conftest import random_csr

    ptr, ind, val, dense = random_csr(rng, 6, 5, density=0.4)
    h = ast.create_csr(6, 5, ptr, ind, val)
    p = tmp_path / "rt.mtx"
    write_mtx(p, h)
    h2 = read_mtx(p)
    m, n, nnz, p2, i2, v2 = ast.export_csr(h2)
    np.testing.assert_allclose(csr_to_dense(m, n, p2, i2, v2), dense)
    # gz variant
    gz = tmp_path / "rt.mtx.gz"
    with gzip.open(gz, "wt") as f:
        f.write(p.read_text())
    h3 = read_mtx(gz)
    m, n, nnz, p3, i3, v3 = ast.export_csr(h3)
    np.testing.assert_allclose(csr_to_dense(m, n, p3, i3, v3), dense)


def test_bad_header(tmp_path):
    p = _write(tmp_path, "bad.mtx", "not a matrix\n1 1 1\n")
    with pytest.raises(ast.AoclSparseError):
        read_mtx(p)


def test_plan_snapshot_persists_engine_pins(rng, tmp_path):
    """save_plan/load_plan carry the autotune engine pins (trsv level
    engine, spgemm host engine) alongside the block-size pins."""
    from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType, Operation
    from aoclsparse_tpu.io.plancache import load_plan, save_plan
    from aoclsparse_tpu.planner.plan import get_plan

    m = 64
    full = np.tril(rng.random((m, m)) < 0.08) * rng.standard_normal((m, m))
    np.fill_diagonal(full, 3.0)
    ptr = np.concatenate([[0], np.cumsum((full != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(full)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, full[full != 0])
    key = (FillMode.lower, DiagType.non_unit, Operation.none)
    get_plan(A)._trsv_engine = {key: "level"}
    get_plan(A)._host_engine = True
    p = str(tmp_path / "plan.npz")
    save_plan(A, p)
    B = ast.create_csr(m, m, ptr, ind, full[full != 0])
    load_plan(B, p)
    pb = get_plan(B)
    assert pb._trsv_engine.get(key) == "level"
    assert pb._host_engine is True
    # the restored pin must actually steer dispatch
    D = ast.MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    b = rng.standard_normal(m)
    np.testing.assert_allclose(
        np.asarray(ast.trsv(1.0, B, D, Operation.none, b)),
        np.asarray(ast.trsv(1.0, B, D, Operation.none, b, kid=0)),
        rtol=1e-12,
    )


def test_checked_in_fixture_symmetric_mtx():
    """Checked-in tiny .mtx fixture (the reference ships tiny matrices in
    tests/unit_tests/data/): symmetric storage expands, SpMV matches the
    dense oracle, and CG solves it (SPD pentadiagonal)."""
    from pathlib import Path

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.io import read_mtx
    from aoclsparse_tpu.solvers.fused import pcg_solve

    path = Path(__file__).parent / "data" / "penta14.mtx"
    A = read_mtx(path, dtype=np.float64)
    m, n, nnz, ptr, ind, val = ast.export_csr(A)
    assert m == n == 14 and nnz == 14 + 2 * (13 + 12)  # symmetric pattern expanded
    dense = np.zeros((14, 14))
    dense[np.repeat(np.arange(14), np.diff(np.asarray(ptr))), np.asarray(ind)] = np.asarray(val)
    assert np.allclose(dense, dense.T)
    x = np.arange(1.0, 15.0)
    y = np.asarray(ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0))
    assert np.allclose(y, dense @ x)
    b = np.ones(14)
    xs, it, rn = pcg_solve(A, b, rtol=1e-10, maxit=50)
    assert np.allclose(dense @ np.asarray(xs), b, atol=1e-8)
