"""Host (numpy) mv engine: KID 11 + autotune pin routing (kernels/host.py).

The engine answers the dispatch-latency weakness for tiny operands: a
whole-host mv (validation, kernel, epilogue in numpy) selected explicitly
or by an autotune_mv measurement. Reference role analog: the plain scalar
kernels that win on small inputs (level2/aoclsparse_csrmv_kr.hpp:450)."""

import jax
import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation, Status
from aoclsparse_tpu.core.types import FillMode, MatrixType
from aoclsparse_tpu.kernels.host import HOST_MV_KID, spmv_host_csr
from aoclsparse_tpu.planner.plan import get_plan

GEN = MatrixDescriptor()


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _random_csr(rng, m, n, density=0.05, dtype=np.float64, empty_rows=()):
    dense = (rng.random((m, n)) < density) * rng.standard_normal((m, n))
    for r in empty_rows:
        dense[r, :] = 0.0
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        dense = dense + 1j * (dense != 0) * rng.standard_normal((m, n))
    dense = dense.astype(dtype)
    mask = dense != 0
    ptr = np.concatenate([[0], np.cumsum(mask.sum(1))])
    return ast.create_csr(m, n, ptr, np.nonzero(mask)[1], dense[mask]), dense


def test_host_kernel_empty_rows_reduceat_edges(rng):
    # first/middle/trailing empty rows are the reduceat footguns
    ptr = np.array([0, 0, 2, 2, 3, 3, 3])
    ind = np.array([1, 3, 0])
    val = np.array([2.0, -1.0, 5.0])
    x = np.array([1.0, 10.0, 100.0, 1000.0])
    y = spmv_host_csr(ptr, ind, val, x)
    np.testing.assert_allclose(y, [0.0, 20.0 - 1000.0, 0.0, 5.0, 0.0, 0.0])
    # all-empty and zero-size
    np.testing.assert_allclose(
        spmv_host_csr(np.zeros(4, np.int64), np.zeros(0, np.int32), np.zeros(0), x),
        np.zeros(3),
    )


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex128])
def test_host_kid_parity(rng, dtype):
    A, dense = _random_csr(rng, 60, 47, dtype=dtype, empty_rows=(0, 13, 59))
    x = rng.standard_normal(47).astype(dtype)
    y0 = rng.standard_normal(60).astype(dtype)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        x = x + 1j * rng.standard_normal(47).astype(dtype)
    yd = ast.mv(1.5, A, GEN, Operation.none, x, 0.5, y0)
    yh = ast.mv(1.5, A, GEN, Operation.none, x, 0.5, y0, kid=HOST_MV_KID)
    assert isinstance(yh, np.ndarray)
    np.testing.assert_allclose(yh, np.asarray(yd), rtol=2e-5 if dtype == np.float32 else 1e-12)
    np.testing.assert_allclose(yh, 1.5 * dense @ x + 0.5 * y0, rtol=3e-5 if dtype == np.float32 else 1e-12)


@pytest.mark.parametrize(
    "op", [Operation.none, Operation.transpose, Operation.conjugate_transpose]
)
def test_host_kid_ops_and_symmetric(rng, op):
    A, dense = _random_csr(rng, 32, 32, dtype=np.complex128)
    x = rng.standard_normal(32) + 1j * rng.standard_normal(32)
    yh = ast.mv(1.0, A, GEN, op, x, 0.0, kid=HOST_MV_KID)
    opd = {
        Operation.none: dense,
        Operation.transpose: dense.T,
        Operation.conjugate_transpose: dense.conj().T,
    }[op]
    np.testing.assert_allclose(yh, opd @ x, rtol=1e-12)
    # symmetric upper: effective structure folding flows through the planner
    sym = MatrixDescriptor().with_(type=MatrixType.symmetric, fill_mode=FillMode.upper)
    u = np.triu(dense)
    ys = ast.mv(1.0, A, sym, Operation.none, x, 0.0, kid=HOST_MV_KID)
    np.testing.assert_allclose(ys, (u + np.triu(dense, 1).T) @ x, rtol=1e-12)


def test_host_quick_exits_match_device(rng):
    A, dense = _random_csr(rng, 24, 24)
    x = rng.standard_normal(24)
    y0 = rng.standard_normal(24)
    # alpha == 0 quick exit
    np.testing.assert_allclose(
        ast.mv(0.0, A, GEN, Operation.none, x, 2.0, y0, kid=HOST_MV_KID),
        np.asarray(ast.mv(0.0, A, GEN, Operation.none, x, 2.0, y0)),
    )
    # nan beta with no y: propagates through beta*0 like the device path
    yh = ast.mv(1.0, A, GEN, Operation.none, x, np.nan, kid=HOST_MV_KID)
    yd = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, np.nan))
    np.testing.assert_array_equal(np.isnan(yh), np.isnan(yd))
    assert np.isnan(yh).all()


def test_host_pin_routes_and_refreshes(rng):
    A, dense = _random_csr(rng, 48, 48)
    t = ast.autotune_mv(A, iters=1, chunks=1, kinds=("segsum", "host"))
    assert "host" in t
    plan = get_plan(A)
    key4 = (GEN.type, GEN.fill_mode, GEN.diag_type, Operation.none)
    # force the pin regardless of which engine actually won the race
    plan._mv_engine = {key4: "host"}
    x = rng.standard_normal(48)
    yh = ast.mv(1.0, A, GEN, Operation.none, x, 0.0)
    assert isinstance(yh, np.ndarray)
    np.testing.assert_allclose(yh, dense @ x, rtol=1e-12)
    # value refresh flows through the host form's plan slot
    _, _, _, ptr, ind, val = ast.export_csr(A)
    ast.update_values(A, np.asarray(val) * -2.0)
    y2 = ast.mv(1.0, A, GEN, Operation.none, x, 0.0)
    assert isinstance(y2, np.ndarray)
    np.testing.assert_allclose(y2, -2.0 * dense @ x, rtol=1e-12)
    # an explicit device KID still overrides the pin
    y3 = ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=0)
    assert not isinstance(y3, np.ndarray)
    np.testing.assert_allclose(np.asarray(y3), -2.0 * dense @ x, rtol=1e-12)


def test_host_pin_never_enters_traced_code(rng):
    A, dense = _random_csr(rng, 16, 16)
    plan = get_plan(A)
    key4 = (GEN.type, GEN.fill_mode, GEN.diag_type, Operation.none)
    plan.exec_form_for(GEN, Operation.none, dtype=A.dtype)
    plan._mv_engine = {key4: "host"}

    @jax.jit
    def f(x):
        return ast.mv(1.0, A, GEN, Operation.none, x, 0.0)

    x = np.linspace(0, 1, 16)
    np.testing.assert_allclose(np.asarray(f(x)), dense @ x, atol=1e-10)

    @jax.jit
    def g(x):
        return ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=HOST_MV_KID)

    with pytest.raises(AoclSparseError) as e:
        g(x)
    assert e.value.status == Status.not_implemented


def test_host_kid_contract(rng):
    # host KID is invalid for a native-format handle (its own KAT rows rule)
    m = 8
    ell_ind = np.tile(np.arange(2), (m, 1))
    A = ast.create_ell(m, m, 2, ell_ind, np.ones((m, 2)))
    with pytest.raises(AoclSparseError) as e:
        ast.mv(1.0, A, GEN, Operation.none, np.ones(m), 0.0, kid=HOST_MV_KID)
    assert e.value.status == Status.invalid_kid
    # wrong x size surfaces invalid_size from the host path too
    B, _ = _random_csr(rng, 12, 12)
    with pytest.raises(AoclSparseError) as e2:
        ast.mv(1.0, B, GEN, Operation.none, np.ones(5), 0.0, kid=HOST_MV_KID)
    assert e2.value.status == Status.invalid_size


def test_host_dotmv_stays_host(rng):
    A, dense = _random_csr(rng, 20, 20)
    x = rng.standard_normal(20)
    y, d = ast.dotmv(2.0, A, GEN, Operation.none, x, 0.0, kid=HOST_MV_KID)
    assert isinstance(y, np.ndarray)
    np.testing.assert_allclose(y, 2.0 * dense @ x, rtol=1e-12)
    np.testing.assert_allclose(d, x @ (2.0 * dense @ x), rtol=1e-12)


def test_host_pin_snapshot_roundtrip(rng, tmp_path):
    from aoclsparse_tpu.io import load_plan, save_plan

    A, dense = _random_csr(rng, 40, 40)
    plan = get_plan(A)
    key4 = (GEN.type, GEN.fill_mode, GEN.diag_type, Operation.none)
    plan.exec_form_for(GEN, Operation.none, kind="host", dtype=A.dtype)
    plan._mv_engine = {key4: "host"}
    p = str(tmp_path / "plan.npz")
    save_plan(A, p)
    _, _, _, ptr, ind, val = ast.export_csr(A)
    B = ast.create_csr(40, 40, np.asarray(ptr), np.asarray(ind), np.asarray(val))
    load_plan(B, p)
    x = rng.standard_normal(40)
    y = ast.mv(1.0, B, GEN, Operation.none, x, 0.0)
    assert isinstance(y, np.ndarray)
    np.testing.assert_allclose(y, dense @ x, rtol=1e-12)


def test_host_pin_traced_beta_y_falls_back(rng):
    # a host pin must not crash a jitted caller whose y (or beta) is traced
    A, dense = _random_csr(rng, 20, 20, dtype=np.float64)
    x = rng.standard_normal(20)
    y0 = rng.standard_normal(20)
    from aoclsparse_tpu import optimize

    optimize(A)
    plan = get_plan(A)
    from aoclsparse_tpu.core.types import Operation as Op

    plan._mv_engine = {
        (GEN.type, GEN.fill_mode, GEN.diag_type, Op.none): "host"
    }
    got = jax.jit(lambda yy: ast.mv(1.0, A, GEN, Op.none, x, 0.5, yy))(y0)
    np.testing.assert_allclose(np.asarray(got), dense @ x + 0.5 * y0, rtol=1e-12)
    got2 = jax.jit(lambda bb: ast.mv(1.0, A, GEN, Op.none, x, bb))(0.25)
    np.testing.assert_allclose(np.asarray(got2), dense @ x, rtol=1e-12)
    # the pin still routes host for a fully-concrete call
    got3 = ast.mv(1.0, A, GEN, Op.none, x, 0.0)
    assert isinstance(got3, np.ndarray)


def test_host_mv_lazy_refresh_after_numpy_update(rng):
    A, dense = _random_csr(rng, 16, 16, dtype=np.float64)
    x = rng.standard_normal(16)
    from aoclsparse_tpu.kernels.host import HOST_MV_KID

    y0 = ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=HOST_MV_KID)
    new_dense = dense * 3.0
    ast.update_values(A, new_dense[new_dense != 0])
    form = get_plan(A).exec_forms.get(
        (GEN.type, GEN.fill_mode, GEN.diag_type, Operation.none, "host")
    )
    assert form is not None and form.host_val is None  # lazy until next use
    y1 = ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=HOST_MV_KID)
    np.testing.assert_allclose(y1, new_dense @ x, rtol=1e-12)
    np.testing.assert_allclose(y1, 3.0 * y0, rtol=1e-12)
