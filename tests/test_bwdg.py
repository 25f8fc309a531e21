"""Group-band (bwdg) execution format + SpGEMM band-form C output.

The bwdg layout (band[g, r, c] = A[G*g + r, G*g + rel + c]) is what the
band x band SpGEMM numeric engine emits for C, so seeding a product
handle's plan with it lets chained mv run with no CSR extraction gather
and no host relayout (kernels/xla/spgemm_band.py cband_exec_form,
planner Plan.seed_bwdg)."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import Request
from aoclsparse_tpu.planner.plan import _build_bwd, build_clean_csr, build_effective_csr, get_plan
from aoclsparse_tpu.core.formats import CSR
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

GEN = MatrixDescriptor()


def _banded(rng, m, n, half_bw, row_nnz, dtype=np.float64):
    cols = np.clip(
        np.arange(m)[:, None] + rng.integers(-half_bw, half_bw + 1, (m, row_nnz)),
        0,
        n - 1,
    )
    dense = np.zeros((m, n), dtype=dtype)
    for i in range(m):
        dense[i, cols[i]] = rng.standard_normal(row_nnz)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ptr, ind, dense[dense != 0], dense


def _run_bwdg(dense, x, G):
    import jax.numpy as jnp

    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwdg

    m, n = dense.shape
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    eff = build_effective_csr(
        build_clean_csr(CSR(ptr, ind, dense[dense != 0], shape=(m, n))),
        GEN,
        Operation.none,
    )
    form = _build_bwd(eff, G=G, kind="bwdg")
    assert form.kind == "bwdg"
    return np.asarray(
        spmv_bwdg(form.bwd_val, jnp.asarray(x), form.bwd_G, form.bwd_W, form.bwd_rel, form.m)
    )


@pytest.mark.parametrize("m,G", [(100, 32), (513, 64), (96, 128)])
def test_bwdg_kernel_square(rng, m, G):
    _, _, _, dense = _banded(rng, m, m, 9, 5)
    x = rng.standard_normal(m)
    got = _run_bwdg(dense, x, G)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwdg_kernel_wide_rect(rng):
    # band confined to the left columns, x much longer than the last window
    m, n = 64, 2000
    dense = np.zeros((m, n))
    for i in range(m):
        cs = np.clip(i + rng.integers(0, 7, 3), 0, n - 1)
        dense[i, cs] = rng.standard_normal(cs.size)
    x = rng.standard_normal(n)
    got = _run_bwdg(dense, x, 32)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwdg_kernel_negative_rel(rng):
    # superdiagonal-free lower band: rel strictly negative for late groups
    m = 200
    dense = np.zeros((m, m))
    for i in range(m):
        cs = np.unique(np.clip(i - rng.integers(0, 12, 4), 0, m - 1))
        dense[i, cs] = rng.standard_normal(cs.size)
    x = rng.standard_normal(m)
    got = _run_bwdg(dense, x, 64)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwdg_through_mv_kid(rng):
    # explicit KID 9 pins the group-band form end-to-end through mv
    m = 150
    ptr, ind, val, dense = _banded(rng, m, m, 7, 4)
    A = ast.create_csr(m, m, ptr, ind, val)
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(2.0, A, GEN, Operation.none, x, 0.0, kid=9))
    assert_allclose_spec(y, 2.0 * dense @ x, dtype=np.float64, scale=10)
    form = get_plan(A).exec_form_for(GEN, Operation.none, kind="bwdg")
    assert form.kind == "bwdg" and form.bwd_G == 512


# ---------------------------------------------------------------------------
# SpGEMM band-form C output: chained mv on the product runs on the seeded band
# ---------------------------------------------------------------------------


@pytest.fixture
def _force_band(monkeypatch):
    monkeypatch.setenv("AOCLSPARSE_TPU_FORCE_BANDGEMM", "1")


def _band_mat(rng, m, half):
    dense = np.zeros((m, m))
    for i in range(m):
        js = np.clip(i + rng.integers(-half, half + 1, min(2 * half, 5)), 0, m - 1)
        dense[i, js] = rng.standard_normal(js.size)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


def test_spgemm_seeds_bwdg_form(rng, _force_band):
    m = 200
    A, da = _band_mat(rng, m, 5)
    B, db = _band_mat(rng, m, 6)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    assert C._spgemm_plan.band is not None
    assert getattr(C, "_seed_bwdg", None) is not None
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(1.0, C, GEN, Operation.none, x, 0.0))
    assert_allclose_spec(y, (da @ db) @ x, dtype=np.float64, scale=100)
    # the plan must actually be running the seeded band, not a rebuilt form
    key = (GEN.type, GEN.fill_mode, GEN.diag_type, Operation.none, None)
    assert C.plan.exec_forms[key] is C._seed_bwdg
    assert C.plan.exec_forms[key].kind == "bwdg"


def test_seeded_form_refresh_after_update(rng, _force_band):
    m = 160
    A, da = _band_mat(rng, m, 4)
    B, db = _band_mat(rng, m, 5)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    x = rng.standard_normal(m)
    y0 = np.asarray(ast.mv(1.0, C, GEN, Operation.none, x, 0.0))  # plants the seed
    newv = 3.0 * np.asarray(C.data.val)
    ast.update_values(C, newv)  # refresh must rescatter the seeded band
    y1 = np.asarray(ast.mv(1.0, C, GEN, Operation.none, x, 0.0))
    assert_allclose_spec(y1, 3.0 * y0, dtype=np.float64, scale=100)


def test_stale_seed_dropped_when_values_change_first(rng, _force_band):
    # update_values BEFORE the first op: the pending band is stale and must
    # not be planted
    m = 128
    A, da = _band_mat(rng, m, 4)
    B, db = _band_mat(rng, m, 4)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    assert C.plan is None  # nothing planted yet
    newv = rng.standard_normal(C.nnz)
    ast.update_values(C, newv)
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(1.0, C, GEN, Operation.none, x, 0.0))
    _, _, _, ptr, ind, _ = ast.export_csr(C)
    dc = np.zeros((m, m))
    dc[np.repeat(np.arange(m), np.diff(ptr)), ind] = newv
    assert_allclose_spec(y, dc @ x, dtype=np.float64, scale=100)


def test_finalize_reseeds_band(rng, _force_band):
    m = 128
    A, da = _band_mat(rng, m, 4)
    B, db = _band_mat(rng, m, 5)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    x = rng.standard_normal(m)
    np.asarray(ast.mv(1.0, C, GEN, Operation.none, x, 0.0))  # plant the first seed
    newb = rng.standard_normal(B.nnz)
    ast.update_values(B, newb)
    db2 = np.zeros((m, m))
    db2[
        np.repeat(np.arange(m), np.diff(np.asarray(B.data.ptr))), np.asarray(B.data.ind)
    ] = newb
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.finalize, C)
    y = np.asarray(ast.mv(1.0, C, GEN, Operation.none, x, 0.0))
    assert_allclose_spec(y, (da @ db2) @ x, dtype=np.float64, scale=100)
    assert getattr(C, "_seed_bwdg", None) is not None


def test_chained_band_gemm_reuses_seed(rng, _force_band):
    # D = (A @ B) @ Bc: the second product must reuse the first product's
    # seeded device band as its A operand (no host relayout) and still
    # match the dense oracle; refresh path re-validated via finalize
    m = 192
    A, da = _band_mat(rng, m, 4)
    B, db = _band_mat(rng, m, 5)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    assert getattr(C, "_seed_bwdg", None) is not None
    Bc, dbc = _band_mat(rng, m, 3)
    D = ast.sp2m(Operation.none, GEN, C, Operation.none, GEN, Bc, Request.full_computation)
    band2 = D._spgemm_plan.band
    assert band2 is not None
    assert band2.formA is C._seed_bwdg  # chained: the seed IS the operand band
    _, _, _, dp, di, dv = ast.export_csr(D)
    dd = np.zeros((m, m))
    dd[np.repeat(np.arange(m), np.diff(dp)), di] = dv
    want = (da @ db) @ dbc
    assert_allclose_spec(dd, want, dtype=np.float64, scale=1000)
    # and D itself is seeded for chained mv
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(1.0, D, GEN, Operation.none, x, 0.0))
    assert_allclose_spec(y, want @ x, dtype=np.float64, scale=1000)
    # finalize with updated A values flows through the chained plan
    newa = 2.0 * np.asarray(A.data.val)
    ast.update_values(A, newa)
    C2 = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.finalize, C)
    D2 = ast.sp2m(Operation.none, GEN, C2, Operation.none, GEN, Bc, Request.finalize, D)
    _, _, _, dp2, di2, dv2 = ast.export_csr(D2)
    dd2 = np.zeros((m, m))
    dd2[np.repeat(np.arange(m), np.diff(dp2)), di2] = dv2
    assert_allclose_spec(dd2, 2.0 * want, dtype=np.float64, scale=1000)


def test_syrk_does_not_seed_band(rng, _force_band):
    # syrk's stored pattern is upper-only while the gemm band holds the FULL
    # product: seeding would make mv add the lower triangle, so it must not
    m = 160
    A, da = _band_mat(rng, m, 6)
    S = ast.syrk(Operation.none, A)
    assert getattr(S, "_seed_bwdg", None) is None
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(1.0, S, GEN, Operation.none, x, 0.0))
    _, _, _, ps, is_, vs = ast.export_csr(S)
    ds = np.zeros((m, m))
    ds[np.repeat(np.arange(m), np.diff(ps)), is_] = vs
    assert_allclose_spec(y, ds @ x, dtype=np.float64, scale=100)
