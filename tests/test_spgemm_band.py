"""Band x band SpGEMM numeric fast path (kernels/xla/spgemm_band.py):
scan-of-matmuls parity vs the product-expansion numeric and the dense
oracle, including staged finalize-after-update_values and syrk routing.
Forced on CPU via AOCLSPARSE_TPU_FORCE_BANDGEMM (the cost model would
otherwise route tiny problems to expansion)."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import Request

GEN = MatrixDescriptor()


@pytest.fixture(autouse=True)
def _force_band(monkeypatch):
    monkeypatch.setenv("AOCLSPARSE_TPU_FORCE_BANDGEMM", "1")


def _band(rng, m, half, dtype=np.float64):
    dense = np.zeros((m, m), dtype=dtype)
    for i in range(m):
        js = np.clip(i + rng.integers(-half, half + 1, min(2 * half, 5)), 0, m - 1)
        dense[i, js] = rng.standard_normal(js.size)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


@pytest.mark.parametrize("m,half", [(96, 4), (200, 9), (513, 30)])
def test_band_gemm_parity(rng, m, half):
    A, da = _band(rng, m, half)
    B, db = _band(rng, m, half + 2)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    assert C._spgemm_plan.band is not None
    _, _, _, ptr, ind, val = ast.export_csr(C)
    dc = np.zeros((m, m))
    dc[np.repeat(np.arange(m), np.diff(ptr)), ind] = val
    patt = np.zeros((m, m), bool)
    patt[np.repeat(np.arange(m), np.diff(ptr)), ind] = True
    np.testing.assert_allclose(dc[patt], (da @ db)[patt], atol=1e-11)


def test_band_gemm_finalize_refresh(rng):
    m = 128
    A, da = _band(rng, m, 5)
    B, db = _band(rng, m, 6)
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.full_computation)
    assert C._spgemm_plan.band is not None
    newv = rng.standard_normal(B.nnz)
    ast.update_values(B, newv)
    db2 = np.zeros((m, m))
    db2[
        np.repeat(np.arange(m), np.diff(np.asarray(B.data.ptr))), np.asarray(B.data.ind)
    ] = newv
    C = ast.sp2m(Operation.none, GEN, A, Operation.none, GEN, B, Request.finalize, C)
    _, _, _, ptr, ind, val = ast.export_csr(C)
    dc = np.zeros((m, m))
    dc[np.repeat(np.arange(m), np.diff(ptr)), ind] = val
    patt = np.zeros((m, m), bool)
    patt[np.repeat(np.arange(m), np.diff(ptr)), ind] = True
    np.testing.assert_allclose(dc[patt], (da @ db2)[patt], atol=1e-11)


def test_band_gemm_syrk_upper(rng):
    m = 160
    A, da = _band(rng, m, 7)
    S = ast.syrk(Operation.none, A)
    _, _, _, ps, is_, vs = ast.export_csr(S)
    ds = np.zeros((m, m))
    ds[np.repeat(np.arange(m), np.diff(ps)), is_] = vs
    pattS = np.zeros((m, m), bool)
    pattS[np.repeat(np.arange(m), np.diff(ps)), is_] = True
    full = da @ da.T
    assert np.all(is_ >= np.repeat(np.arange(m), np.diff(ps)))  # upper only
    np.testing.assert_allclose(ds[pattS], full[pattS], atol=1e-11)


def test_band_gemm_matches_expansion_numeric(rng):
    # identical plans, two numeric engines: values must agree to fp tolerance
    from aoclsparse_tpu.ops.level3.spgemm import _effective, _numeric, _symbolic
    from aoclsparse_tpu.kernels.xla.spgemm_band import band_gemm_values, build_band_gemm_plan

    m = 256
    A, da = _band(rng, m, 8)
    eff = _effective(A, GEN, Operation.none)
    plan = _symbolic(eff, eff)
    band = build_band_gemm_plan(eff, eff, plan.ptr, plan.ind, G=32, force=True)
    assert band is not None
    v1 = np.asarray(band_gemm_values(band, eff.val, eff.val))
    v2 = np.asarray(
        _numeric(eff.val, eff.val, plan.pa, plan.pb, plan.pc, plan.nnz, False, False)
    )
    np.testing.assert_allclose(v1, v2, atol=1e-11)


def test_band_gemm_rejected_for_scattered(rng):
    # random structure must fall back to expansion (band plan refuses)
    from aoclsparse_tpu.ops.level3.spgemm import _effective, _symbolic
    from aoclsparse_tpu.kernels.xla.spgemm_band import build_band_gemm_plan

    m = 256
    dense = np.zeros((m, m))
    for i in range(m):
        dense[i, rng.choice(m, 4, replace=False)] = 1.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    A = ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])
    eff = _effective(A, GEN, Operation.none)
    plan = _symbolic(eff, eff)
    # not forced: the cost model must reject (W ~ m at G=32 blows the model)
    band = build_band_gemm_plan(eff, eff, plan.ptr, plan.ind, G=32, force=False)
    assert band is None
