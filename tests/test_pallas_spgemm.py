"""Pallas band-GEMM numeric kernel vs the scan engine (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.kernels.xla.spgemm_band import (
    _band_gemm_scan,
    _ensure_streams,
    build_band_gemm_plan,
)
from aoclsparse_tpu.planner.plan import build_effective_csr, get_plan


def _banded(rng, m, half_bw, row_nnz):
    win = 2 * half_bw
    base = np.clip(np.arange(m) - half_bw, 0, m - win)
    pick = np.argsort(rng.random((m, win)), axis=1)[:, :row_nnz]
    cols = np.sort(base[:, None] + pick, axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * row_nnz
    val = rng.standard_normal(m * row_nnz).astype(np.float32)
    return ptr, cols.reshape(-1).astype(np.int32), val


@pytest.mark.parametrize("half_bw", [16, 48])
def test_pallas_band_gemm_matches_scan(half_bw):
    rng = np.random.default_rng(5)
    m = 1024
    ptr, ind, val = _banded(rng, m, half_bw, 8)
    A = ast.create_csr(m, m, ptr, ind, val)
    B = ast.create_csr(m, m, ptr, ind, (val * 0.5).astype(np.float32))
    plan_a = get_plan(A)
    effA = build_effective_csr(plan_a.clean, MatrixDescriptor(), Operation.none)
    plan_b = get_plan(B)
    effB = build_effective_csr(plan_b.clean, MatrixDescriptor(), Operation.none)
    # symbolic pattern via the library product
    C = ast.sp2m(Operation.none, MatrixDescriptor(), A, Operation.none, MatrixDescriptor(), B)
    _, _, _, Cptr, Cind, _ = ast.export_csr(C)
    gp = build_band_gemm_plan(
        effA, effB, np.asarray(Cptr), np.asarray(Cind), G=256, force=True
    )
    assert gp is not None
    gp.formA.refresh(effA.val)
    gp.formB.refresh(effB.val)
    streams = _ensure_streams(gp)
    want = np.asarray(
        _band_gemm_scan(
            gp.formA.bwd_val, streams, G=gp.G, WB=gp.WB, WC=gp.WC,
            ranges=gp.stream_ranges,
        )
    )
    from aoclsparse_tpu.kernels.pallas.spgemm import pallas_band_gemm

    got = np.asarray(
        pallas_band_gemm(
            gp.formA.bwd_val, gp.formB.bwd_val, G=gp.G, WB=gp.WB, WC=gp.WC,
            d0=gp.d0, ranges=gp.stream_ranges, interpret=True,
        )
    )
    assert got.shape == want.shape
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < 1e-6
