"""Lazy SpGEMM extraction routes (VERDICT r4 item 6): the host route must
produce the same CSR values as the device gather, and autotune must pin a
route on the plan."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation, Request
from aoclsparse_tpu.ops.level3.spgemm import _effective, _numeric_auto
from aoclsparse_tpu.core.descr import GENERAL


def _band_matrix(rng, m=256, w=8):
    cols = np.clip(
        np.arange(m)[:, None] + np.sort(rng.choice(np.arange(-8, 9), w, replace=False)),
        0, m - 1,
    )
    cols = np.sort(cols, axis=1)
    dup = np.concatenate([np.zeros((m, 1), bool), cols[:, 1:] == cols[:, :-1]], axis=1)
    cols[dup] += 1
    cols = np.sort(np.clip(cols, 0, m - 1), axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * w
    val = rng.standard_normal(m * w).astype(np.float32)
    return ptr, cols.reshape(-1).astype(np.int32), val


def test_host_extraction_route_matches_gather(monkeypatch):
    from aoclsparse_tpu import native

    rng = np.random.default_rng(2)
    m = 256
    ptr, ind, val = _band_matrix(rng)
    A = ast.create_csr(m, m, ptr, ind, val)
    monkeypatch.setenv("AOCLSPARSE_TPU_LAZY_SPGEMM", "1")
    monkeypatch.setenv("AOCLSPARSE_TPU_FORCE_BANDGEMM", "1")
    C = ast.sp2m(Operation.none, GENERAL, A, Operation.none, GENERAL, A)
    plan = C._spgemm_plan
    if plan.band is None:
        pytest.skip("band engine not attached on this operand")
    assert C.values_pending
    v_gather = np.asarray(C.data.val)  # materializes via the gather route

    # re-finalize with the host route pinned
    plan._extract_route = "host"
    C = ast.sp2m(Operation.none, GENERAL, A, Operation.none, GENERAL, A,
                 request=Request.finalize, C=C)
    if not native.available():
        pytest.skip("native lib unavailable (numpy fallback covers engine)")
    assert C.values_pending
    v_host = np.asarray(C.data.val)
    assert np.abs(v_host - v_gather).max() < 1e-4 * max(1.0, np.abs(v_gather).max())

    # oracle check
    import scipy.sparse as sp

    S = sp.csr_matrix((val.astype(np.float64), ind, ptr), shape=(m, m))
    P = (S @ S).sorted_indices()
    got = sp.csr_matrix(
        (v_host.astype(np.float64), np.asarray(C.data.ind), np.asarray(C.data.ptr)),
        shape=(m, m),
    ).sorted_indices()
    assert np.abs((P - got).toarray()).max() < 1e-3


def test_autotune_pins_extract_route():
    rng = np.random.default_rng(4)
    m = 256
    ptr, ind, val = _band_matrix(rng)
    A = ast.create_csr(m, m, ptr, ind, val)
    from aoclsparse_tpu.kernels.autotune import autotune_spgemm

    C, results = autotune_spgemm(A, A, iters=1, chunks=1)
    plan = C._spgemm_plan
    if "band" in results:
        assert getattr(plan, "_extract_route", None) in ("gather", "host")
        assert "extract_gather" in results
