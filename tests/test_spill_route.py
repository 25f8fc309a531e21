"""Spill-route engine (VERDICT r4 item 1): Benes static-permutation router
and the one-hot select/accumulate kernels replacing the gen form's
gather+segsum spill tail. Measured 3.4x over the gather tail at webbase
scale on v5e (benchmarks/PROBE_route.jsonl spill_summary row)."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.planner.plan import get_plan

GEN = MatrixDescriptor()


def test_benes_masks_route_random_perms(rng):
    from aoclsparse_tpu import native
    from aoclsparse_tpu.kernels.xla.route import apply_benes

    for k in (1, 2, 5, 10):
        n = 1 << k
        src = rng.permutation(n)
        masks = native.benes_plan(k, src)
        v = np.arange(n, dtype=np.float32)
        out = np.asarray(apply_benes(v, masks, k))
        np.testing.assert_array_equal(out, v[src])
    # numpy fallback emits identical routing behavior
    k, n = 6, 64
    src = rng.permutation(n)
    m2 = native._benes_numpy(k, src.astype(np.int64), np.empty((2 * k - 1, n), np.uint8))
    out = np.asarray(apply_benes(np.arange(n, dtype=np.float32), m2, k))
    np.testing.assert_array_equal(out, np.arange(n, dtype=np.float32)[src])


def test_hierarchical_route_k_beyond_fused_cap(rng, monkeypatch):
    # routes larger than the fused kernel's VMEM cap split into outer XLA
    # stages + 2^d independent fused subnetworks (the webbase-class spill
    # hit k=21 and silently fell back to ~6 ms of staged XLA rolls before
    # this path existed). Exercised at a small scale by lowering the cap.
    from aoclsparse_tpu import native
    from aoclsparse_tpu.kernels.pallas import route_fused
    from aoclsparse_tpu.kernels.xla.route import apply_route, plan_route_arrays

    monkeypatch.setattr(route_fused, "FUSED_MAX_K", 7)
    for k in (8, 9):
        n = 1 << k
        src = rng.permutation(n)
        masks = native.benes_plan(k, src)
        outer, packed = plan_route_arrays(k, masks)
        assert packed is not None and packed.shape[0] == 1 << (k - 7)
        v = np.arange(n, dtype=np.float32)
        out = np.asarray(apply_route(v, outer, packed, k, interpret=True))
        np.testing.assert_array_equal(out, v[src])


def test_static_route_partial_and_2d(rng):
    from aoclsparse_tpu.kernels.xla.route import StaticRoute

    src = rng.permutation(600)[:411]
    r = StaticRoute(src, n_in=600)
    v = rng.standard_normal(600).astype(np.float32)
    np.testing.assert_allclose(np.asarray(r.apply(v)), v[src])
    V = rng.standard_normal((600, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(r.apply(V)), V[src])


def test_spill_route_apply_parity(rng):
    from aoclsparse_tpu.planner.spill_route import build_spill_route, spill_route_apply

    m_pad = 8192
    P = 3000
    rows = rng.integers(0, m_pad, P)
    cols = rng.integers(0, m_pad, P)
    vals = rng.standard_normal(P).astype(np.float32)
    sr = build_spill_route(rows, cols, vals, m_pad)
    xp = rng.standard_normal(m_pad).astype(np.float32)
    yp = rng.standard_normal(m_pad).astype(np.float32)
    out = np.asarray(
        spill_route_apply(xp, yp, sr.ops(), sr.statics(), interpret=True)
    )
    want = yp.copy()
    np.add.at(want, rows, vals * xp[cols])
    assert np.abs(out - want).max() < 1e-4
    sr.refresh(vals * -2.0)
    out2 = np.asarray(
        spill_route_apply(xp, yp, sr.ops(), sr.statics(), interpret=True)
    )
    want2 = yp.copy()
    np.add.at(want2, rows, -2.0 * vals * xp[cols])
    assert np.abs(out2 - want2).max() < 1e-4


def _circuit_like_f32(rng, m=1024, hubs=4, scatter=400):
    dense = np.zeros((m, m), dtype=np.float32)
    for i in range(m):
        js = np.unique(np.clip(i + rng.integers(-10, 11, 6), 0, m - 1))
        dense[i, js] = rng.standard_normal(js.size)
    for h in rng.choice(m, hubs, replace=False):
        rs = rng.choice(m, m // 3, replace=False)
        dense[rs, h] = rng.standard_normal(rs.size)
    ri, rj = rng.integers(0, m, scatter), rng.integers(0, m, scatter)
    dense[ri, rj] = rng.standard_normal(scatter)
    return dense


def test_mv_spill_route_end_to_end(rng, monkeypatch):
    monkeypatch.setenv("AOCLSPARSE_TPU_SPILL_ROUTE", "1")  # force (CPU interpret)
    m = 1024
    dense = _circuit_like_f32(rng, m)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    x = rng.standard_normal(m).astype(np.float32)
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=7))
    np.testing.assert_allclose(y, dense @ x, atol=1e-3)
    form = get_plan(A).exec_form_for(GEN, Operation.none, kind="gen")
    assert form.sp_ind is not None and int(form.sp_ind.shape[0]) > 0
    assert form._spill_route is not None  # the engine actually engaged
    # update_values refreshes the select tiles through the slot map
    v2 = (dense[dense != 0] * 0.5).astype(np.float32)
    ast.update_values(A, v2)
    y2 = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=7))
    np.testing.assert_allclose(y2, 0.5 * dense @ x, atol=1e-3)


def test_mv_spill_route_matches_gather_path(rng, monkeypatch):
    m = 1024
    dense = _circuit_like_f32(rng, m, scatter=600)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    x = rng.standard_normal(m).astype(np.float32)
    monkeypatch.setenv("AOCLSPARSE_TPU_SPILL_ROUTE", "0")
    y_gather = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=7))
    monkeypatch.setenv("AOCLSPARSE_TPU_SPILL_ROUTE", "1")
    y_route = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0, kid=7))
    np.testing.assert_allclose(y_route, y_gather, atol=2e-5)


def test_pcg_pspace_spill_route(rng, monkeypatch):
    # the permuted-space Krylov matvec (solvers/fused.py _gen_pspace) rides
    # the same engine
    monkeypatch.setenv("AOCLSPARSE_TPU_SPILL_ROUTE", "1")
    m = 768
    dense = _circuit_like_f32(rng, m, hubs=2, scatter=300)
    spd = (dense + dense.T) * 0.05
    spd[np.arange(m), np.arange(m)] = np.abs(spd).sum(1) + 1.0
    spd = spd.astype(np.float32)
    ptr = np.concatenate([[0], np.cumsum((spd != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(spd)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, spd[spd != 0])
    b = rng.standard_normal(m).astype(np.float32)
    x, _iters, _res = ast.pcg_solve(A, b, maxit=400, rtol=1e-5, descr=GEN)
    r = b - spd @ np.asarray(x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-4
