"""Whole-matrix spill-route SpMV (mv KID 14): the gather-free one-hot
select/Benes/accumulate engine as a full-matrix execution form (bone010
class: large irregular structure the gen composite rejects; the padded-ELL
gather default measured 0.082 Gnnz/s at 48M nnz)."""

import numpy as np
import jax.numpy as jnp

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.planner.plan import get_plan


def _scatter_matrix(rng, m=3000, n=2500, nnz=20000):
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    key = np.unique(r.astype(np.int64) * n + c)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size).astype(np.float32)
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, r + 1, 1)
    return np.cumsum(ptr), c.astype(np.int32), v, r


def test_route_form_parity_and_refresh():
    rng = np.random.default_rng(21)
    m, n = 3000, 2500
    ptr, ind, val, r = _scatter_matrix(rng, m, n)
    A = ast.create_csr(m, n, ptr, ind, val)
    form = get_plan(A).exec_form_for(MatrixDescriptor(), Operation.none, kind="route")
    assert form.kind == "route"
    x = rng.standard_normal(n).astype(np.float32)
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form

    y = np.asarray(_run_exec_form(form, jnp.asarray(x), None))
    ref = np.zeros(m)
    np.add.at(ref, r, val.astype(np.float64) * x.astype(np.float64)[ind])
    assert np.abs(y - ref).max() < 1e-3 * max(1.0, np.abs(ref).max())

    # refresh contract: update_values flows through the stored slot map
    form.refresh(jnp.asarray(2.0 * val))
    y2 = np.asarray(_run_exec_form(form, jnp.asarray(x), None))
    assert np.abs(y2 - 2.0 * ref).max() < 2e-3 * max(1.0, np.abs(ref).max())


def test_route_form_via_mv_kid():
    rng = np.random.default_rng(22)
    m = n = 2048
    ptr, ind, val, r = _scatter_matrix(rng, m, n, nnz=15000)
    A = ast.create_csr(m, n, ptr, ind, val)
    # force the plan slot to the route form, then drive through ast.mv
    plan = get_plan(A)
    plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="route")
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(ast.mv(1.5, A, MatrixDescriptor(), Operation.none, x, 0.0))
    ref = np.zeros(m)
    np.add.at(ref, r, val.astype(np.float64) * x.astype(np.float64)[ind])
    assert np.abs(y - 1.5 * ref).max() < 2e-3 * max(1.0, np.abs(ref).max())


def test_striped_route_parity():
    # striped variant (cache-resident sub-networks): parity + refresh with
    # multiple stripes forced via a small target_slots
    from aoclsparse_tpu.planner.spill_route import (
        build_striped_route, striped_route_apply,
    )

    rng = np.random.default_rng(31)
    m, n = 6000, 4000
    ptr, ind, val, r = _scatter_matrix(rng, m, n, nnz=30000)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(ptr))
    sr = build_striped_route(
        rows, ind.astype(np.int64), val,
        m_pad=-(-m // 1024) * 1024, n_pad_x=-(-n // 1024) * 1024,
        target_slots=1 << 12,
    )
    assert len(sr.stripes) > 1
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(striped_route_apply(jnp.asarray(x), sr, interpret=True))[:m]
    ref = np.zeros(m)
    np.add.at(ref, rows, val.astype(np.float64) * x.astype(np.float64)[ind])
    assert np.abs(y - ref).max() < 1e-3 * max(1.0, np.abs(ref).max())
    sr.refresh(3.0 * val)
    y3 = np.asarray(striped_route_apply(jnp.asarray(x), sr, interpret=True))[:m]
    assert np.abs(y3 - 3.0 * ref).max() < 3e-3 * max(1.0, np.abs(ref).max())
