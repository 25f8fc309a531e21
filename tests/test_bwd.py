"""Banded-window (bwd) execution-format tests: parity with the gather paths
on banded and near-banded matrices, rectangular shapes, descriptor variants,
refresh after update_values."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, MatrixType, Operation
from aoclsparse_tpu.planner.plan import build_clean_csr, build_effective_csr, build_exec_form
from aoclsparse_tpu.core.formats import CSR
from aoclsparse_tpu.planner.plan import get_plan
from aoclsparse_tpu.utils.reference import ref_mv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec

from conftest import random_csr


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
    val = dense[dense != 0]
    return ptr, ind, val, dense


def _run_bwd(ptr, ind, val, m, n, x, descr=None, op=Operation.none):
    A = ast.create_csr(m, n, ptr, ind, val)
    plan = get_plan(A)
    form = plan.exec_form_for(descr or MatrixDescriptor(), op, kind="bwd")
    assert form.kind == "bwd"
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form
    import jax.numpy as jnp

    xj = jnp.asarray(x)
    xp = jnp.pad(xj, (form.bwd_padL, form.bwd_n_pad - form.bwd_padL - form.n))
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd

    return np.asarray(
        spmv_bwd(form.bwd_val, xp, form.bwd_W, form.bwd_base8, form.bwd_n_pad, False)
    )[: form.m]


def test_bwd_banded_square(rng):
    m = 100
    ptr, ind, val, dense = _banded(rng, m, m, 12, 6)
    x = rng.standard_normal(m)
    got = _run_bwd(ptr, ind, val, m, m, x)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwd_rectangular(rng):
    m, n = 64, 48
    ptr, ind, val, dense = _banded(rng, m, n, 10, 4)
    x = rng.standard_normal(n)
    got = _run_bwd(ptr, ind, val, m, n, x)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwd_wide_rect(rng):
    m, n = 40, 120
    # entries clustered around column 2*i (off-band positive offsets)
    dense = np.zeros((m, n))
    for i in range(m):
        cs = np.clip(2 * i + rng.integers(0, 9, 3), 0, n - 1)
        dense[i, cs] = rng.standard_normal(cs.size)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))])
    ind = np.nonzero(dense)[1].astype(np.int32)
    val = dense[dense != 0]
    x = rng.standard_normal(n)
    got = _run_bwd(ptr, ind, val, m, n, x)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwd_random_matrix_matches(rng):
    # fully random (band = whole matrix) still must be correct
    m = 40
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.2)
    x = rng.standard_normal(m)
    got = _run_bwd(ptr, ind, val, m, m, x)
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)


def test_bwd_through_mv_with_descr(rng):
    m = 60
    ptr, ind, val, dense = _banded(rng, m, m, 8, 4)
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.symmetric)
    x = rng.standard_normal(m)
    plan = get_plan(A)
    form = plan.exec_form_for(descr, Operation.none, kind="bwd")
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd
    import jax.numpy as jnp

    xp = jnp.pad(jnp.asarray(x), (form.bwd_padL, form.bwd_n_pad - form.bwd_padL - form.n))
    got = np.asarray(spmv_bwd(form.bwd_val, xp, form.bwd_W, form.bwd_base8, form.bwd_n_pad, False))[:m]
    want = ref_mv(1.0, m, m, ptr, ind, val, descr, Operation.none, x, 0.0, np.zeros(m))
    assert_allclose_spec(got, want, dtype=np.float64, scale=10)


def test_bwd_refresh_after_update(rng):
    m = 32
    ptr, ind, val, dense = _banded(rng, m, m, 5, 3)
    A = ast.create_csr(m, m, ptr, ind, val)
    plan = get_plan(A)
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwd")
    newval = np.asarray(val) * 3.0
    ast.update_values(A, newval)
    x = rng.standard_normal(m)
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd
    import jax.numpy as jnp

    xp = jnp.pad(jnp.asarray(x), (form.bwd_padL, form.bwd_n_pad - form.bwd_padL - form.n))
    got = np.asarray(spmv_bwd(form.bwd_val, xp, form.bwd_W, form.bwd_base8, form.bwd_n_pad, False))[:m]
    assert_allclose_spec(got, 3.0 * dense @ x, dtype=np.float64, scale=10)


def test_bwd_edge_peel(rng):
    """A matrix whose band is narrow except for a few outlier rows must peel
    those entries into the spill and still match the dense product."""
    m = 2048
    dense = np.zeros((m, m))
    for i in range(m):
        cs = np.unique(np.clip(i + rng.integers(-4, 5, 3), 0, m - 1))
        dense[i, cs] = rng.standard_normal(cs.size)
    # outliers: a handful of entries far off the band
    for i in rng.choice(m, 5, replace=False):
        dense[i, (i + m // 2) % m] = 7.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))])
    ind = np.nonzero(dense)[1].astype(np.int32)
    val = dense[dense != 0]
    A = ast.create_csr(m, m, ptr, ind, val)
    plan = get_plan(A)
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwd")
    assert form.sp_ind is not None and int(form.sp_ind.shape[0]) >= 5
    assert form.bwd_W <= 24  # window stays narrow thanks to the peel
    x = rng.standard_normal(m)
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form
    import jax.numpy as jnp

    got = np.asarray(_run_exec_form(form, jnp.asarray(x), None))
    assert_allclose_spec(got, dense @ x, dtype=np.float64, scale=10)
    # refresh keeps both parts aligned
    ast.update_values(A, np.asarray(val) * 2.0)
    got2 = np.asarray(_run_exec_form(form, jnp.asarray(x), None))
    assert_allclose_spec(got2, 2.0 * dense @ x, dtype=np.float64, scale=10)


def test_bwd_mixed_precision_path(rng):
    m = 48
    ptr, ind, val, dense = _banded(rng, m, m, 6, 3, dtype=np.float32)
    x = rng.standard_normal(m).astype(np.float32)
    A = ast.create_csr(m, m, ptr, ind, val)
    plan = get_plan(A)
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwd")
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd
    import jax.numpy as jnp

    xp = jnp.pad(jnp.asarray(x), (form.bwd_padL, form.bwd_n_pad - form.bwd_padL - form.n))
    got = np.asarray(spmv_bwd(form.bwd_val, xp, form.bwd_W, form.bwd_base8, form.bwd_n_pad, True))[:m]
    # bf16 multiply, f32 accumulate: loose tolerance
    np.testing.assert_allclose(got, dense @ x, rtol=0.05, atol=0.05)
