"""Cold-plan calls inside jit: planner form construction is compile-time
work, so a library call whose plan cache is empty must still trace cleanly
(Plan.effective_for / exec_form_for / trsv_form_for run their builds under
jax.ensure_compile_time_eval). Regression: before the guard, a cold mv
under jit cached TRACERS into the plan (UnexpectedTracerError on reuse) and
a cold trsv raised TracerArrayConversionError."""

import jax
import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, MatrixType, Operation

from conftest import random_csr


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _general(rng, m=48, n=40):
    ptr, ind, val, dense = random_csr(rng, m, n, dtype=np.float64)
    return ast.create_csr(m, n, ptr, ind, val), dense


def _lower(rng, m=32):
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=np.float64, ensure_diag=True)
    return ast.create_csr(m, m, ptr, ind, val), np.tril(dense)


def test_cold_jit_mv(rng):
    A, dense = _general(rng)
    x = rng.standard_normal(dense.shape[1])
    y = jax.jit(lambda v: ast.mv(1.0, A, MatrixDescriptor(), Operation.none, v, 0.0))(x)
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-12)
    # the plan cache must hold CONCRETE arrays after the traced build:
    # a second eager call through the same cached forms must not leak
    y2 = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0)
    np.testing.assert_allclose(np.asarray(y2), dense @ x, rtol=1e-12)


def test_cold_jit_mm(rng):
    A, dense = _general(rng)
    B = rng.standard_normal((dense.shape[1], 5))
    y = jax.jit(lambda b: ast.mm(1.0, A, MatrixDescriptor(), Operation.none, b, 0.0))(B)
    np.testing.assert_allclose(np.asarray(y), dense @ B, rtol=1e-12)


def test_cold_jit_trsv_and_trsm(rng):
    A, L = _lower(rng)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = rng.standard_normal(L.shape[0])
    x = jax.jit(lambda v: ast.trsv(1.0, A, descr, Operation.none, v))(b)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(L, b), rtol=1e-9)
    B = rng.standard_normal((L.shape[0], 3))
    X = jax.jit(lambda v: ast.trsm(1.0, A, descr, Operation.none, v))(B)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(L, B), rtol=1e-9)


def test_cold_jit_trsv_level_kid(rng):
    A, L = _lower(rng)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = rng.standard_normal(L.shape[0])
    x = jax.jit(lambda v: ast.trsv(1.0, A, descr, Operation.none, v, kid=1))(b)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(L, b), rtol=1e-9)


def test_jit_first_solve_caches_stay_concrete(rng):
    """TrsvForm.solve lazily derives _Dinv/_pallas operands; when the FIRST
    call happens inside a user jit trace those caches must stay concrete
    (ensure_compile_time_eval) — without it the cached tracers poisoned
    every later call (UnexpectedTracerError; found by the r3 suite run)."""
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_form_for

    A, L = _lower(rng)
    m = L.shape[0]
    tform = trsv_form_for(get_plan(A), MatrixDescriptor(type=MatrixType.triangular), Operation.none)
    m_pad = tform.nblk * tform.nb
    import jax.numpy as jnp

    b = jnp.pad(jnp.asarray(rng.standard_normal(m))[:, None], ((0, m_pad - m), (0, 0)))
    x1 = np.asarray(jax.jit(tform.solve)(b))[:m, 0]  # first call under trace
    for cache in ("_Dinv", "_pallas", "_pallas_m"):
        v = getattr(tform, cache, None)
        if v is not None:
            leaves = jax.tree_util.tree_leaves(v)
            assert all(isinstance(l, jax.Array) or np.isscalar(l) for l in leaves)
    x2 = np.asarray(tform.solve(b))[:m, 0]  # second call eager
    want = np.linalg.solve(L, np.asarray(b)[:m, 0])
    np.testing.assert_allclose(x1, want, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(x2, want, rtol=1e-8, atol=1e-10)
