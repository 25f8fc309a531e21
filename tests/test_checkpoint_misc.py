"""Checkpoint save/load, distributed TRSM, debug modes."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import DiagType, FillMode, MatrixDescriptor, MatrixType, Operation
from aoclsparse_tpu.io.checkpoint import load_matrix, save_matrix
from aoclsparse_tpu.utils.reference import csr_to_dense, ref_trsv

from conftest import random_csr


def test_checkpoint_roundtrip(tmp_path, rng):
    m = 15
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.3, ensure_diag=True)
    h = ast.create_csr(m, m, ptr, ind, val)
    p = tmp_path / "mat.npz"
    save_matrix(p, h)
    h2 = load_matrix(p)
    m2, n2, nnz2, p2, i2, v2 = ast.export_csr(h2)
    np.testing.assert_allclose(csr_to_dense(m2, n2, p2, i2, v2), dense)
    assert h2.ilu_state is None


def test_checkpoint_with_ilu(tmp_path, rng):
    m = 12
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.4, ensure_diag=True)
    h = ast.create_csr(m, m, ptr, ind, val)
    st = ast.ilu0_factorize(h)
    b = rng.standard_normal(m)
    want = np.asarray(ast.ilu_smoother(h, None, b))
    p = tmp_path / "mat_ilu.npz"
    save_matrix(p, h)
    h2 = load_matrix(p)
    assert h2.ilu_state is not None
    got = np.asarray(ast.ilu_smoother(h2, None, b))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_dist_trsm(rng):
    import jax.numpy as jnp

    from aoclsparse_tpu.parallel import make_mesh
    from aoclsparse_tpu.parallel.trsm import dist_trsm
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_form_for

    m, k = 48, 11
    ptr, ind, val, dense = random_csr(rng, m, m, density=0.3, ensure_diag=True)
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.upper)
    form = trsv_form_for(get_plan(A), descr, Operation.none)
    B = rng.standard_normal((m, k))
    mesh = make_mesh(8)
    X = dist_trsm(mesh, form, jnp.asarray(B))
    want = np.stack(
        [ref_trsv(1.0, m, ptr, ind, val, descr, Operation.none, B[:, j]) for j in range(k)],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(X), want, atol=1e-8)


def test_nan_checks_context():
    import jax.numpy as jnp

    from aoclsparse_tpu.utils.debug import nan_checks

    with nan_checks():
        with pytest.raises(FloatingPointError):
            _ = jnp.log(jnp.zeros(4) - 1.0).block_until_ready()
    # restored afterwards
    _ = jnp.log(jnp.zeros(4) - 1.0).block_until_ready()


def test_checkpoint_restored_ilu_level_engine(rng, tmp_path):
    """ilu_smoother(kid=1) on a checkpoint-restored handle rebuilds the
    effective triangles from lu_clean instead of crashing (the restored
    IluState carries no _eff_l/_eff_u)."""
    from aoclsparse_tpu.io.checkpoint import load_matrix, save_matrix
    from aoclsparse_tpu.solvers.ilu import ilu0_factorize

    m = 48
    dense = (rng.random((m, m)) < 0.1) * rng.standard_normal((m, m))
    np.fill_diagonal(dense, 4.0)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    A = ast.create_csr(m, m, ptr, ind, dense[dense != 0])
    ilu0_factorize(A)
    b = rng.standard_normal(m)
    p = tmp_path / "ck.npz"
    save_matrix(str(p), A)
    B = load_matrix(str(p))
    x0 = np.asarray(ast.ilu_smoother(A, None, b, kid=1))
    x1 = np.asarray(ast.ilu_smoother(B, None, b, kid=1))
    np.testing.assert_allclose(x1, x0, rtol=1e-12)
