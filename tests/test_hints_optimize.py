"""Planner hint/optimize tests (reference: hint_tests.cpp,
optimize_tests.cpp, optimize_symm_herm_tests.cpp): hint registration order,
optimize prebuilding the hinted forms, DOID copies for symm/herm hints,
KID hints, memory-policy interaction, and idempotent re-optimize."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import FillMode, MatrixType, MemoryPolicy, Status
from aoclsparse_tpu.planner.plan import get_plan

GEN = MatrixDescriptor()


def _mat(rng, m=32, density=0.3):
    dense = rng.standard_normal((m, m))
    dense[np.abs(dense) < (1 - density) * 1.8] = 0
    np.fill_diagonal(dense, 3.0)
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


def test_hint_prepends_and_optimize_marks_done(rng):
    A, _ = _mat(rng)
    ast.set_mv_hint(A, Operation.none, GEN, nop=100)
    ast.set_sv_hint(
        A,
        Operation.none,
        MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower),
    )
    # reference prepends hint nodes (csr_util.cpp:47)
    assert A.hints[0].action == "sv"
    assert A.hints[1].action == "mv"
    assert not any(h.done for h in A.hints)
    ast.optimize(A)
    assert all(h.done for h in A.hints)


def test_optimize_prebuilds_hinted_exec_form(rng):
    A, dense = _mat(rng)
    ast.set_mv_hint(A, Operation.none, GEN)
    ast.optimize(A)
    plan = get_plan(A)
    key_present = any(k[-1] is None for k in plan.exec_forms)
    assert key_present  # mv form cached before any mv call
    x = rng.standard_normal(A.shape[0])
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0))
    np.testing.assert_allclose(y, dense @ x, atol=1e-10)


def test_optimize_symm_hint_builds_effective_copy(rng):
    A, dense = _mat(rng)
    sym = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.upper)
    ast.set_mv_hint(A, Operation.none, sym)
    ast.optimize(A)
    plan = get_plan(A)
    keys = list(plan.effective.keys())
    assert any(k[0] == MatrixType.symmetric for k in keys)
    x = rng.standard_normal(A.shape[0])
    up = np.triu(dense)
    full = up + np.triu(up, 1).T
    y = np.asarray(ast.mv(1.0, A, sym, Operation.none, x, 0.0))
    np.testing.assert_allclose(y, full @ x, atol=1e-10)


def test_reoptimize_idempotent(rng):
    A, _ = _mat(rng)
    ast.set_mv_hint(A, Operation.none, GEN)
    ast.optimize(A)
    n_forms = len(get_plan(A).exec_forms)
    ast.optimize(A)  # second run must not rebuild or duplicate
    assert len(get_plan(A).exec_forms) == n_forms


def test_memory_hint_restricted_forces_segsum(rng):
    A, dense = _mat(rng)
    ast.set_memory_hint(A, MemoryPolicy.restricted)
    assert A.mem_policy == MemoryPolicy.restricted
    x = rng.standard_normal(A.shape[0])
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0))
    np.testing.assert_allclose(y, dense @ x, atol=1e-10)
    plan = get_plan(A)
    kinds = {f.kind for f in plan.exec_forms.values()}
    assert kinds <= {"segsum"}  # restricted policy: no padded copies


def test_kid_hint_recorded(rng):
    A, _ = _mat(rng)
    ast.set_mv_hint(A, Operation.none, GEN, kid=0)
    assert A.hints[0].kid == 0


def test_hint_invalid_descr_rejected(rng):
    A, _ = _mat(rng)
    bad = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower)
    # symmetric hints on rectangular matrices are rejected at op time;
    # descriptor validation errors surface from the hint setter
    with pytest.raises(ast.AoclSparseError):
        ast.set_mv_hint(None, Operation.none, bad)


def test_structure_change_invalidates_plan(rng):
    A, dense = _mat(rng)
    _ = ast.mv(1.0, A, GEN, Operation.none, np.ones(A.shape[0]), 0.0)
    assert A.plan is not None
    ast.order_mat(A)  # structural touch invalidates
    assert A.plan is None


def test_hint_validation_reference_table(rng):
    """set_hint validation parity (aoclsparse_set_hint, analysis.cpp:595-646):
    nop < 0 invalid; nop == 0 invalid unless an explicit kid is given;
    descriptor base must match the matrix base."""
    A = ast.create_csr(2, 2, np.array([0, 1, 2]), np.array([0, 1]), np.ones(2))
    with pytest.raises(AoclSparseError) as e:
        ast.set_mv_hint(A, Operation.none, MatrixDescriptor(), nop=-1)
    assert e.value.status == Status.invalid_value
    with pytest.raises(AoclSparseError) as e:
        ast.set_mv_hint(A, Operation.none, MatrixDescriptor(), nop=0)
    assert e.value.status == Status.invalid_value
    ast.set_mv_hint(A, Operation.none, MatrixDescriptor(), nop=0, kid=3)  # ok with kid
    with pytest.raises(AoclSparseError) as e:
        ast.set_sv_hint(A, Operation.none, MatrixDescriptor(base=1), nop=1)
    assert e.value.status == Status.invalid_value
