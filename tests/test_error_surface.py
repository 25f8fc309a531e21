"""Systematic error-surface sweep (the reference's per-op nullptr/size/base
case matrices, e.g. csrmv_tests.cpp:40-80 pattern): every public entry point
rejects malformed input with the documented Status."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation, Status
from aoclsparse_tpu.core.types import (
    DiagType,
    FillMode,
    MatrixType,
    Order,
    Request,
    SorType,
)

GEN = MatrixDescriptor()


@pytest.fixture
def A5(rng):
    dense = np.eye(5) * 2.0
    dense[0, 2] = 1.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    return ast.create_csr(5, 5, ptr, np.nonzero(dense)[1].astype(np.int32), dense[dense != 0])


def _status(fn, *args, **kw):
    with pytest.raises(AoclSparseError) as e:
        fn(*args, **kw)
    return e.value.status


def test_mv_null_matrix(A5):
    assert _status(ast.mv, 1.0, None, GEN, Operation.none, np.ones(5), 0.0) == Status.invalid_pointer


def test_mv_null_descr(A5):
    assert _status(ast.mv, 1.0, A5, None, Operation.none, np.ones(5), 0.0) == Status.invalid_pointer


def test_mv_bad_x_size(A5):
    assert _status(ast.mv, 1.0, A5, GEN, Operation.none, np.ones(4), 0.0) == Status.invalid_size


def test_mv_bad_y_size(A5):
    assert (
        _status(ast.mv, 1.0, A5, GEN, Operation.none, np.ones(5), 1.0, y=np.ones(4))
        == Status.invalid_size
    )


def test_mm_bad_b_rows(A5):
    assert (
        _status(ast.mm, 1.0, A5, GEN, Operation.none, np.ones((4, 3)), 0.0)
        == Status.invalid_size
    )


def test_mm_bad_c_shape(A5):
    assert (
        _status(ast.mm, 1.0, A5, GEN, Operation.none, np.ones((5, 3)), 1.0, C=np.ones((5, 2)))
        == Status.invalid_size
    )


def test_mm_b_not_2d(A5):
    assert _status(ast.mm, 1.0, A5, GEN, Operation.none, np.ones(5), 0.0) == Status.invalid_size


def test_trsv_general_descr_rejected(A5):
    assert (
        _status(ast.trsv, 1.0, A5, GEN, Operation.none, np.ones(5)) == Status.invalid_value
    )


def test_trsv_bad_b(A5):
    tri = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    assert _status(ast.trsv, 1.0, A5, tri, Operation.none, np.ones(4)) == Status.invalid_size


def test_trsv_strided_bad_stride(A5):
    tri = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    assert (
        _status(ast.trsv_strided, 1.0, A5, tri, Operation.none, np.ones(20), 0)
        == Status.invalid_size
    )


def test_trsm_bad_B(A5):
    tri = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
    assert (
        _status(ast.trsm, 1.0, A5, tri, Operation.none, np.ones((4, 2))) == Status.invalid_size
    )


def test_sp2m_null_handles(A5):
    assert (
        _status(ast.sp2m, Operation.none, GEN, None, Operation.none, GEN, A5)
        == Status.invalid_pointer
    )


def test_sp2m_dim_mismatch(rng, A5):
    dense = np.eye(4)
    ptr = np.arange(5, dtype=np.int64)
    B = ast.create_csr(4, 4, ptr, np.arange(4, dtype=np.int32), np.ones(4))
    assert (
        _status(ast.sp2m, Operation.none, GEN, A5, Operation.none, GEN, B)
        == Status.invalid_size
    )


def test_sp2m_finalize_without_plan(A5):
    assert (
        _status(
            ast.sp2m, Operation.none, GEN, A5, Operation.none, GEN, A5, Request.finalize, None
        )
        == Status.invalid_value
    )


def test_syrkd_alpha_beta_lower_untouched_nonsquare_ok(rng):
    # rectangular A: syrkd produces (m, m); wrong C shape must raise
    dense = np.ones((3, 2))
    ptr = np.array([0, 2, 4, 6], np.int64)
    A = ast.create_csr(3, 2, ptr, np.tile([0, 1], 3).astype(np.int32), dense[dense != 0])
    out = np.asarray(ast.syrkd(Operation.none, A, 1.0, 0.0))
    assert out.shape == (3, 3)


def test_level1_bad_sizes():
    assert _status(ast.doti, np.ones(3), np.array([0, 1], np.int32), np.ones(5)) in (
        Status.invalid_size,
        Status.invalid_pointer,
    )
    assert _status(ast.gthr, np.ones(3), np.array([0, 9], np.int32)) in (
        Status.invalid_size,
        Status.invalid_index_value,
    )


def test_sctr_out_of_range():
    assert _status(
        ast.sctr, np.ones(2), np.array([0, 7], np.int32), np.zeros(4)
    ) == Status.invalid_index_value


def test_create_csr_corrupt_ptr():
    assert (
        _status(ast.create_csr, 3, 3, np.array([0, 2, 1, 3]), np.zeros(3, np.int32), np.ones(3))
        == Status.invalid_value
    )


def test_create_bsr_bad_block_dim():
    assert (
        _status(ast.create_bsr, 2, 2, 0, np.array([0, 1, 2]), np.zeros(2, np.int32), np.ones(2))
        == Status.invalid_size
    )


def test_create_coo_bad_row():
    assert (
        _status(
            ast.create_coo, 3, 3, np.array([0, 5]), np.array([0, 1]), np.ones(2)
        )
        == Status.invalid_index_value
    )


def test_set_value_outside_pattern(A5):
    assert _status(ast.set_value, A5, 1, 0, 9.0) == Status.invalid_index_value


def test_update_values_wrong_len(A5):
    assert _status(ast.update_values, A5, np.ones(3)) == Status.invalid_size


def test_sorv_error_table(A5, rng):
    b = np.ones(5)
    x = np.ones(5)
    assert _status(ast.sorv, SorType.backward, GEN, A5, 1.0, 1.0, x, b) == Status.not_implemented
    assert _status(ast.sorv, SorType.symmetric, GEN, A5, 1.0, 1.0, x, b) == Status.not_implemented
    sym = MatrixDescriptor(type=MatrixType.symmetric, fill_mode=FillMode.lower)
    assert _status(ast.sorv, SorType.forward, sym, A5, 1.0, 1.0, x, b) == Status.not_implemented
    assert _status(ast.sorv, SorType.forward, GEN, None, 1.0, 1.0, x, b) == Status.invalid_pointer
    assert _status(ast.sorv, SorType.forward, GEN, A5, 1.0, 1.0, np.ones(4), b) == Status.invalid_size


def test_symgs_error_table(A5):
    b = np.ones(5)
    unit = MatrixDescriptor(
        type=MatrixType.symmetric, fill_mode=FillMode.lower, diag_type=DiagType.unit
    )
    assert _status(ast.symgs, Operation.none, A5, unit, 1.0, b) == Status.not_implemented
    assert _status(ast.symgs, Operation.none, None, GEN, 1.0, b) == Status.invalid_pointer
    assert (
        _status(ast.symgs, Operation.conjugate_transpose, A5, GEN, 1.0, b)
        == Status.not_implemented
    )


def test_ilu_smoother_error_table(A5):
    assert _status(ast.ilu_smoother, A5, GEN, None) == Status.invalid_pointer
    assert (
        _status(ast.ilu_smoother, A5, GEN, np.ones(5), op=Operation.transpose)
        == Status.not_implemented
    )


def test_itsol_error_table(A5):
    h = ast.itsol_init(np.float64)
    # solve before rci_input
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_rci_solve(h)
    assert e.value.status == Status.invalid_value
    # wrong b size at input
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_rci_input(h, 5, np.ones(4))
    assert e.value.status == Status.invalid_size
    # unknown option
    with pytest.raises(AoclSparseError):
        ast.itsol_option_set(h, "no such option", 1)
    # non-square A in forward solve
    dense = np.ones((2, 3))
    ptr = np.array([0, 3, 6], np.int64)
    R = ast.create_csr(2, 3, ptr, np.tile(np.arange(3, dtype=np.int32), 2), dense[dense != 0])
    with pytest.raises(AoclSparseError) as e:
        ast.itsol_solve(h, 2, R, GEN, np.ones(2))
    assert e.value.status == Status.invalid_size


def test_convert_format_bad_target(A5):
    with pytest.raises((AoclSparseError, ValueError)):
        ast.convert_format(A5, 99)


def test_export_base_restoration(A5):
    m, n, nnz, ptr, ind, val = ast.export_csr(A5, base=1)
    assert ptr[0] == 1 and ind.min() >= 1


@pytest.mark.parametrize(
    "fn_name",
    [
        "export_csr",
        "export_csc",
        "export_coo",
        "convert_format",
        "update_values",
        "set_value",
        "optimize",
        "copy",
        "order_mat",
    ],
)
def test_null_handle_invalid_pointer(fn_name):
    """Every handle-taking entry point surfaces invalid_pointer on a null
    matrix (the reference's universal `if(!mat) return invalid_pointer`
    prologue) — never a raw Python AttributeError."""
    import inspect

    fn = getattr(ast, fn_name)
    sig = inspect.signature(fn)
    nargs = sum(
        1
        for p in sig.parameters.values()
        if p.default is inspect.Parameter.empty
        and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    )
    with pytest.raises(ast.AoclSparseError) as ei:
        fn(*([None] * nargs))
    assert ei.value.status == Status.invalid_pointer


def test_destroy_null_is_noop():
    """destroy(NULL) is a success no-op (auxiliary.cpp:654-658)."""
    assert ast.destroy(None) is None


def test_null_op_arguments_invalid_pointer(A5):
    """trsv/trsm/sorv/ilu_smoother null-argument prologue (reference
    *_tests.cpp NullArg cases)."""
    from aoclsparse_tpu.core.types import SorType

    D = MatrixDescriptor()
    x = np.ones(5)
    for thunk in (
        lambda: ast.trsv(1.0, None, D, Operation.none, x),
        lambda: ast.trsv(1.0, A5, D, Operation.none, None),
        lambda: ast.trsm(1.0, None, D, Operation.none, np.ones((5, 2))),
        lambda: ast.trsm(1.0, A5, D, Operation.none, None),
        lambda: ast.sorv(SorType.forward, D, None, 1.0, 1.0, x, x),
        lambda: ast.ilu_smoother(None, D, x),
        lambda: ast.ilu_smoother(A5, D, None),
    ):
        with pytest.raises(AoclSparseError) as ei:
            thunk()
        assert ei.value.status == Status.invalid_pointer


def test_dense_output_c_shape_checks(A5):
    """syrkd/sp2md/syprd validate the caller's C shape with invalid_size
    (reference WrongSize taxonomy) instead of leaking a broadcast error."""
    bad = np.ones((3, 3))
    D = MatrixDescriptor()
    for thunk in (
        lambda: ast.syrkd(Operation.none, A5, 1.0, 1.0, bad),
        lambda: ast.sp2md(Operation.none, D, A5, Operation.none, D, A5, 1.0, 1.0, bad),
        lambda: ast.syprd(Operation.none, A5, np.eye(5), 1.0, 1.0, bad),
    ):
        with pytest.raises(AoclSparseError) as ei:
            thunk()
        assert ei.value.status == Status.invalid_size
