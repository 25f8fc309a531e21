"""Core layer tests: types, descriptor/doid, create/export, validation.

Modeled on the reference's create/export/copy/order/set_value/update_values
gtest suites (tests/unit_tests/createcsr_tests.cpp etc.): nullptr/size/base
error matrices become exception checks here.
"""

import numpy as np
import pytest

import aoclsparse_tpu as asp
from aoclsparse_tpu.core.descr import Doid, get_doid, trans_doid
from aoclsparse_tpu.utils.reference import csr_to_dense


def small_csr():
    # 4x4:  [[1,0,2,0],[0,3,0,0],[4,0,5,6],[0,7,0,8]]
    ptr = np.array([0, 2, 3, 6, 8], np.int32)
    ind = np.array([0, 2, 1, 0, 2, 3, 1, 3], np.int32)
    val = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.float64)
    return ptr, ind, val


class TestCreate:
    def test_create_csr_roundtrip(self):
        ptr, ind, val = small_csr()
        A = asp.create_csr(4, 4, ptr, ind, val)
        m, n, nnz, p2, i2, v2 = asp.export_csr(A)
        assert (m, n, nnz) == (4, 4, 8)
        np.testing.assert_array_equal(p2, ptr)
        np.testing.assert_array_equal(i2, ind)
        np.testing.assert_allclose(v2, val)

    def test_create_csr_one_base(self):
        ptr, ind, val = small_csr()
        A = asp.create_csr(4, 4, ptr + 1, ind + 1, val, base=asp.IndexBase.one)
        m, n, nnz, p2, i2, v2 = asp.export_csr(A)  # default: original base
        np.testing.assert_array_equal(p2, ptr + 1)
        np.testing.assert_array_equal(i2, ind + 1)
        m, n, nnz, p0, i0, _ = asp.export_csr(A, base=asp.IndexBase.zero)
        np.testing.assert_array_equal(p0, ptr)

    def test_invalid_ptr_start(self):
        ptr, ind, val = small_csr()
        ptr = ptr.copy()
        ptr[0] = 1
        with pytest.raises(asp.AoclSparseError) as e:
            asp.create_csr(4, 4, ptr, ind, val)
        assert e.value.status == asp.Status.invalid_value

    def test_invalid_index(self):
        ptr, ind, val = small_csr()
        ind = ind.copy()
        ind[3] = 9
        with pytest.raises(asp.AoclSparseError) as e:
            asp.create_csr(4, 4, ptr, ind, val)
        assert e.value.status == asp.Status.invalid_index_value

    def test_wrong_ptr_len(self):
        ptr, ind, val = small_csr()
        with pytest.raises(asp.AoclSparseError) as e:
            asp.create_csr(5, 4, ptr, ind, val)
        assert e.value.status == asp.Status.invalid_size

    def test_negative_size(self):
        with pytest.raises(asp.AoclSparseError):
            asp.create_coo(-1, 4, [], [], np.zeros(0))

    def test_create_coo(self):
        A = asp.create_coo(
            3, 3, [0, 1, 2, 0], [0, 1, 2, 2], np.array([1.0, 2.0, 3.0, 4.0])
        )
        m, n, nnz, ptr, ind, val = asp.export_csr(A)
        dense = csr_to_dense(m, n, ptr, ind, val)
        expect = np.array([[1, 0, 4], [0, 2, 0], [0, 0, 3]], dtype=np.float64)
        np.testing.assert_allclose(dense, expect)

    def test_create_csc(self):
        # dense [[1,0],[2,3]] as CSC: col0 = (1,2), col1 = (3)
        A = asp.create_csc(2, 2, [0, 2, 3], [0, 1, 1], np.array([1.0, 2.0, 3.0]))
        m, n, nnz, ptr, ind, val = asp.export_csr(A)
        dense = csr_to_dense(m, n, ptr, ind, val)
        np.testing.assert_allclose(dense, [[1, 0], [2, 3]])

    def test_create_bsr(self):
        # 2x2 blocks, mb=nb=2, blocks on diagonal
        blocks = np.arange(8, dtype=np.float64)
        A = asp.create_bsr(2, 2, 2, [0, 1, 2], [0, 1], blocks)
        m, n, nnz, ptr, ind, val = asp.export_csr(A)
        dense = csr_to_dense(m, n, ptr, ind, val)
        expect = np.zeros((4, 4))
        expect[:2, :2] = blocks[:4].reshape(2, 2)
        expect[2:, 2:] = blocks[4:].reshape(2, 2)
        np.testing.assert_allclose(dense, expect)

    def test_unsupported_dtype(self):
        with pytest.raises(asp.AoclSparseError) as e:
            asp.create_csr(1, 1, [0, 1], [0], np.array([1], dtype=np.int32))
        assert e.value.status == asp.Status.wrong_type


class TestAux:
    def test_set_value(self):
        ptr, ind, val = small_csr()
        A = asp.create_csr(4, 4, ptr, ind, val)
        asp.set_value(A, 2, 2, 99.0)
        _, _, _, _, _, v = asp.export_csr(A)
        assert v[4] == 99.0
        with pytest.raises(asp.AoclSparseError):
            asp.set_value(A, 0, 1, 5.0)  # not in pattern

    def test_set_value_refreshes_cached_plan(self):
        # regression: a plan built BEFORE set_value kept serving the old
        # value through its cached exec form
        from aoclsparse_tpu import MatrixDescriptor, Operation

        m = 16
        ptr = np.arange(m + 1, dtype=np.int64)
        A = asp.create_csr(
            m, m, ptr, np.arange(m, dtype=np.int32), np.arange(1.0, m + 1)
        )
        x = np.ones(m)
        y1 = np.asarray(asp.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0))
        assert y1[0] == 1.0
        asp.set_value(A, 0, 0, 100.0)
        y2 = np.asarray(asp.mv(1.0, A, MatrixDescriptor(), Operation.none, x, 0.0))
        assert y2[0] == 100.0

    def test_update_values(self):
        ptr, ind, val = small_csr()
        A = asp.create_csr(4, 4, ptr, ind, val)
        asp.update_values(A, val * 2)
        _, _, _, _, _, v = asp.export_csr(A)
        np.testing.assert_allclose(v, val * 2)
        with pytest.raises(asp.AoclSparseError):
            asp.update_values(A, val[:3])

    def test_order_mat(self):
        ptr = np.array([0, 3, 5], np.int32)
        ind = np.array([2, 0, 1, 1, 0], np.int32)
        val = np.arange(1.0, 6.0)
        A = asp.create_csr(2, 3, ptr, ind, val)
        asp.order_mat(A)
        _, _, _, p, i, v = asp.export_csr(A)
        np.testing.assert_array_equal(i, [0, 1, 2, 0, 1])
        np.testing.assert_allclose(v, [2, 3, 1, 5, 4])

    def test_copy_independent(self):
        ptr, ind, val = small_csr()
        A = asp.create_csr(4, 4, ptr, ind, val)
        B = asp.copy(A)
        asp.update_values(A, val * 3)
        _, _, _, _, _, vb = asp.export_csr(B)
        np.testing.assert_allclose(vb, val)

    def test_version(self):
        assert asp.get_version()


class TestDoid:
    def test_general(self):
        d = asp.GENERAL
        assert get_doid(d, asp.Operation.none, np.float64) == Doid.gn
        assert get_doid(d, asp.Operation.transpose, np.float64) == Doid.gt
        # real conj-transpose degrades to transpose
        assert get_doid(d, asp.Operation.conjugate_transpose, np.float64) == Doid.gt
        assert get_doid(d, asp.Operation.conjugate_transpose, np.complex128) == Doid.gh

    def test_symmetric_hermitian(self):
        sym = asp.MatrixDescriptor(type=asp.MatrixType.symmetric)
        assert get_doid(sym, asp.Operation.none, np.float64) == Doid.sl
        assert get_doid(sym.with_(fill_mode=asp.FillMode.upper), asp.Operation.none, np.float64) == Doid.su
        her = asp.MatrixDescriptor(type=asp.MatrixType.hermitian)
        # hermitian: A^H == A
        assert get_doid(her, asp.Operation.conjugate_transpose, np.complex128) == Doid.hl
        # real hermitian degrades to symmetric
        assert get_doid(her, asp.Operation.none, np.float64) == Doid.sl

    def test_triangular_and_trans(self):
        tri = asp.MatrixDescriptor(type=asp.MatrixType.triangular)
        assert get_doid(tri, asp.Operation.none, np.float64) == Doid.tln
        assert trans_doid(Doid.tln) == Doid.tut
        assert trans_doid(Doid.gn) == Doid.gt
        for d in Doid:
            assert trans_doid(trans_doid(d)) == d


class TestOrderCopyContract:
    """Reference taxonomy for order/copy (order_tests.cpp, copy_tests.cpp):
    null/format failures, no-op cases, per-format copies, plan-cache
    interplay (InputCsrIsOptimized)."""

    def test_order_null_matrix(self):
        with pytest.raises(asp.AoclSparseError) as ei:
            asp.order_mat(None)
        assert ei.value.status == asp.Status.invalid_pointer

    def test_order_coo_rejected(self):
        # order() is CSR/CSC-only in the reference (CooMatrixFailure)
        ind = np.array([0, 1], np.int32)
        A = asp.create_coo(2, 2, row=ind, col=ind, val=np.ones(2))
        with pytest.raises(asp.AoclSparseError) as ei:
            asp.order_mat(A)
        assert ei.value.status == asp.Status.not_implemented

    def test_order_empty_do_nothing(self):
        A = asp.create_csr(2, 2, np.zeros(3, np.int32), np.zeros(0, np.int32), np.zeros(0))
        asp.order_mat(A)  # DoNothing: no raise
        _, _, _, p, i, v = asp.export_csr(A)
        assert i.size == 0

    def test_order_sorted_is_stable(self):
        ptr = np.array([0, 2, 4], np.int32)
        ind = np.array([0, 1, 0, 1], np.int32)
        val = np.arange(1.0, 5.0)
        A = asp.create_csr(2, 2, ptr, ind, val)
        asp.order_mat(A)  # SortedCsrSuccess: already sorted stays put
        _, _, _, _, i, v = asp.export_csr(A)
        np.testing.assert_array_equal(i, ind)
        np.testing.assert_allclose(v, val)

    def test_order_one_nnz_rows(self):
        ptr = np.array([0, 1, 2, 3], np.int32)
        ind = np.array([2, 0, 1], np.int32)
        A = asp.create_csr(3, 3, ptr, ind, np.arange(1.0, 4.0))
        asp.order_mat(A)  # AllRowOneNnzSuc
        _, _, _, _, i, v = asp.export_csr(A)
        np.testing.assert_array_equal(i, ind)

    def test_order_invalidates_cached_plan(self):
        # InputCsrIsOptimized: ordering after optimize must not serve the
        # pre-order execution form
        from aoclsparse_tpu.planner.plan import get_plan
        from aoclsparse_tpu import MatrixDescriptor, Operation

        ptr = np.array([0, 2, 4], np.int32)
        ind = np.array([1, 0, 1, 0], np.int32)
        val = np.array([2.0, 1.0, 4.0, 3.0])
        A = asp.create_csr(2, 2, ptr, ind, val)
        y0 = asp.mv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(2), 0.0)
        asp.order_mat(A)
        y1 = asp.mv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(2), 0.0)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0))

    @pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64, np.complex128])
    def test_copy_csr_dtypes(self, dtype):
        ptr, ind, val = small_csr()
        val = val.astype(dtype)
        if np.issubdtype(dtype, np.complexfloating):
            val = val + 1j * val
        A = asp.create_csr(4, 4, ptr, ind, val)
        B = asp.copy(A)
        _, _, _, pb, ib, vb = asp.export_csr(B)
        np.testing.assert_allclose(vb, val)
        assert B.dtype == A.dtype

    def test_copy_csc_and_coo(self):
        # CopyCsc / CopyCoo: per-format copies round-trip through export
        ind = np.array([0, 1], np.int32)
        C = asp.create_coo(2, 2, row=ind, col=ind, val=np.array([1.0, 2.0]))
        C2 = asp.copy(C)
        _, _, _, r2, c2, v2 = asp.export_coo(C2)
        np.testing.assert_array_equal(r2, ind)
        np.testing.assert_allclose(v2, [1.0, 2.0])
        S = asp.create_csc(2, 2, np.array([0, 1, 2], np.int32), ind, np.array([3.0, 4.0]))
        S2 = asp.copy(S)
        _, _, _, p2, i2, w2 = asp.export_csc(S2)
        np.testing.assert_allclose(w2, [3.0, 4.0])

    def test_copy_null(self):
        with pytest.raises(asp.AoclSparseError) as ei:
            asp.copy(None)
        assert ei.value.status == asp.Status.invalid_pointer


class TestGeneratorAndDetection:
    """rng_tests.cpp analog: the test-matrix generator is reproducible, and
    creation detects sortedness / full-diagonal status (the reference's
    FD_STATUS/SRT_STATUS table)."""

    def test_random_csr_reproducible(self):
        from conftest import random_csr

        a = random_csr(np.random.default_rng(42), 20, 20, density=0.3)
        b = random_csr(np.random.default_rng(42), 20, 20, density=0.3)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_sort_detection(self):
        from aoclsparse_tpu.core.types import MatrixSort

        ptr = np.array([0, 2, 4], np.int32)
        A = asp.create_csr(2, 3, ptr, np.array([0, 2, 1, 2], np.int32), np.arange(4.0))
        assert A.sort == MatrixSort.fully_sorted
        B = asp.create_csr(2, 3, ptr, np.array([2, 0, 1, 2], np.int32), np.arange(4.0))
        assert B.sort == MatrixSort.unsorted

    def test_fulldiag_detection(self):
        ptr = np.array([0, 2, 3], np.int32)
        A = asp.create_csr(2, 2, ptr, np.array([0, 1, 1], np.int32), np.arange(3.0))
        assert A.fulldiag is True
        B = asp.create_csr(2, 2, ptr, np.array([0, 1, 0], np.int32), np.arange(3.0))
        assert B.fulldiag is False
