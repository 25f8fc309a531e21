"""Native host-kernel tests: C++ vs numpy fallback vs oracle parity for
ILU0, level scheduling, symbolic SpGEMM counts."""

import numpy as np
import pytest

import aoclsparse_tpu.native as native
from aoclsparse_tpu.utils.reference import ref_ilu0

from conftest import random_csr


def test_native_builds():
    # the toolchain is present in this image; the native path must load
    assert native.available()


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64, np.complex128])
def test_ilu0_native_matches_oracle(rng, dtype):
    m = 25
    ptr, ind, val, dense = random_csr(rng, m, m, dtype=dtype, ensure_diag=True)
    lu, diag = native.ilu0_factor(m, ptr, ind, val)
    want, want_diag = ref_ilu0(m, ptr, ind, val)
    tol = 1e-4 if np.dtype(dtype).itemsize <= 8 and np.dtype(dtype).kind != "f" or dtype == np.float32 else 1e-10
    np.testing.assert_allclose(lu, want, rtol=5e-4 if dtype in (np.float32, np.complex64) else 1e-10)
    np.testing.assert_array_equal(diag, want_diag)


def test_ilu0_numpy_fallback_matches(rng):
    m = 20
    ptr, ind, val, dense = random_csr(rng, m, m, ensure_diag=True)
    lu_native, _ = native.ilu0_factor(m, ptr, ind, val)
    lu_np, _ = native._ilu0_numpy(m, ptr, ind, val)
    np.testing.assert_allclose(lu_np, lu_native, rtol=1e-12)


def test_ilu0_errors(rng):
    ptr = np.array([0, 1, 2])
    ind = np.array([0, 0])
    with pytest.raises(ValueError, match="missing_diag:1"):
        native.ilu0_factor(2, ptr, ind, np.array([1.0, 1.0]))
    ptr = np.array([0, 1, 3])
    ind = np.array([0, 0, 1])
    with pytest.raises(ValueError, match="zero_pivot:0"):
        native.ilu0_factor(2, ptr, ind, np.array([0.0, 1.0, 1.0]))


def test_level_schedule_tridiag():
    # tridiagonal lower: row i depends on i-1 -> m levels
    m = 6
    ptr = [0]
    ind = []
    for i in range(m):
        cols = [i - 1, i] if i else [i]
        ind += cols
        ptr.append(len(ind))
    levels, nlev = native.level_schedule(m, np.asarray(ptr), np.asarray(ind))
    assert nlev == m
    np.testing.assert_array_equal(levels, np.arange(m))


def test_level_schedule_diagonal():
    m = 5
    ptr = np.arange(m + 1)
    ind = np.arange(m)
    levels, nlev = native.level_schedule(m, ptr, ind)
    assert nlev == 1
    assert levels.sum() == 0


def test_spgemm_nnz_matches_dense(rng):
    mA, k, nB = 12, 9, 11
    ptrA, indA, valA, dA = random_csr(rng, mA, k, density=0.3)
    ptrB, indB, valB, dB = random_csr(rng, k, nB, density=0.3)
    Cptr, total = native.spgemm_nnz(mA, nB, ptrA, indA, ptrB, indB)
    pattern = (np.abs(dA) @ np.abs(dB)) != 0
    assert total == int(pattern.sum())
    np.testing.assert_array_equal(np.diff(Cptr), pattern.sum(axis=1))
