"""Format-direct SpMV entry points + conversion query helpers.

Reference parity targets: aoclsparse_?csrmv/?ellmv/?elltmv/?ellthybmv/
?diamv/?bsrmv/?blkcsrmv (level2/), csr2ell_width / csr2ellthyb_width /
csr2dia_ndiag / csr2bsr_nnz / opt_blksize / csr2blkcsr
(conversion/aoclsparse_convert.cpp), itsol_handle_prn_options,
set_mv_hint_kid.
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import AoclSparseError, MatrixDescriptor, Operation, Status
from aoclsparse_tpu.convert.conversions import csr_to_bsr, csr_to_dia, csr_to_ell
from aoclsparse_tpu.core.formats import CSR
from aoclsparse_tpu.utils.reference import ref_mv
from aoclsparse_tpu.utils.tolerances import assert_allclose_spec


def _random_csr(rng, m, n, rmax, dtype=np.float64):
    lens = rng.integers(0, rmax + 1, m)
    ptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    cols = (
        np.concatenate([np.sort(rng.choice(n, k, replace=False)) for k in lens])
        if lens.sum()
        else np.zeros(0, np.int64)
    ).astype(np.int64)
    val = rng.standard_normal(int(lens.sum())).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        val = (val + 1j * rng.standard_normal(int(lens.sum()))).astype(dtype)
    dense = np.zeros((m, n), dtype)
    dense[np.repeat(np.arange(m), lens), cols] = val
    return ptr, cols, val, dense


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_csrmv_general_all_ops(rng):
    m, n = 37, 29
    ptr, cols, val, A = _random_csr(rng, m, n, 5)
    d = MatrixDescriptor()
    x, xm = rng.standard_normal(n), rng.standard_normal(m)
    y0 = rng.standard_normal(m)
    y = ast.csrmv(Operation.none, 1.5, m, n, len(val), val, cols, ptr, d, x, 2.0, y0)
    assert_allclose_spec(y, ref_mv(1.5, m, n, ptr, cols, val, d, Operation.none, x, 2.0, y0),
                         dtype=np.float64, scale=10)
    yt = ast.csrmv(Operation.transpose, 1.0, m, n, len(val), val, cols, ptr, d, xm, 0.0)
    assert_allclose_spec(yt, ref_mv(1.0, m, n, ptr, cols, val, d, Operation.transpose, xm, 0.0, np.zeros(n)),
                         dtype=np.float64, scale=10)


def test_csrmv_complex_conj_transpose(rng):
    m, n = 21, 21
    ptr, cols, val, A = _random_csr(rng, m, n, 4, np.complex128)
    d = MatrixDescriptor()
    xm = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    yh = ast.csrmv(
        Operation.conjugate_transpose, 1.0, m, n, len(val), val, cols, ptr, d, xm, 0.0
    )
    assert_allclose_spec(
        yh,
        ref_mv(1.0, m, n, ptr, cols, val, d, Operation.conjugate_transpose, xm, 0.0, np.zeros(n, np.complex128)),
        dtype=np.complex128, scale=10,
    )


def test_csrmv_symmetric_lower_upper(rng):
    m = 26
    # lower-triangle storage
    ptr, cols, val, T = _random_csr(rng, m, m, 4)
    keep = cols <= np.repeat(np.arange(m), np.diff(ptr))
    rows = np.repeat(np.arange(m), np.diff(ptr))[keep]
    cl, vl = cols[keep], val[keep]
    lens = np.bincount(rows, minlength=m)
    pl = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    L = np.zeros((m, m))
    L[rows, cl] = vl
    S = np.tril(L) + np.tril(L, -1).T
    x = rng.standard_normal(m)
    ds = MatrixDescriptor().with_(type=1)  # symmetric, lower
    want = ref_mv(1.0, m, m, pl, cl, vl, ds, Operation.none, x, 0.0, np.zeros(m))
    y = ast.csrmv(Operation.none, 1.0, m, m, len(vl), vl, cl, pl, ds, x, 0.0)
    assert_allclose_spec(y, want, dtype=np.float64, scale=10)
    np.testing.assert_allclose(want, S @ x, rtol=1e-12)  # oracle sanity
    # symmetric mv is symmetric: transpose matches
    yt = ast.csrmv(Operation.transpose, 1.0, m, m, len(vl), vl, cl, pl, ds, x, 0.0)
    assert_allclose_spec(yt, want, dtype=np.float64, scale=10)


def test_csrmv_rejects(rng):
    m, n = 8, 8
    ptr, cols, val, _ = _random_csr(rng, m, n, 3)
    d = MatrixDescriptor().with_(type=3)  # triangular -> not_implemented
    with pytest.raises(AoclSparseError) as e:
        ast.csrmv(Operation.none, 1.0, m, n, len(val), val, cols, ptr, d, np.ones(n), 0.0)
    assert e.value.status == Status.not_implemented
    ds = MatrixDescriptor().with_(type=1)
    with pytest.raises(AoclSparseError) as e:
        ast.csrmv(Operation.none, 1.0, m, n + 1, len(val), val, cols, ptr, ds, np.ones(n), 0.0)
    assert e.value.status == Status.invalid_size
    with pytest.raises(AoclSparseError) as e:
        ast.csrmv(Operation.none, 1.0, m, n, len(val), None, cols, ptr, MatrixDescriptor(), np.ones(n), 0.0)
    assert e.value.status == Status.invalid_pointer


def test_ellmv_and_elltmv(rng):
    m, n = 33, 40
    ptr, cols, val, A = _random_csr(rng, m, n, 6)
    E = csr_to_ell(CSR(ptr, cols, val, shape=(m, n)))
    d = MatrixDescriptor()
    x = rng.standard_normal(n)
    y = ast.ellmv(
        Operation.none, 2.0, m, n, len(val), np.asarray(E.val), np.asarray(E.ind), E.width, d, x, 0.0
    )
    assert_allclose_spec(y, 2.0 * A @ x, dtype=np.float64, scale=10)
    # slot-major twin
    yt = ast.elltmv(
        Operation.none,
        1.0,
        m,
        n,
        len(val),
        np.asarray(E.val).T.copy(),
        np.asarray(E.ind).T.copy(),
        E.width,
        d,
        x,
        0.0,
    )
    assert_allclose_spec(yt, A @ x, dtype=np.float64, scale=10)
    # legacy paths are general/none only (ellmv_t:237-247)
    with pytest.raises(AoclSparseError) as e:
        ast.ellmv(
            Operation.transpose, 1.0, m, n, len(val), np.asarray(E.val), np.asarray(E.ind), E.width, d, x, 0.0
        )
    assert e.value.status == Status.not_implemented


def test_ellthybmv(rng):
    m, n = 29, 31
    ptr, cols, val, A = _random_csr(rng, m, n, 7)
    em, ew = ast.csr2ellthyb_width(m, len(val), ptr)
    lens = np.diff(ptr)
    heavy = np.nonzero(lens > ew)[0].astype(np.int64)
    assert em == m - len(heavy)
    wv = np.zeros((ew, m))
    wi = np.zeros((ew, m), np.int64)
    for i in range(m):
        k = min(ew, lens[i])
        wv[:k, i] = val[ptr[i] : ptr[i] + k]
        wi[:k, i] = cols[ptr[i] : ptr[i] + k]
    d = MatrixDescriptor()
    x = rng.standard_normal(n)
    y0 = rng.standard_normal(m)
    y = ast.ellthybmv(
        Operation.none, 1.0, m, n, len(val), wv.reshape(-1), wi.reshape(-1), ew,
        em, val, ptr, cols, None, heavy, d, x, 3.0, y0,
    )
    assert_allclose_spec(y, A @ x + 3.0 * y0, dtype=np.float64, scale=10)


def test_diamv_bsrmv(rng):
    m, n = 24, 24
    ptr, cols, val, A = _random_csr(rng, m, n, 4)
    d = MatrixDescriptor()
    x = rng.standard_normal(n)
    D = csr_to_dia(CSR(ptr, cols, val, shape=(m, n)))
    y = ast.diamv(
        Operation.none, 1.0, m, n, len(val), np.asarray(D.val), np.asarray(D.dist), D.ndiag, d, x, 0.0
    )
    assert_allclose_spec(y, A @ x, dtype=np.float64, scale=10)
    B = csr_to_bsr(CSR(ptr, cols, val, shape=(m, n)), 4)
    y2 = ast.bsrmv(
        Operation.none, 1.0, B.mb, -(-n // 4), 4, np.asarray(B.val), np.asarray(B.ind), np.asarray(B.ptr), d, x, 0.0
    )
    assert_allclose_spec(y2[:m], A @ x, dtype=np.float64, scale=10)


def test_query_helpers(rng):
    m, n = 30, 26
    ptr, cols, val, _ = _random_csr(rng, m, n, 5)
    assert ast.csr2ell_width(m, len(val), ptr) == int(np.diff(ptr).max())
    # null row_ptr -> invalid_pointer even at m == 0 (reference has no m==0
    # early-out in csr2ell_width; csr2ellthyb_width does)
    with pytest.raises(AoclSparseError) as e0:
        ast.csr2ell_width(0, 0, None)
    assert e0.value.status == Status.invalid_pointer
    assert ast.csr2ellthyb_width(0, 0, None) == (0, 0)
    em, ew = ast.csr2ellthyb_width(m, len(val), ptr)
    assert em == int((np.diff(ptr) <= ew).sum())
    rows = np.repeat(np.arange(m), np.diff(ptr))
    assert ast.csr2dia_ndiag(m, n, len(val), ptr, cols) == len(np.unique(cols - rows))
    B = csr_to_bsr(CSR(ptr, cols, val, shape=(m, n)), 3)
    bp, bnnz = ast.csr2bsr_nnz(m, n, ptr, cols, 3)
    assert bnnz == B.nnzb
    np.testing.assert_array_equal(bp, np.asarray(B.ptr))
    with pytest.raises(AoclSparseError):
        ast.csr2ell_width(-1, 0, ptr)


def _blk_decode_dense(m, n, bptr, bcol, bval, masks, nrb):
    """Independent mask decode back to dense for the round-trip oracle:
    walk blocks in order, tracking the row group via the coarse row ptr."""
    A = np.zeros((m, n))
    vi = 0
    nblk = int(bptr[-1])
    grp_starts = bptr[::nrb]
    for b in range(nblk):
        g = int(np.searchsorted(grp_starts, b, side="right")) - 1
        for s in range(nrb):
            row = g * nrb + s
            msk = int(masks[b * nrb + s])
            for bit in range(8):
                if msk >> bit & 1:
                    A[row, int(bcol[b]) + bit] = bval[vi]
                    vi += 1
    return A


@pytest.mark.parametrize("nrb", [1, 2, 4])
def test_csr2blkcsr_roundtrip_and_mv(rng, nrb):
    m, n = 22, 19  # n not a multiple of 8: exercises the edge clamp to n-8
    ptr, cols, val, A = _random_csr(rng, m, n, 6)
    bptr, bcol, bval, masks = ast.csr2blkcsr(m, n, len(val), ptr, cols, val, nrb)
    Adec = _blk_decode_dense(m, n, bptr, bcol, np.asarray(bval), masks, nrb)
    np.testing.assert_array_equal(Adec, A)  # pure permutation: exact
    d = MatrixDescriptor()
    x = rng.standard_normal(n)
    y = ast.blkcsrmv(
        Operation.none, 1.0, m, n, len(val), masks, np.asarray(bval), bcol, bptr, d, x, 0.0, nRowsblk=nrb
    )
    assert_allclose_spec(y, A @ x, dtype=np.float64, scale=10)


def test_csr2blkcsr_rejects():
    with pytest.raises(AoclSparseError) as e:
        ast.csr2blkcsr(4, 4, 0, np.zeros(5, np.int64), np.zeros(0, np.int64), np.zeros(0), 2)
    assert e.value.status == Status.invalid_size  # n < 8
    with pytest.raises(AoclSparseError) as e:
        ast.csr2blkcsr(4, 16, 0, np.zeros(5, np.int64), np.zeros(0, np.int64), np.zeros(0), 3)
    assert e.value.status == Status.invalid_size  # nRowsblk not in {1,2,4}


def test_blkcsr_numpy_fallback_matches_native(rng):
    from aoclsparse_tpu.native import _blkcsr_numpy, available, blkcsr_build

    m, n = 18, 21
    ptr, cols, val, _ = _random_csr(rng, m, n, 5)
    for nrb in (1, 2, 4):
        got = _blkcsr_numpy(m, n, ptr, cols, nrb, build=True)
        if available():
            ref = blkcsr_build(m, n, ptr, cols, nrb)
            for a, b in zip(got, ref):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_opt_blksize_blocky_vs_scattered(rng):
    # dense 8-wide blocks aligned on a lattice: high utilization -> nonzero pick
    m = 64
    cols = np.concatenate([np.arange(8) + 8 * ((i // 4) % 4) for i in range(m)]).astype(np.int64)
    ptr = np.arange(m + 1, dtype=np.int64) * 8
    nrb, total = ast.opt_blksize(m, m * 8, ptr, cols)
    assert nrb in (2, 4) and total == m * 8 // (nrb * 8)
    # scattered singletons: utilization below cutoff -> 0
    cols2 = (np.arange(m, dtype=np.int64) * 37) % 500
    ptr2 = np.arange(m + 1, dtype=np.int64)
    assert ast.opt_blksize(m, m, ptr2, cols2)[0] == 0


def test_prn_options_and_mv_hint_kid(rng):
    h = ast.itsol_init()
    import io

    buf = io.StringIO()
    text = ast.itsol_handle_prn_options(h, file=buf)
    assert "iterative method" in text.lower() or len(text) > 0
    assert buf.getvalue().strip() == text.strip()
    # set_mv_hint_kid registers like set_mv_hint with a mandatory kid
    ptr, cols, val, _ = _random_csr(rng, 16, 16, 4)
    A = ast.create_csr(16, 16, ptr, cols, val)
    ast.set_mv_hint_kid(A, Operation.none, MatrixDescriptor(), 100, 0)
    ast.optimize(A)
    y = ast.mv(1.0, A, MatrixDescriptor(), Operation.none, np.ones(16), 0.0)
    assert y.shape == (16,)


def test_undersized_operands_rejected(rng):
    """JAX clamps out-of-range gathers, so the shims must catch short x/y
    explicitly (silent garbage otherwise)."""
    m, n = 12, 15
    ptr, cols, val, _ = _random_csr(rng, m, n, 4)
    d = MatrixDescriptor()
    with pytest.raises(AoclSparseError) as e:
        ast.csrmv(Operation.none, 1.0, m, n, len(val), val, cols, ptr, d, np.ones(n - 1), 0.0)
    assert e.value.status == Status.invalid_size
    with pytest.raises(AoclSparseError) as e:
        ast.csrmv(Operation.none, 1.0, m, n, len(val), val, cols, ptr, d, np.ones(n), 1.0, np.ones(m - 2))
    assert e.value.status == Status.invalid_size
    E = csr_to_ell(CSR(ptr, cols, val, shape=(m, n)))
    with pytest.raises(AoclSparseError) as e:
        ast.ellmv(Operation.none, 1.0, m, n, len(val), np.asarray(E.val), np.asarray(E.ind), E.width, d, np.ones(3), 0.0)
    assert e.value.status == Status.invalid_size


def test_opt_blksize_integer_nnzpr():
    """The reference computes nnzpr with integer division (nnz/m on ints):
    a mean row length in (30, 31) must not trip the nnzpr>30 cutoff."""
    from aoclsparse_tpu.convert.conversions import opt_blksize

    # m=8 rows of 30 nnz + 4 extra in the last row: nnz=244, nnz//m = 30
    m = 8
    lens = np.full(m, 30)
    lens[-1] += 4
    ptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    cols = np.concatenate([np.arange(k) for k in lens]).astype(np.int64)
    # contiguous columns -> high block utilization, passes the util cutoff
    nrb, total = opt_blksize(m, int(lens.sum()), ptr, cols)
    assert isinstance(nrb, int)  # must not early-return via the float-division branch


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64, np.complex128])
def test_csrmv_dtypes(rng, dtype):
    """s/d/c/z instantiations of the direct CSR kernel (the reference
    templates every format kernel over the four dtypes)."""
    m, n = 19, 23
    ptr, cols, val, A = _random_csr(rng, m, n, 4, dtype)
    d = MatrixDescriptor()
    x = rng.standard_normal(n).astype(dtype)
    y = ast.csrmv(Operation.none, 1.0, m, n, len(val), val, cols, ptr, d, x, 0.0)
    assert np.asarray(y).dtype == np.dtype(dtype)
    assert_allclose_spec(y, A @ x, dtype=dtype, scale=10)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64, np.complex128])
def test_ellmv_diamv_bsrmv_dtypes(rng, dtype):
    m = n = 20
    ptr, cols, val, A = _random_csr(rng, m, n, 4, dtype)
    d = MatrixDescriptor()
    x = rng.standard_normal(n).astype(dtype)
    E = csr_to_ell(CSR(ptr, cols, val, shape=(m, n)))
    y = ast.ellmv(Operation.none, 1.0, m, n, len(val), np.asarray(E.val), np.asarray(E.ind), E.width, d, x, 0.0)
    assert_allclose_spec(y, A @ x, dtype=dtype, scale=10)
    D = csr_to_dia(CSR(ptr, cols, val, shape=(m, n)))
    y2 = ast.diamv(Operation.none, 1.0, m, n, len(val), np.asarray(D.val), np.asarray(D.dist), D.ndiag, d, x, 0.0)
    assert_allclose_spec(y2, A @ x, dtype=dtype, scale=10)
    B = csr_to_bsr(CSR(ptr, cols, val, shape=(m, n)), 4)
    y3 = ast.bsrmv(Operation.none, 1.0, B.mb, -(-n // 4), 4, np.asarray(B.val), np.asarray(B.ind), np.asarray(B.ptr), d, x, 0.0)
    assert_allclose_spec(y3[:m], A @ x, dtype=dtype, scale=10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_blkcsrmv_dtypes(rng, dtype):
    m, n = 16, 24
    ptr, cols, val, A = _random_csr(rng, m, n, 5, dtype)
    bptr, bcol, bval, masks = ast.csr2blkcsr(m, n, len(val), ptr, cols, val, 2)
    d = MatrixDescriptor()
    x = rng.standard_normal(n).astype(dtype)
    y = ast.blkcsrmv(Operation.none, 1.0, m, n, len(val), masks, np.asarray(bval), bcol, bptr, d, x, 0.0, nRowsblk=2)
    assert_allclose_spec(y, A @ x, dtype=dtype, scale=10)


@pytest.mark.parametrize("base", [0, 1])
def test_csrmv_index_base(rng, base):
    """zero- and one-based column indices through the descriptor base."""
    m, n = 14, 17
    ptr, cols, val, A = _random_csr(rng, m, n, 4)
    d = MatrixDescriptor().with_(base=base)
    x = rng.standard_normal(n)
    y = ast.csrmv(Operation.none, 1.0, m, n, len(val), val, cols + base, ptr, d, x, 0.0)
    assert_allclose_spec(y, A @ x, dtype=np.float64, scale=10)
