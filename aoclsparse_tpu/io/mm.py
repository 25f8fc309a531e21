"""MatrixMarket I/O.

Reference: the bench harness's .mtx reader (tests/include/aoclsparse_init.hpp:
451-744) feeding the SuiteSparse matrix suite (tests/benchmarks/matrices/
matrixlist). Supports coordinate real/integer/complex/pattern with
general/symmetric/hermitian/skew-symmetric storage, plus array (dense) files;
symmetric variants are expanded to the full pattern like the reference
reader does.
"""

from __future__ import annotations

import gzip
from pathlib import Path
from typing import Tuple

import numpy as np

from ..core.formats import COO
from ..core.matrix import SparseMatrix
from ..core.types import AoclSparseError, FormatType, Status
from ..convert.conversions import coo_to_csr

__all__ = ["read_mtx", "read_mtx_arrays", "write_mtx"]


def _open(path):
    p = Path(path)
    if p.suffix == ".gz":
        return gzip.open(p, "rt")
    return open(p, "r")


def read_mtx_arrays(path) -> Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a MatrixMarket file into (m, n, row, col, val) COO arrays
    (zero-based, symmetry expanded)."""
    return _read_mm_coo(path)


def _parse_token_stream(text: str) -> np.ndarray:
    """One C-level parse of a uniform whitespace-separated float stream —
    ~50x np.loadtxt's line loop at SuiteSparse scale (pwtk: 11.5M
    entries). np.fromstring's text mode is deprecated (ADVICE r4); keep
    it as the fast path while it exists, with a supported fallback."""
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            return np.fromstring(text, dtype=np.float64, sep=" ")
    except Exception:
        return np.array(text.split(), dtype=np.float64)


def _read_mm_coo(path):
    with _open(path) as f:
        header = f.readline().strip().split()
        if len(header) < 4 or header[0] != "%%MatrixMarket" or header[1].lower() != "matrix":
            raise AoclSparseError(Status.invalid_value, f"bad MatrixMarket header in {path}")
        fmt = header[2].lower()  # coordinate | array
        field = header[3].lower()  # real | integer | complex | pattern
        sym = header[4].lower() if len(header) > 4 else "general"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = line.split()
        if fmt == "coordinate":
            m, n, nnz = int(dims[0]), int(dims[1]), int(dims[2])
            width = {"pattern": 2, "complex": 4}.get(field, 3)
            if nnz:
                # fast path: the body of a coordinate file is a uniform
                # whitespace-separated token stream — one C-level parse of
                # the remaining text is ~50x np.loadtxt's line loop on the
                # SuiteSparse-scale files (pwtk: 11.5M entries)
                flat = _parse_token_stream(f.read())
                if flat.size != nnz * width:
                    raise AoclSparseError(
                        Status.invalid_value,
                        f"expected {nnz} x {width} tokens, got {flat.size}",
                    )
                data = flat.reshape(nnz, width)
            else:
                data = np.zeros((0, 3))
            row = data[:, 0].astype(np.int64) - 1
            col = data[:, 1].astype(np.int64) - 1
            if field == "pattern":
                val = np.ones(nnz, dtype=np.float64)
            elif field == "complex":
                val = data[:, 2] + 1j * data[:, 3]
            else:
                val = data[:, 2]
        elif fmt == "array":
            m, n = int(dims[0]), int(dims[1])
            flat = np.loadtxt(f, dtype=np.float64)
            if field == "complex":
                flat = flat[:, 0] + 1j * flat[:, 1]
            else:
                flat = np.asarray(flat).reshape(-1)
            if sym == "general":
                dense = flat.reshape(n, m).T  # column-major file order
            else:
                # file stores the lower triangle (incl. diag) in column order
                rows_l, cols_l = np.tril_indices(m)
                order = np.lexsort((rows_l, cols_l))
                dense = np.zeros((m, n), dtype=flat.dtype)
                dense[rows_l[order], cols_l[order]] = flat
                mirror = np.tril(dense, -1).T
                if sym == "hermitian":
                    mirror = np.conj(mirror)
                elif sym == "skew-symmetric":
                    mirror = -mirror
                dense = dense + mirror
            row, col = np.nonzero(dense)
            return m, n, row, col, dense[row, col]
        else:
            raise AoclSparseError(Status.not_implemented, f"format '{fmt}'")
    if sym != "general":
        row, col, val = _expand_sym(m, n, row, col, val, sym)
    return m, n, row, col, val


def _expand_sym(m, n, row, col, val, sym):
    off = row != col
    r2, c2, v2 = col[off], row[off], val[off]
    if sym == "hermitian":
        v2 = np.conj(v2)
    elif sym == "skew-symmetric":
        v2 = -v2
    return (
        np.concatenate([row, r2]),
        np.concatenate([col, c2]),
        np.concatenate([val, v2]),
    )


def read_mtx(path, dtype=None) -> SparseMatrix:
    """Load a .mtx(.gz) file as a CSR SparseMatrix handle."""
    m, n, row, col, val = read_mtx_arrays(path)
    if dtype is not None:
        val = val.astype(dtype)
    coo = COO(row.astype(np.int32), col.astype(np.int32), val, shape=(m, n))
    return SparseMatrix(coo_to_csr(coo, sum_duplicates=True), FormatType.csr)


def write_mtx(path, h: SparseMatrix) -> None:
    """Write a handle's CSR data as coordinate real/complex general."""
    from ..convert.conversions import to_coo

    A = to_coo(h.data)
    val = np.asarray(A.val)
    cplx = np.iscomplexobj(val)
    with open(path, "w") as f:
        field = "complex" if cplx else "real"
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        f.write(f"{A.m} {A.n} {A.nnz}\n")
        row = np.asarray(A.row, dtype=np.float64) + 1
        col = np.asarray(A.col, dtype=np.float64) + 1
        # one vectorized savetxt call instead of a per-entry format loop
        # (SuiteSparse-scale files have 10M+ entries)
        if cplx:
            np.savetxt(
                f,
                np.column_stack([row, col, val.real, val.imag]),
                fmt="%d %d %.17g %.17g",
            )
        else:
            np.savetxt(f, np.column_stack([row, col, val]), fmt="%d %d %.17g")
