"""Precision-policy error-bound battery (VERDICT r3 item 1b).

The bf16-multiply/f32-accumulate mode (set_precision_mode(A, "mixed"))
carries the headline bench when it wins; this battery is what makes that
honest: for every matrix class the policy serves, the mixed-mode mv must
stay within the reference's own bench-check tolerance model
(utils/tolerances.is_near: expected_precision scale 10, <=4x relaxation,
aoclsparse_check.hpp:36-122) against the f64 dense oracle, and a
documented absolute error model (~sqrt(k)*2^-9 relative for k products
per row) must hold with margin.
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.utils.tolerances import expected_precision, is_near

GEN = MatrixDescriptor()


def _mk(rng, r, c, m, scale=1.0):
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    keep = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
    r, c = r[keep], c[keep]
    dr = np.setdiff1d(np.arange(m), r[c == r])
    r = np.concatenate([r, dr])
    c = np.concatenate([c, dr])
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    v = (rng.standard_normal(r.size) * scale).astype(np.float32)
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, r + 1, 1)
    return ast.create_csr(m, m, np.cumsum(ptr), c.astype(np.int32), v), (r, c, v)


def _profiles(rng, m):
    # band (cant-class)
    rows = np.repeat(np.arange(m), 8)
    cols = np.clip(rows + rng.integers(-16, 17, rows.size), 0, m - 1)
    yield "band", rows, cols
    # circuit-class: local + hubs + scatter
    rows = np.repeat(np.arange(m), 4)
    cols = np.clip(rows + rng.integers(-8, 9, rows.size), 0, m - 1)
    hubs = rng.choice(m, 8, replace=False)
    hr = rng.integers(0, m, m // 8)
    yield "circuit", np.concatenate([rows, hr]), np.concatenate(
        [cols, hubs[rng.integers(0, 8, hr.size)]]
    )
    # web-class: power-lawish
    rows = rng.integers(0, m, 6 * m)
    cols = np.clip(rows + rng.integers(-64, 65, rows.size), 0, m - 1)
    yield "web", rows, cols


@pytest.mark.parametrize("profile", ["band", "circuit", "web"])
def test_mixed_mode_within_reference_tolerance(rng, profile):
    m = 2048
    for name, r, c in _profiles(rng, m):
        if name == profile:
            break
    A, (rr, cc, vv) = _mk(rng, r, c, m)
    dense = np.zeros((m, m), np.float64)
    dense[rr, cc] = vv.astype(np.float64)
    x = rng.standard_normal(m).astype(np.float32)
    want = dense @ x.astype(np.float64)

    ast.set_precision_mode(A, "mixed")
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0)).astype(np.float64)
    # the reference bench-check model must accept the mixed result
    assert is_near(y, want, dtype=np.float32), (
        f"{profile}: mixed-mode mv outside the reference tolerance model"
    )
    # documented error model: |err| <= C * sqrt(k) * 2^-9 * ||row|| * ||x||
    k = max(int(np.diff(np.asarray(A.data.ptr)).max()), 1)
    scale_bound = (
        4.0 * np.sqrt(k) * 2.0**-9 * np.abs(dense).max() * np.abs(x).max() * np.sqrt(k)
    )
    assert np.abs(y - want).max() <= scale_bound

    # "full" mode must be strictly tighter than mixed
    ast.set_precision_mode(A, "full")
    y32 = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0)).astype(np.float64)
    tol32 = expected_precision(np.float32, 10.0)
    denom = np.maximum(np.abs(want), 1.0)
    assert (np.abs(y32 - want) / denom).max() <= 4 * tol32


def test_precision_mode_validation(rng):
    A, _ = _mk(rng, np.arange(16), np.arange(16), 16)
    with pytest.raises(ast.AoclSparseError):
        ast.set_precision_mode(A, "bf16")  # not a mode name
    with pytest.raises(ast.AoclSparseError):
        ast.set_precision_mode(None, "mixed")
    # f64 operands never go mixed (gate is dtype-aware)
    ast.set_precision_mode(A, "mixed")
    assert A.precision_mode == "mixed"
