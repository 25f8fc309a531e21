"""Public iteration-resident operator (ops/level2/mv.py mv_operator):
space round-trip identity, chained-iteration parity with plain mv, and
the permuted-space route on a gen-composite operand."""

import numpy as np

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation

GEN = MatrixDescriptor()


def _banded(rng, m, hb, k):
    dense = np.zeros((m, m))
    for i in range(m):
        js = np.clip(i + rng.integers(-hb, hb + 1, k), 0, m - 1)
        dense[i, js] = rng.standard_normal(js.size)
        dense[i, i] = 4.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))])
    return (
        ast.create_csr(m, m, ptr, np.nonzero(dense)[1].astype(np.int32),
                       dense[dense != 0].astype(np.float32)),
        dense,
    )


def test_operator_matches_mv_banded(rng):
    m = 512
    A, dense = _banded(rng, m, 6, 4)
    opr = ast.mv_operator(A)
    x = rng.standard_normal(m).astype(np.float32)
    xs = opr.to_space(x)
    y = np.asarray(opr.from_space(opr.apply(xs)))
    want = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0))
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_operator_power_iteration_parity(rng):
    """A 5-step x <- Ax/||Ax|| chain through the operator equals the plain
    mv chain (permutes hoisted, symmetric permutation preserves norms)."""
    m = 1024
    # scramble-ish: hidden permutation of a band forces the gen form
    A, dense = _banded(rng, m, 8, 6)
    x0 = rng.standard_normal(m).astype(np.float32)

    opr = ast.mv_operator(A)
    xs = opr.to_space(x0)
    for _ in range(5):
        ys = opr.apply(xs)
        nrm = np.linalg.norm(np.asarray(ys))
        xs = ys / nrm
    got = np.asarray(opr.from_space(xs))

    x = x0
    for _ in range(5):
        y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0))
        x = y / np.linalg.norm(y)
    np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-5)


def test_operator_identity_spaces_for_band(rng):
    m = 256
    A, _ = _banded(rng, m, 4, 3)
    opr = ast.mv_operator(A)
    x = rng.standard_normal(m).astype(np.float32)
    if opr.space == "original":
        np.testing.assert_array_equal(np.asarray(opr.to_space(x)), x)
