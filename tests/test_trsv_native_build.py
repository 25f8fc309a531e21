"""Native (C++) blocked win-form builder parity vs the numpy path
(planner/triangular.py build_trsv_form_native vs build_trsv_form):
bit-identical D/Lval/WL/nblk for every (fill, diag) over band and random
structures, refresh-map equivalence (native maps index CLEAN positions),
and agreement on when the win form is inapplicable."""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType
from aoclsparse_tpu.planner.plan import build_effective_csr, get_plan
from aoclsparse_tpu.planner.triangular import build_trsv_form, build_trsv_form_native


def _make(rng, m, kind, dtype):
    if kind == "rand":
        dense = rng.standard_normal((m, m)) * (rng.random((m, m)) < (0.15 if m < 100 else 0.03))
        np.fill_diagonal(dense, rng.standard_normal(m) + 5.0)
    else:
        dense = np.zeros((m, m))
        for i in range(m):
            js = np.clip(i + rng.integers(-24, 25, 6), 0, m - 1)
            dense[i, js] = rng.standard_normal(js.size)
            dense[i, i] = 6.0
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0].astype(dtype))


@pytest.mark.parametrize(
    "m,kind,dtype",
    [(97, "rand", np.float64), (400, "rand", np.float32), (1000, "band", np.float64)],
)
def test_native_build_matches_numpy(rng, m, kind, dtype):
    from aoclsparse_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    A = _make(rng, m, kind, dtype)
    clean = get_plan(A).clean
    hostv = np.asarray(clean.val)
    nb = 32
    for fill in (FillMode.lower, FillMode.upper):
        for dt in (DiagType.unit, DiagType.non_unit):
            d = MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=dt)
            nat = build_trsv_form_native(clean, d, Operation.none, ("t",), nb, hostv)
            eff = build_effective_csr(clean, d, Operation.none)
            ref = build_trsv_form(clean, d, Operation.none, ("t",), eff, nb)
            if nat is None:
                # native declines exactly when the numpy path would not
                # pick the win layout either
                assert ref.kind != "win"
                continue
            assert ref.kind == "win"
            assert (nat.WL, nat.nblk, nat.reversed_) == (ref.WL, ref.nblk, ref.reversed_)
            assert np.array_equal(np.asarray(nat.D), np.asarray(ref.D))
            assert np.array_equal(np.asarray(nat.Lval), np.asarray(ref.Lval))
            # refresh through the clean-position maps: true entries scale,
            # the implicit unit diagonal stays exactly 1.0
            src = np.asarray(eff.src)
            effv2 = np.where(src >= 0, np.asarray(eff.val) * 2, np.asarray(eff.val))
            nat.refresh(hostv * 2)
            ref.refresh(effv2)
            assert np.array_equal(np.asarray(nat.D), np.asarray(ref.D))
            assert np.array_equal(np.asarray(nat.Lval), np.asarray(ref.Lval))
