"""Direct tests for public API entry points previously exercised only
indirectly (parity sweep against the reference surface,
include/aoclsparse_analysis.h hint family, aoclsparse_convert.h convert_bsr,
itsol_data.hpp RCI state machines, itsol_options.hpp OptionRegistry).

Each test drives the entry point itself, not a wrapper that happens to call
it, so a regression in the public name (signature, validation, semantics)
fails here even when the internal path it shares survives.
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.core.types import (
    AoclSparseError,
    DiagType,
    FillMode,
    FormatType,
    IluType,
    MatrixType,
    Status,
)

GEN = MatrixDescriptor()
LOWER = MatrixDescriptor(
    type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
)


def _mat(rng, m=24, density=0.35, dtype=np.float64):
    dense = rng.standard_normal((m, m)).astype(dtype)
    dense[np.abs(dense) < (1 - density) * 1.6] = 0
    np.fill_diagonal(dense, 4.0 + np.arange(m))
    ptr = np.concatenate([[0], np.cumsum((dense != 0).sum(1))]).astype(np.int64)
    ind = np.nonzero(dense)[1].astype(np.int32)
    return ast.create_csr(m, m, ptr, ind, dense[dense != 0]), dense


# ---------------------------------------------------------------------------
# hint setters (aoclsparse_set_{mm,2m,sm,symgs,sorv,lu_smoother}_hint,
# analysis/aoclsparse_analysis.cpp:595-777)
# ---------------------------------------------------------------------------

HINT_SETTERS = [
    (ast.set_mm_hint, "mm"),
    (ast.set_2m_hint, "2m"),
    (ast.set_sm_hint, "sm"),
    (ast.set_symgs_hint, "symgs"),
    (ast.set_sorv_hint, "sorv"),
    (ast.set_lu_smoother_hint, "lu_smoother"),
]


@pytest.mark.parametrize("setter,action", HINT_SETTERS, ids=[a for _, a in HINT_SETTERS])
def test_hint_setter_registers_action(rng, setter, action):
    A, _ = _mat(rng)
    setter(A, Operation.none, GEN, nop=7)
    assert A.hints[0].action == action
    assert A.hints[0].nop == 7
    assert A.hints[0].trans == Operation.none
    # optimize consumes the hint without error regardless of kind
    ast.optimize(A)
    assert all(h.done for h in A.hints)


@pytest.mark.parametrize("setter,action", HINT_SETTERS, ids=[a for _, a in HINT_SETTERS])
def test_hint_setter_validation(rng, setter, action):
    A, _ = _mat(rng)
    with pytest.raises(AoclSparseError) as e:
        setter(None, Operation.none, GEN)
    assert e.value.status == Status.invalid_pointer
    with pytest.raises(AoclSparseError) as e:
        setter(A, Operation.none, None)
    assert e.value.status == Status.invalid_pointer
    with pytest.raises(AoclSparseError) as e:
        setter(A, Operation.none, GEN, nop=-1)
    assert e.value.status == Status.invalid_value


# ---------------------------------------------------------------------------
# convert_bsr (aoclsparse_convert_bsr) / create_dia / csrsv
# ---------------------------------------------------------------------------


def test_convert_bsr_roundtrip(rng):
    A, dense = _mat(rng, m=24)
    B = ast.convert_bsr(A, 4)
    assert B.input_format == FormatType.bsr
    from aoclsparse_tpu.convert.conversions import to_csr, csr_to_dense

    got = np.asarray(csr_to_dense(to_csr(B.data)))
    np.testing.assert_allclose(got, dense, atol=1e-14)


def test_convert_bsr_transpose_and_validation(rng):
    A, dense = _mat(rng, m=16)
    Bt = ast.convert_bsr(A, 2, Operation.transpose)
    from aoclsparse_tpu.convert.conversions import to_csr, csr_to_dense

    got = np.asarray(csr_to_dense(to_csr(Bt.data)))
    np.testing.assert_allclose(got, dense.T, atol=1e-14)
    with pytest.raises(AoclSparseError) as e:
        ast.convert_bsr(None, 2)
    assert e.value.status == Status.invalid_pointer
    with pytest.raises(AoclSparseError) as e:
        ast.convert_bsr(A, 0)
    assert e.value.status == Status.invalid_size


def test_create_dia_mv(rng):
    # 3-diagonal m x m operand through the DIA ingestion path
    m = 20
    dist = np.array([-1, 0, 2], dtype=np.int64)
    val = rng.standard_normal((3, m))
    A = ast.create_dia(m, m, dist, val)
    assert A.input_format == FormatType.dia
    dense = np.zeros((m, m))
    for k, d in enumerate(dist):
        for i in range(m):
            j = i + d
            if 0 <= j < m:
                dense[i, j] = val[k, i]
    x = rng.standard_normal(m)
    y = np.asarray(ast.mv(1.0, A, GEN, Operation.none, x, 0.0, None))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-12)


def test_csrsv_alias_matches_trsv(rng):
    A, dense = _mat(rng, m=16)
    b = rng.standard_normal(16)
    x_alias = np.asarray(ast.csrsv(1.0, A, LOWER, Operation.none, b))
    x_trsv = np.asarray(ast.trsv(1.0, A, LOWER, Operation.none, b))
    np.testing.assert_array_equal(x_alias, x_trsv)


def test_ilu_type_enum_parity():
    # aoclsparse_ilu_type (types.h:217-222): ILU0 implemented, ILUP placeholder
    assert IluType.ilu0 == 0
    assert hasattr(IluType, "ilup")


# ---------------------------------------------------------------------------
# parallel.partition_products (product-partitioned distributed SpGEMM)
# ---------------------------------------------------------------------------


def test_partition_products_covers_all_products(rng):
    from aoclsparse_tpu.ops.level3.spgemm import _effective, _symbolic
    from aoclsparse_tpu.parallel import partition_products

    A, _ = _mat(rng, m=20, density=0.3)
    effA = _effective(A, GEN, Operation.none)
    plan = _symbolic(effA, effA)
    n_dev = 4
    pa_s, pb_s, pc_s, chunk = partition_products(plan, n_dev)
    assert pa_s.shape == pb_s.shape == pc_s.shape == (n_dev, pa_s.shape[1])
    # every real product appears exactly once with a consistent local pc
    got = []
    P = int(np.asarray(plan.pa).size)
    for d in range(n_dev):
        for pa_v, pb_v, pc_v in zip(pa_s[d], pb_s[d], pc_s[d]):
            if pc_v == chunk:  # padding -> scratch slot
                continue
            got.append((int(pa_v), int(pb_v), int(pc_v) + d * chunk))
    assert len(got) == P
    expect = set(
        zip(
            np.asarray(plan.pa).tolist(),
            np.asarray(plan.pb).tolist(),
            np.asarray(plan.pc).tolist(),
        )
    )
    assert set(got) == expect
    # padded slots stay within the scratch segment
    assert (pc_s <= chunk).all()


# ---------------------------------------------------------------------------
# OptionRegistry (itsol_options.hpp:100-800 semantics)
# ---------------------------------------------------------------------------


def test_option_registry_contract():
    from aoclsparse_tpu.solvers.options import Option, OptionRegistry

    r = OptionRegistry()
    r.register(Option("My  Int", "int", 5, "an int", lower=1))
    # duplicate registration (normalized name) is rejected
    with pytest.raises(AoclSparseError) as e:
        r.register(Option("my int", "int", 5, "dup"))
    assert e.value.status == Status.invalid_value
    # unknown option
    with pytest.raises(AoclSparseError):
        r.set("nope", 1)
    # bounds
    with pytest.raises(AoclSparseError):
        r.set("my int", 0)
    r.set("MY INT", 9)
    assert r.get("my int") == 9
    # lock-on-use (the reference locks options once a solve reads them)
    assert r.get("my int", lock=True) == 9
    with pytest.raises(AoclSparseError) as e:
        r.set("my int", 7)
    assert e.value.status == Status.invalid_operation
    r.unlock_all()
    r.set("my int", 7)
    assert r.get_string("my int") == "7"
    # string choices map to registered values
    r.register(
        Option("method", "string", "a", "choose", choices={"a": 1, "b": 2})
    )
    r.set("method", "B")
    assert r.get("method") == 2
    with pytest.raises(AoclSparseError):
        r.set("method", "c")
    out = r.print_options()
    assert "My  Int" in out and "method" in out


# ---------------------------------------------------------------------------
# CgRci / GmresRci driven directly through the RciJob protocol
# ---------------------------------------------------------------------------


def _drive(rci, dense, M_inv=None, max_bounces=10_000):
    from aoclsparse_tpu.solvers.itsol import RciJob

    job, u = rci.step()
    bounces = 0
    while job != RciJob.stop:
        bounces += 1
        assert bounces < max_bounces
        if job == RciJob.mv:
            job, u = rci.step(dense @ u)
        elif job == RciJob.precond:
            job, u = rci.step(u if M_inv is None else M_inv(u))
        else:  # stopping_criterion: monitoring bounce
            job, u = rci.step()
    return np.asarray(rci.x)


def test_cgrci_direct_converges(rng):
    from aoclsparse_tpu.solvers.itsol import CgRci, RINFO_ITER, RINFO_RES_NORM

    n = 24
    Q = rng.standard_normal((n, n))
    dense = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    rinfo = np.zeros(100)
    rci = CgRci(n, b, np.zeros(n), 1e-10, 0.0, 200, precond=False, rinfo=rinfo)
    x = _drive(rci, dense)
    np.testing.assert_allclose(dense @ x, b, rtol=1e-8)
    assert rinfo[RINFO_ITER] >= 1
    assert rinfo[RINFO_RES_NORM] <= 1e-10 * np.linalg.norm(b)


def test_cgrci_jacobi_precond_fewer_iters(rng):
    from aoclsparse_tpu.solvers.itsol import CgRci, RINFO_ITER

    n = 40
    # badly scaled SPD diagonal + small coupling
    d = 10.0 ** rng.uniform(-3, 3, n)
    dense = np.diag(d) + 1e-3 * np.eye(n)
    b = rng.standard_normal(n)

    def run(precond):
        rinfo = np.zeros(100)
        rci = CgRci(n, b, np.zeros(n), 1e-12, 0.0, 5000, precond=precond, rinfo=rinfo)
        x = _drive(rci, dense, M_inv=(lambda u: u / d) if precond else None)
        np.testing.assert_allclose(dense @ x, b, rtol=1e-6)
        return rinfo[RINFO_ITER]

    it_plain, it_prec = run(False), run(True)
    assert it_prec < it_plain


def test_cgrci_not_positive_definite_breakdown(rng):
    from aoclsparse_tpu.solvers.itsol import CgRci

    n = 8
    dense = -np.eye(n)  # negative definite -> pq < 0 on the first step
    rinfo = np.zeros(100)
    rci = CgRci(n, np.ones(n), np.zeros(n), 1e-10, 0.0, 50, precond=False, rinfo=rinfo)
    with pytest.raises(AoclSparseError) as e:
        _drive(rci, dense)
    assert e.value.status == Status.numerical_error


def test_gmresrci_direct_converges(rng):
    from aoclsparse_tpu.solvers.itsol import GmresRci

    n = 30
    dense = np.eye(n) * 4.0 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    rinfo = np.zeros(100)
    rci = GmresRci(
        n, b, np.zeros(n), 1e-10, 0.0, 400, restart=10, precond=False, rinfo=rinfo
    )
    x = _drive(rci, dense)
    np.testing.assert_allclose(dense @ x, b, rtol=1e-7, atol=1e-9)
