"""Collective-ledger tests (VERDICT r3 item 8b): pin the per-iteration
wire cost of the distributed solver loops from their traced jaxprs — the
honest single-rig stand-in for the multi-host scaling target.

The headline claims being pinned:
- dist_cg_pipelined: exactly ONE fused all-reduce per iteration
  (Ghysels–Vanroose single-reduction recurrence) + the 2 ring halos.
- dist_cg_bwd_halo: 2 all-reduces per iteration (dot2 fusion halved the
  classic 3-dot loop) + 2 ring halos; halo payloads are O(W), not O(n).
"""

import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.planner.plan import _build_bwd, get_plan
from aoclsparse_tpu.utils.collectives import collective_ledger, ledger_summary


@pytest.fixture(scope="module")
def dist_setup():
    from aoclsparse_tpu.parallel import make_mesh

    import __graft_entry__ as g

    mesh = make_mesh(8)
    m = 512
    ptr, ind, val, dense = g._example_band(m, half_bw=3, row_nnz=3)
    A = ast.create_csr(m, m, ptr, ind, val)
    eff = get_plan(A).effective_for(MatrixDescriptor(), Operation.none, A.dtype)
    form = _build_bwd(eff)
    b = np.linspace(0.5, 1.5, m).astype(np.float32)
    return mesh, form, b


def _ledger_of(fn, mesh, form, b, **kw):
    fn(mesh, form, b, rtol=1e-4, maxit=50, **kw)
    inner, args = fn.last_inner
    return ledger_summary(collective_ledger(inner, *args))


def test_cg_halo_ledger(dist_setup):
    from aoclsparse_tpu.parallel import dist_cg_bwd_halo

    mesh, form, b = dist_setup
    s = _ledger_of(dist_cg_bwd_halo, mesh, form, b)
    assert s["per_iteration"]["all_reduce"] == 2  # dot2 fusion: 2 not 3
    assert s["per_iteration"]["collective_permute"] == 2  # left+right halo
    # halo payloads are O(W) per shard, nowhere near the O(n/ndev) shard
    m_shard_bytes = -(-form.m // (8 * 8)) * 8 * 4
    assert s["per_iteration_bytes"] < m_shard_bytes


def test_cg_pipelined_single_reduction(dist_setup):
    from aoclsparse_tpu.parallel import dist_cg_pipelined

    mesh, form, b = dist_setup
    s = _ledger_of(dist_cg_pipelined, mesh, form, b)
    assert s["per_iteration"]["all_reduce"] == 1  # THE pipelined-CG claim
    assert s["per_iteration"]["collective_permute"] == 2


def test_gmres_halo_ledger(dist_setup):
    from aoclsparse_tpu.parallel import dist_gmres_bwd_halo

    mesh, form, b = dist_setup
    s = _ledger_of(dist_gmres_bwd_halo, mesh, form, b)
    # per restart-cycle loop: the CGS projection is a fused psum, plus the
    # Arnoldi normalization + matvec halos
    assert s["per_iteration"]["all_reduce"] <= 3
    assert s["per_iteration"]["collective_permute"] >= 2


def test_spmv_halo_is_two_permutes(dist_setup):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jax.numpy as jnp

    from aoclsparse_tpu.parallel import dist_spmv_bwd_halo

    mesh, form, b = dist_setup
    m_pad = -(-form.m // (8 * 8)) * 8 * 8
    xh = jnp.pad(jnp.asarray(b), (0, m_pad - form.m))
    xh_sh = jax.device_put(xh, NamedSharding(mesh, P("x")))
    led = collective_ledger(lambda x: dist_spmv_bwd_halo(mesh, form, x), xh_sh)
    s = ledger_summary(led)
    counts = {**s["one_time"], **s["per_iteration"]}
    assert counts.get("collective_permute", 0) == 2
    assert counts.get("all_gather", 0) == 0  # the halo path never gathers x
