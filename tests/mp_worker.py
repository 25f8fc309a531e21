"""Multi-process worker: one controller process of a 2-process gloo run.

Launched by tests/test_multiprocess.py as `python mp_worker.py <pid> <port>`.
Every process runs this same program (multi-controller SPMD): join the run,
build the GLOBAL 8-device mesh (2 processes x 4 local CPU devices), run the
distributed SpMV/CG paths on a deterministic band matrix, and check parity
against the local numpy oracle. Prints MP-OK on success.

This is the DCN-analog test story SURVEY.md §4 says the reference never
needed ("no multi-node testing of any kind") but this framework must have:
the collectives here cross process boundaries over gloo TCP exactly where a
TPU pod run would cross DCN.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scrub the parent pytest's virtual-device flag: each worker declares its
# own local device count below
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize override-proof
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

pid = int(sys.argv[1])
port = int(sys.argv[2])

from aoclsparse_tpu.parallel import multiproc as mp  # noqa: E402

mp.init_multiprocess(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
    local_device_count=4,
)
assert jax.process_count() == 2
assert len(jax.devices()) == 8
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

import aoclsparse_tpu as ast  # noqa: E402
from aoclsparse_tpu import MatrixDescriptor, Operation  # noqa: E402
from aoclsparse_tpu.parallel import (  # noqa: E402
    dist_cg,
    dist_cg_bwd_halo,
    dist_spmv_bwd_halo,
    dist_spmv_ell,
    shard_ell,
)
from aoclsparse_tpu.planner.plan import get_plan  # noqa: E402

mesh = mp.global_mesh()
assert mp.mesh_is_multiprocess(mesh)

# deterministic band matrix, identical on every controller (the framework's
# host-planner model: structure is replicated on every process)
rng = np.random.default_rng(7)
m = 256
half = 3
dense = np.zeros((m, m))
for d in range(-half, half + 1):
    v = rng.standard_normal(m - abs(d))
    dense += np.diag(v, d)
dense = (dense + dense.T) / 2  # CG needs symmetry
dense += np.eye(m) * (2 * half + 2)  # diagonally dominant -> SPD
ptr = [0]
ind, val = [], []
for i in range(m):
    cols = np.nonzero(dense[i])[0]
    ind.extend(cols.tolist())
    val.extend(dense[i, cols].tolist())
    ptr.append(len(ind))
A = ast.create_csr(m, m, np.asarray(ptr, np.int32), np.asarray(ind, np.int32), np.asarray(val))
x = rng.standard_normal(m)
want = dense @ x

plan = get_plan(A)

# 1) row-sharded ELL SpMV, x replicated (cross-process broadcast)
form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="ell")
ind_s, val_s, m_pad = shard_ell(mesh, form.ell_ind, form.ell_val)
y = dist_spmv_ell(mesh, ind_s, val_s, x)
np.testing.assert_allclose(mp.fetch(y)[:m], want, rtol=1e-10)
print(pid, "dist_spmv_ell ok", flush=True)

# 2) band-halo SpMV: x fully sharded, ppermute halos cross the process
#    boundary between local devices 3 and 4 (the DCN edge)
bwd = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwd")
ndev = 8
m_pad2 = -(-m // (8 * ndev)) * 8 * ndev
x_sh = mp.put(np.pad(x, (0, m_pad2 - m)), mesh, P("x"))
y2 = dist_spmv_bwd_halo(mesh, bwd, x_sh)
np.testing.assert_allclose(mp.fetch(y2)[:m], want, rtol=1e-10)
print(pid, "dist_spmv_bwd_halo ok", flush=True)

# 3) single-dispatch distributed CG (psum'd dots cross processes)
b = dense @ np.ones(m)
xs, iters, rnorm = dist_cg(mesh, form.ell_ind, form.ell_val, b, rtol=1e-12, maxit=400)
assert rnorm <= 1e-9 * np.linalg.norm(b), (iters, rnorm)
np.testing.assert_allclose(mp.fetch(xs), np.ones(m), atol=1e-7)
print(pid, "dist_cg ok", flush=True)

# 4) halo-CG: sharded vectors + ppermute halos inside the while_loop
xs2, it2, rn2 = dist_cg_bwd_halo(mesh, bwd, b, rtol=1e-12, maxit=400)
assert rn2 <= 1e-9 * np.linalg.norm(b), (it2, rn2)
np.testing.assert_allclose(mp.fetch(xs2), np.ones(m), atol=1e-7)
print(pid, "dist_cg_bwd_halo ok", flush=True)

# 5) pipelined Jacobi-PCG: the single fused psum per iteration crosses the
#    process boundary too
from aoclsparse_tpu.parallel import dist_cg_pipelined  # noqa: E402

xs3, it3, rn3 = dist_cg_pipelined(
    mesh, bwd, b, rtol=1e-12, maxit=400, dinv=1.0 / np.diag(dense)
)
assert rn3 <= 1e-9 * np.linalg.norm(b), (it3, rn3)
np.testing.assert_allclose(mp.fetch(xs3), np.ones(m), atol=1e-7)
print(pid, "dist_cg_pipelined ok", flush=True)

# 6) plan-derived general halo: the all_to_all crosses the process boundary
from aoclsparse_tpu.parallel import dist_spmv_ell_halo_plan  # noqa: E402

ell_ind = np.asarray(form.ell_ind)
ell_val = np.asarray(form.ell_val)
mp8 = -(-ell_ind.shape[0] // 8) * 8
ell_ind = np.pad(ell_ind, ((0, mp8 - ell_ind.shape[0]), (0, 0)), constant_values=-1)
ell_val = np.pad(ell_val, ((0, mp8 - ell_val.shape[0]), (0, 0)))
n_pad8 = -(-m // 8) * 8
x_sh2 = mp.put(np.pad(x, (0, n_pad8 - m)), mesh, P("x"))
yg = dist_spmv_ell_halo_plan(mesh, ell_ind, ell_val, x_sh2)
np.testing.assert_allclose(mp.fetch(yg)[:m], want, rtol=1e-10)
print(pid, "dist_spmv_ell_halo_plan (all_to_all) ok", flush=True)

# 7) sharded level-scheduled TRSV: per-level all_gather across processes
from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType  # noqa: E402
from aoclsparse_tpu.parallel import dist_trsv_levels  # noqa: E402
from aoclsparse_tpu.planner.triangular import trsv_level_form_for  # noqa: E402

tri = MatrixDescriptor(
    type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
)
lform = trsv_level_form_for(plan, tri, Operation.none)
bt = rng.standard_normal(m)
xt = mp.fetch(dist_trsv_levels(mesh, lform, bt))
Lh = np.tril(dense)
np.testing.assert_allclose(Lh @ xt, bt, rtol=1e-9, atol=1e-10)
print(pid, "dist_trsv_levels ok", flush=True)

# 8) B-sharded SpGEMM: per-shard symbolic + ppermute B-row value slabs
#    crossing the process boundary
from aoclsparse_tpu.parallel import dist_spgemm_halo  # noqa: E402

eff = plan.effective_for(MatrixDescriptor(), Operation.none, A.dtype)
Cptr, Cind, Cval = dist_spgemm_halo(mesh, eff, eff)
Cd = np.zeros((m, m))
for i in range(m):
    Cd[i, Cind[Cptr[i] : Cptr[i + 1]]] = Cval[Cptr[i] : Cptr[i + 1]]
np.testing.assert_allclose(Cd, dense @ dense, atol=1e-8)
print(pid, "dist_spgemm_halo ok", flush=True)

print(pid, "MP-OK", flush=True)
