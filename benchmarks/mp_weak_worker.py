"""Weak-scaling methodology rehearsal worker (VERDICT r4 item 8).

Same global 8-device mesh and band-CG problem in two topologies:
  1 process x 8 local CPU devices   (all collectives shared-memory)
  2 processes x 4 local CPU devices (halo/psum cross gloo TCP = the DCN edge)
Efficiency = slope_1proc / slope_2proc per CG iteration — the measured
rehearsal of the prediction model in utils/collectives.predict_weak_scaling.

Launched by benchmarks/mp_weak_scaling.py as
    python mp_weak_worker.py <nproc> <pid> <port> <m>
Prints one line: SLOPE <ms_per_iter>.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

nproc = int(sys.argv[1])
pid = int(sys.argv[2])
port = int(sys.argv[3])
m = int(sys.argv[4])

from aoclsparse_tpu.parallel import multiproc as mp  # noqa: E402

local = 8 // nproc
if nproc > 1:
    mp.init_multiprocess(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        local_device_count=local,
    )
else:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    )

import aoclsparse_tpu as ast  # noqa: E402
from aoclsparse_tpu import MatrixDescriptor, Operation  # noqa: E402
from aoclsparse_tpu.parallel import dist_cg_bwd_halo  # noqa: E402
from aoclsparse_tpu.planner.plan import get_plan  # noqa: E402

if nproc > 1:
    mesh = mp.global_mesh()
else:
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))

rng = np.random.default_rng(11)
half = 8
diags = {}
for d in range(-half, half + 1):
    diags[d] = rng.standard_normal(m - abs(d))
rows, cols, vals = [], [], []
for d, v in diags.items():
    r = np.arange(max(0, -d), max(0, -d) + v.size)
    rows.append(r)
    cols.append(r + d)
    vals.append(v if d != 0 else np.abs(v) + 4.0 * (2 * half + 1))
rows = np.concatenate(rows)
cols = np.concatenate(cols)
vals = np.concatenate(vals)
order = np.lexsort((cols, rows))
rows, cols, vals = rows[order], cols[order], vals[order]
# symmetrize values by averaging with the transpose entry (band structure
# is symmetric by construction)
ptr = np.zeros(m + 1, np.int64)
np.add.at(ptr, rows + 1, 1)
ptr = np.cumsum(ptr)
import scipy.sparse as sp

S = sp.csr_matrix((vals, (rows, cols)), shape=(m, m))
S = (S + S.T) * 0.5
S.sort_indices()
A = ast.create_csr(m, m, S.indptr, S.indices, S.data.astype(np.float32))
plan = get_plan(A)
bwd = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwd")
b = (S @ np.ones(m)).astype(np.float32)


def run(maxit):
    xs, it, rn = dist_cg_bwd_halo(mesh, bwd, b, rtol=0.0, atol=0.0, maxit=maxit)
    if nproc > 1:
        mp.fetch(xs)  # cross-process gather (multi-proc arrays aren't
        # locally addressable; same sync point as the 1-proc asarray)
    else:
        np.asarray(xs)
    return int(it)


run(4)  # compile both budgets
run(20)
ts = {}
for mx in (4, 20):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        it = run(mx)
        best = min(best, time.perf_counter() - t0)
    ts[mx] = (best, it)
(tl, il), (th, ih) = ts[4], ts[20]
slope = (th - tl) * 1e3 / max(ih - il, 1)
print(f"SLOPE {slope:.4f}", flush=True)
