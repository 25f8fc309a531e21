"""Serving workflow: empirical tuning + planner-state persistence (no
reference counterpart — kernels/autotune.py, io/plancache.py).

A serving process measures once (autotune_mv / autotune_trsv pick kernels
and block sizes by timing the live dispatch path), snapshots the plan, and
every later restart restores the analysis instead of re-planning."""

import os
import tempfile

import numpy as np
from _common import check

import aoclsparse_tpu as asp
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.io import load_plan, save_plan
from aoclsparse_tpu.planner.plan import get_plan

rng = np.random.default_rng(0)
m = 4096
half, per = 8, 5
base = np.clip(np.arange(m) - half, 0, m - 2 * half)
pick = np.argsort(rng.random((m, 2 * half)), axis=1)[:, :per]
cols = np.sort(base[:, None] + pick, axis=1)
ptr = np.arange(m + 1) * per
val = rng.standard_normal(m * per)
dense = np.zeros((m, m))
dense[np.repeat(np.arange(m), per), cols.reshape(-1)] = val

A = asp.create_csr(m, m, ptr, cols.reshape(-1), val)
gen = MatrixDescriptor()

# measure every buildable execution form through the live dispatch path
timings = asp.autotune_mv(A, iters=3, chunks=2)
print("mv form timings (us):", {k: round(v * 1e6, 1) for k, v in timings.items()})
winner = min(timings, key=timings.get)
print("pinned:", winner)

x = rng.standard_normal(m)
check("mv after tuning", asp.mv(1.0, A, gen, Operation.none, x, 0.0), dense @ x)

# triangular block-size tuning
lowd = np.tril(dense) + 4 * np.eye(m)
maskL = lowd != 0
ptrL = np.concatenate([[0], np.cumsum(maskL.sum(1))])
L = asp.create_csr(m, m, ptrL, np.nonzero(maskL)[1], lowd[maskL])
low = MatrixDescriptor().with_(type=3)
nb_t = asp.autotune_trsv(L, low, nb_candidates=(128, 256), iters=2, chunks=2)
print("trsv nb timings (us):", {k: round(v * 1e6, 1) for k, v in nb_t.items()})

# snapshot the plan; a fresh process (fresh handle) restores it
with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "plan.npz")
    save_plan(A, p)
    print("snapshot:", os.path.getsize(p) // 1024, "KB")
    A2 = asp.create_csr(m, m, ptr, cols.reshape(-1), val * 2)  # new values OK
    n = load_plan(A2, p)
    print("restored", n, "form(s); values come from the live handle")
    check("mv after restore", asp.mv(1.0, A2, gen, Operation.none, x, 0.0), 2 * dense @ x)
    # the snapshot contract: the restored handle serves the SAME form the
    # tuned handle had (comparing against `winner` directly was flaky — the
    # autotune pin can legitimately differ from min(timings) under host
    # load, e.g. the host engine is timed but never pinned as a form kind)
    assert (
        get_plan(A2).exec_form_for(gen, Operation.none).kind
        == get_plan(A).exec_form_for(gen, Operation.none).kind
    )
