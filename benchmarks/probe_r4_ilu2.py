#!/usr/bin/env python
"""Round-4 ILU follow-up: isolate the pcg_ilu0 cost structure.

Measures with argument-passed jits (no closure constants):
  - amortized single pallas win-solve at nb 128/256 (m=262144)
  - pcg_ilu0 slope: fixed maxit runs at 12 and 25 iterations with rtol=0
    -> per-iteration slope vs fixed dispatch cost
  - end-to-end ilu0_factorize on a fresh operand, measured in isolation
Appends to PROBE_r4.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_r4.jsonl")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.solvers.ilu import ilu0_factorize
    from aoclsparse_tpu.solvers.fused import _pallas_solve_operands, pcg_solve
    from aoclsparse_tpu.kernels.pallas.trsv import pallas_trsv_win_inv8
    from benchmarks.suite import banded

    rng = np.random.default_rng(7)
    m = 262144
    ptr, ind, val = banded(rng, m, m, 64, 64, diag_boost=128.0)
    A = ast.create_csr(m, m, ptr, ind, val)

    t0 = time.perf_counter()
    plan = get_plan(A)
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    st = ilu0_factorize(A)
    st.l_form.D.block_until_ready()
    st.u_form.D.block_until_ready()
    t_factor = time.perf_counter() - t0
    emit({"probe": "r4b_ilu_factor", "m": m, "t_plan": round(t_plan, 2),
          "t_factor_total": round(t_factor, 2), "nb": st.l_form.nb,
          "path": "native" if getattr(st.l_form, "_src_space", "") == "clean" else "numpy"})

    # amortized single L-solve at the library nb and at nb=128
    b = rng.standard_normal(m).astype(np.float32)
    b_d = jnp.asarray(b)
    R = 50

    def solve_loop_for(form):
        dT, lwT = _pallas_solve_operands(form)
        nb, WL = form.nb, form.WL
        mpad = dT.shape[0] * nb

        @jax.jit
        def loop(eps, b0, dTa, lwTa):
            def body(i, carry):
                r, acc = carry
                z = pallas_trsv_win_inv8(dTa, lwTa, jnp.pad(r, (0, mpad - m)), nb, WL)[:m]
                return (r.at[:128].add(eps * z[:128]), acc + z[0])

            _, acc = jax.lax.fori_loop(0, R, body, (b0, jnp.float32(0.0)))
            return acc

        fn = lambda: float(loop(jnp.float32(1e-7), b_d, dT, lwT))  # noqa: E731
        fn()
        return fn

    from aoclsparse_tpu.planner.triangular import build_trsv_form_native
    from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType

    l_descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower,
                               diag_type=DiagType.unit)
    lu_host = np.asarray(st.lu)
    forms = {f"nb{st.l_form.nb}": st.l_form}
    if st.l_form.nb != 128:
        f128 = build_trsv_form_native(st.lu_clean, l_descr, Operation.none, ("p", "l"), 128,
                                      lu_host)
        if f128 is not None:
            forms["nb128"] = f128
    loops = {k: solve_loop_for(f) for k, f in forms.items()}
    rec = {"probe": "r4b_ilu_solve1", "m": m}
    for k, fn in loops.items():
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            best = min(best, (time.perf_counter() - t0) / R)
        rec[k + "_us"] = round(best * 1e6, 1)
    emit(rec)

    # pcg slope on the suite operand
    mF = 65536
    pF, iF, vF = banded(rng, mF, mF, 16, 9, diag_boost=64.0)
    AF = ast.create_csr(mF, mF, pF, iF, vF)
    bF = rng.standard_normal(mF).astype(np.float32)
    rec = {"probe": "r4b_ilu_pcg_slope", "m": mF}
    for mx in (12, 25):
        t0 = time.perf_counter()
        x, it, rn = pcg_solve(AF, bF, rtol=0.0, atol=1e-30, maxit=mx, precond="ilu0")
        rec[f"first{mx}_s"] = round(time.perf_counter() - t0, 2)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            x, it, rn = pcg_solve(AF, bF, rtol=0.0, atol=1e-30, maxit=mx, precond="ilu0")
            best = min(best, time.perf_counter() - t0)
        rec[f"t{mx}_ms"] = round(best * 1e3, 1)
        rec[f"iters{mx}"] = int(it)
    if rec.get("iters25") and rec.get("iters12"):
        di = rec["iters25"] - rec["iters12"]
        if di > 0:
            rec["ms_per_iter_slope"] = round((rec["t25_ms"] - rec["t12_ms"]) / di, 2)
    emit(rec)

    # the real-tolerance row (suite parity)
    t0 = time.perf_counter()
    x, it, rn = pcg_solve(AF, bF, rtol=1e-5, maxit=60, precond="ilu0")
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        x, it, rn = pcg_solve(AF, bF, rtol=1e-5, maxit=60, precond="ilu0")
        best = min(best, time.perf_counter() - t0)
    emit({"probe": "r4b_ilu_pcg", "iters": int(it), "t_solve_ms": round(best * 1e3, 1),
          "ms_per_iter": round(best * 1e3 / max(int(it), 1), 2)})


if __name__ == "__main__":
    main()
