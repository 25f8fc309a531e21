#!/usr/bin/env python
"""Probe: general-sparsity SpMM (mm KID 6, spmm_gen) on the real chip.

Circuit-profile operand (m=262144) x dense (m, 128) RHS: parity vs the
host oracle + amortized per-iteration time vs the padded-ELL gather mm
it replaces. One JSON line per result.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_gen import build_csr, circuit_profile  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.planner.plan import get_plan

    rng = np.random.default_rng(11)
    m, k = 262144, 128
    r, c = circuit_profile(rng, m)
    ptr, ind, val = build_csr(r, c, m, rng=rng)
    nnz = int(ind.size)
    A = ast.create_csr(m, m, ptr, ind, val)
    descr = MatrixDescriptor()
    t0 = time.perf_counter()
    form = get_plan(A).exec_form_for(descr, Operation.none, dtype=A.dtype)
    t_plan = time.perf_counter() - t0
    B = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))

    rec = {"metric": "spmm_gen_circuit", "m": m, "k": k, "nnz": nnz,
           "form": form.kind, "plan_s": round(t_plan, 1)}
    try:
        t0 = time.perf_counter()
        C = ast.mm(1.0, A, descr, Operation.none, B, 0.0, kid=6)
        Ch = np.asarray(C)
        rec["t_first_s"] = round(time.perf_counter() - t0, 1)
        # oracle on sampled rows
        rows = np.arange(0, m, 4099)
        ref = np.zeros((rows.size, k))
        xv = np.asarray(B, dtype=np.float64)
        for i, rr in enumerate(rows):
            sl = slice(ptr[rr], ptr[rr + 1])
            ref[i] = val[sl].astype(np.float64) @ xv[ind[sl]]
        rec["max_abs_err"] = float(np.max(np.abs(Ch[rows] - ref)))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(3):
                C = ast.mm(1.0, A, descr, Operation.none, B, 0.0, kid=6)
            np.asarray(jnp.ravel(C)[:1])
            best = min(best, (time.perf_counter() - t0) / 3)
        rec["t_ms"] = round(best * 1e3, 2)
        rec["gflops"] = round(2 * nnz * k / best / 1e9, 1)
    except Exception as e:
        rec["error"] = repr(e)[:300]
    print(json.dumps(rec), flush=True)

    # the gather mm it replaces (ellhyb/ell route)
    try:
        C2 = ast.mm(1.0, A, descr, Operation.none, B, 0.0, kid=2)
        np.asarray(jnp.ravel(C2)[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            C2 = ast.mm(1.0, A, descr, Operation.none, B, 0.0, kid=2)
            np.asarray(jnp.ravel(C2)[:1])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"metric": "spmm_ellhyb_circuit", "t_ms": round(best * 1e3, 2),
                          "gflops": round(2 * nnz * k / best / 1e9, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"metric": "spmm_ellhyb_circuit", "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
