#!/usr/bin/env python
"""Round-4 TRSV probe (VERDICT r3 item 6):
  (a) blocked windowed-inverse solve at nb in {256, 512, 1024} — the
      sequential chain is nblk steps, so larger blocks trade step count
      for per-step matmul size;
  (b) level engine (shape-bucketed runs) vs blocked on the shallow
      circuit-profile DAG it exists for.
Appends to PROBE_r4.jsonl.
"""

import json
import os
import sys
import time

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
    from aoclsparse_tpu import MatrixDescriptor, MatrixType, Operation
    from aoclsparse_tpu.planner.plan import get_plan, build_effective_csr
    from aoclsparse_tpu.planner.triangular import build_trsv_form_native
    from aoclsparse_tpu.solvers.fused import _pallas_solve_operands
    from aoclsparse_tpu.kernels.pallas.trsv import pallas_trsv_win_inv8
    from aoclsparse_tpu.core.types import DiagType, FillMode
    from benchmarks.suite import banded

    rng = np.random.default_rng(7)
    m = 262144
    ptr, ind, val = banded(rng, m, m, 64, 64, diag_boost=float(64))
    A = ast.create_csr(m, m, ptr, ind, val)
    plan = get_plan(A)
    clean = plan.clean
    l_descr = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.non_unit
    )
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    R = 20
    tri_nnz = None

    for nb in (256, 512, 1024):
        try:
            t0 = time.perf_counter()
            f = build_trsv_form_native(
                clean, l_descr, Operation.none, ("p", f"nb{nb}"), nb, np.asarray(clean.val)
            )
            t_build = time.perf_counter() - t0
            if f is None:
                emit({"probe": "r4_trsv_nb", "nb": nb, "skip": "builder None"})
                continue
            dT, lwT = _pallas_solve_operands(f)
            mpad = dT.shape[0] * nb

            @jax.jit
            def loop(eps, dTa, lwTa, b0):
                def body(i, carry):
                    r, acc = carry
                    z = pallas_trsv_win_inv8(
                        dTa, lwTa, jnp.pad(r, (0, mpad - m)), nb, f.WL
                    )[:m]
                    return (r.at[:128].add(eps * z[:128]), acc + z[0])

                _, acc = jax.lax.fori_loop(0, R, body, (b0, jnp.float32(0.0)))
                return acc

            float(loop(jnp.float32(1e-7), dT, lwT, b))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop(jnp.float32(1e-7), dT, lwT, b))
                best = min(best, (time.perf_counter() - t0) / R)
            if tri_nnz is None:
                ptr64 = clean.ptr.astype(np.int64)
                rows_h = np.repeat(np.arange(m), np.diff(ptr64))
                tri_nnz = int(np.sum(clean.ind <= rows_h))
            emit({"probe": "r4_trsv_nb", "nb": nb, "WL": f.WL,
                  "t_us": round(best * 1e6, 1),
                  "gflops": round(2.0 * tri_nnz / best / 1e9, 2),
                  "build_s": round(t_build, 2)})
        except Exception as e:
            emit({"probe": "r4_trsv_nb", "nb": nb, "error": repr(e)[:160]})

    # ---- level engine vs blocked on the shallow circuit DAG ----
    try:
        from benchmarks.bench_gen import circuit_profile, build_csr
        from aoclsparse_tpu.planner.triangular import (
            trsv_form_for,
            trsv_level_form_for,
        )

        mc = 262144
        r_, c_ = circuit_profile(rng, mc)
        # full diagonal (solves need it)
        r_ = np.concatenate([r_, np.arange(mc, dtype=r_.dtype)])
        c_ = np.concatenate([c_, np.arange(mc, dtype=c_.dtype)])
        cptr, cind, cval = build_csr(r_, c_, mc, rng=rng)
        dsel = cind == np.repeat(np.arange(mc), np.diff(cptr))
        cval[dsel] = np.abs(cval[dsel]) + 8.0
        # keep the lower triangle pattern implicitly via the descriptor
        Ac = ast.create_csr(mc, mc, cptr, cind, cval)
        descr_t = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower)
        plc = get_plan(Ac)
        lf = trsv_level_form_for(plc, descr_t, Operation.none)
        bf = trsv_form_for(plc, descr_t, Operation.none)
        bc = jnp.asarray(rng.standard_normal(mc).astype(np.float32))
        emit({"probe": "r4_trsv_level_setup", "nlev": lf.nlev, "R_max": lf.R_max,
              "W_max": lf.W_max, "runs": len(lf.runs),
              "padded_old": int(lf.nlev * lf.R_max * (lf.W_max + 1)),
              "padded_new": int(sum((hi - lo) * Rr * (Wr + 1)
                                    for lo, hi, Rr, Wr in lf.runs))})

        def time_solver(solve):
            @jax.jit
            def loop(eps, b0):
                def body(i, carry):
                    r, acc = carry
                    z = solve(r)
                    return (r.at[:128].add(eps * z[:128]), acc + z[0])

                _, acc = jax.lax.fori_loop(0, R, body, (b0, jnp.float32(0.0)))
                return acc

            float(loop(jnp.float32(1e-7), bc))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop(jnp.float32(1e-7), bc))
                best = min(best, (time.perf_counter() - t0) / R)
            return best

        t_lvl = time_solver(lf.solve)
        from aoclsparse_tpu.solvers.ilu import _apply_form

        t_blk = time_solver(lambda r: _apply_form(bf, r))
        emit({"probe": "r4_trsv_level_ab", "level_us": round(t_lvl * 1e6, 1),
              "blocked_us": round(t_blk * 1e6, 1),
              "speedup": round(t_blk / t_lvl, 2)})
    except Exception as e:
        emit({"probe": "r4_trsv_level_ab", "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
