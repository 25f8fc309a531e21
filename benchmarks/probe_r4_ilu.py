#!/usr/bin/env python
"""Round-4 ILU0 staging probe (VERDICT r3 item 4): where do the 21 s of
prep beyond the native factor go, and what does the apply/PCG iteration
actually cost after the host-value-flow fix?

Stages timed on the SUITE_r3d operand (m=262144, halfband 64, 64 nnz/row):
  plan/clean build, native IKJ factor, effective-triangle builds, host
  value maps, TrsvForm builds (numpy maps + host scatter + device upload),
  first apply (compile + Dinv + Pallas operand prep), amortized chained
  apply, and the suite's pcg_ilu0 row (m=65536) with per-phase detail.
Also measures raw host->device upload bandwidth for a 256 MB buffer (the
D-block transfer bound). Appends to PROBE_r4.jsonl.
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
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.planner.plan import get_plan, build_effective_csr
    from benchmarks.suite import banded

    rng = np.random.default_rng(7)

    # raw upload bandwidth (the D transfer bound)
    buf = np.ones(64 * 1024 * 1024, np.float32)  # 256 MB
    t0 = time.perf_counter()
    d = jnp.asarray(buf)
    d.block_until_ready()
    t_up = time.perf_counter() - t0
    emit({"probe": "r4_ilu_upload", "mb": 256, "s": round(t_up, 3),
          "gbps": round(buf.nbytes / t_up / 1e9, 2)})
    del d, buf

    m = 262144
    ptr, ind, val = banded(rng, m, m, 64, 64, diag_boost=128.0)
    A = ast.create_csr(m, m, ptr, ind, val)

    t0 = time.perf_counter()
    plan = get_plan(A)
    clean = plan.clean
    t_plan = time.perf_counter() - t0

    from aoclsparse_tpu import native

    t0 = time.perf_counter()
    lu, _dg = native.ilu0_factor(clean.m, clean.ptr, clean.ind, np.asarray(clean.val))
    t_native = time.perf_counter() - t0

    # stage the rest of ilu0_factorize by hand with timings
    from aoclsparse_tpu.core.types import DiagType, FillMode, MatrixType
    from aoclsparse_tpu.planner.plan import CleanCSR
    from aoclsparse_tpu.planner.triangular import adaptive_nb, build_trsv_form

    lu_d = jnp.asarray(lu)
    lu_clean = CleanCSR(
        ptr=clean.ptr, ind=clean.ind, val=lu_d,
        perm=np.arange(lu.size, dtype=np.int64),
        idiag=clean.idiag, iurow=clean.iurow,
        has_diag=clean.has_diag, fulldiag=clean.fulldiag, shape=clean.shape,
    )
    l_descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.lower,
                               diag_type=DiagType.unit)
    u_descr = MatrixDescriptor(type=MatrixType.triangular, fill_mode=FillMode.upper,
                               diag_type=DiagType.non_unit)
    t0 = time.perf_counter()
    eff_l = build_effective_csr(lu_clean, l_descr, Operation.none)
    eff_u = build_effective_csr(lu_clean, u_descr, Operation.none)
    t_eff = time.perf_counter() - t0

    def hv(eff):
        src = np.asarray(eff.src, dtype=np.int64)
        return np.where(src >= 0, lu[np.maximum(src, 0)],
                        np.asarray(eff.const_val, dtype=lu.dtype))

    t0 = time.perf_counter()
    vl, vu = hv(eff_l), hv(eff_u)
    t_hv = time.perf_counter() - t0

    nb = adaptive_nb(m, dtype=lu.dtype)
    t0 = time.perf_counter()
    l_form = build_trsv_form(lu_clean, l_descr, Operation.none, ("ilu", "l"),
                             eff_l, nb, val_override=vl)
    t_build_l = time.perf_counter() - t0
    t0 = time.perf_counter()
    u_form = build_trsv_form(lu_clean, u_descr, Operation.none, ("ilu", "u"),
                             eff_u, nb, val_override=vu)
    t_build_u = time.perf_counter() - t0
    l_form.D.block_until_ready()
    u_form.D.block_until_ready()
    t_sync = time.perf_counter() - t0 - t_build_u

    emit({"probe": "r4_ilu_prep", "m": m, "nnz": int(ptr[-1]), "nb": nb,
          "t_plan": round(t_plan, 2), "t_native": round(t_native, 2),
          "t_eff": round(t_eff, 2), "t_hostvals": round(t_hv, 2),
          "t_build_l": round(t_build_l, 2), "t_build_u": round(t_build_u, 2),
          "t_upload_sync": round(t_sync, 2),
          "WL_l": l_form.WL, "WL_u": u_form.WL,
          "D_mb": round(l_form.D.nbytes / 1e6, 1),
          "Lval_mb": round(l_form.Lval.nbytes / 1e6, 1)})

    # full-path factorize on a FRESH matrix (same operand) for the honest
    # end-to-end number after the fixes
    A2 = ast.create_csr(m, m, ptr, ind, val.copy())
    from aoclsparse_tpu.solvers.ilu import ilu0_factorize
    t0 = time.perf_counter()
    st2 = ilu0_factorize(A2)
    st2.l_form.D.block_until_ready()
    st2.u_form.D.block_until_ready()
    t_total = time.perf_counter() - t0
    emit({"probe": "r4_ilu_factor_total", "t_total": round(t_total, 2),
          "t_native_ref": round(t_native, 2),
          "ratio_vs_native": round(t_total / max(t_native, 1e-9), 2)})

    # first + amortized apply: ALL operands as jit arguments (closures ship
    # as HLO constants -> HTTP 413 at this size)
    from functools import partial

    from aoclsparse_tpu.solvers.fused import _pallas_solve_operands
    from aoclsparse_tpu.kernels.pallas.trsv import pallas_trsv_win_inv8

    l_form, u_form = st2.l_form, st2.u_form
    dLT, lwLT = _pallas_solve_operands(l_form)
    dUT, lwUT = _pallas_solve_operands(u_form)
    b = rng.standard_normal(m).astype(np.float32)
    b_d = jnp.asarray(b)
    nbL, WLL, nbU, WLU = l_form.nb, l_form.WL, u_form.nb, u_form.WL
    mpadL, mpadU = dLT.shape[0] * nbL, dUT.shape[0] * nbU

    @partial(jax.jit, static_argnames=())
    def apply_loop(eps, b0, dLTa, lwLTa, dUTa, lwUTa):
        def one(r):
            zf = jnp.pad(r, (0, mpadL - m))
            z = pallas_trsv_win_inv8(dLTa, lwLTa, zf, nbL, WLL)[:m]
            uf = jnp.pad(z[::-1], (0, mpadU - m))
            u = pallas_trsv_win_inv8(dUTa, lwUTa, uf, nbU, WLU)[:m]
            return u[::-1]

        def body(i, carry):
            r, acc = carry
            z = one(r)
            return (r.at[:128].add(eps * z[:128]), acc + z[0])

        _, acc = jax.lax.fori_loop(0, 20, body, (b0, jnp.float32(0.0)))
        return acc

    apply_loop = partial(apply_loop, dLTa=dLT, lwLTa=lwLT, dUTa=dUT, lwUTa=lwUT)

    t0 = time.perf_counter()
    float(apply_loop(jnp.float32(1e-7), b_d))
    t_first = time.perf_counter() - t0
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        float(apply_loop(jnp.float32(1e-7), b_d))
        best = min(best, (time.perf_counter() - t0) / 20)
    nnz = int(ptr[-1])
    gb_ilu = ((m + 1 + nnz) * 4 + 2.0 * nnz * 4) / 1e9
    emit({"probe": "r4_ilu_apply", "t_first_s": round(t_first, 2),
          "t_apply_us": round(best * 1e6, 1),
          "gbs_csrilu0": round(gb_ilu / best, 1),
          "traffic_model_mb": round((l_form.D.nbytes + u_form.D.nbytes
                                     + l_form.Lval.nbytes + u_form.Lval.nbytes) / 1e6, 1)})

    # the suite's pcg_ilu0 row with phase detail
    from aoclsparse_tpu.solvers.fused import pcg_solve

    mF = 65536
    pF, iF, vF = banded(rng, mF, mF, 16, 9, diag_boost=64.0)
    AF = ast.create_csr(mF, mF, pF, iF, vF)
    bF = rng.standard_normal(mF).astype(np.float32)
    t0 = time.perf_counter()
    xF, itF, rnF = pcg_solve(AF, bF, rtol=1e-5, maxit=60, precond="ilu0")
    t_first_pcg = time.perf_counter() - t0
    best_pcg = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        xr, it, rn = pcg_solve(AF, bF, rtol=1e-5, maxit=60, precond="ilu0")
        best_pcg = min(best_pcg, time.perf_counter() - t0)
    emit({"probe": "r4_ilu_pcg", "m": mF, "iters": int(itF),
          "t_first_s": round(t_first_pcg, 2),
          "t_solve_ms": round(best_pcg * 1e3, 1),
          "ms_per_iter": round(best_pcg * 1e3 / max(itF, 1), 2)})


if __name__ == "__main__":
    main()
