#!/usr/bin/env python
"""Multi-op benchmark suite (reference: aoclsparse-bench drivers,
tests/benchmarks/aoclsparse_test.cpp + testing_*.hpp): SpMV / SpMM / TRSV /
CG on a cant-like banded operand, one JSON line per metric.

Run single-process on the TPU (see .claude/skills/verify gotchas).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain_time(run, iters=100):
    y = run()
    import jax

    jax.block_until_ready(y)
    np.asarray(np.ravel(np.asarray(y))[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run()
    np.asarray(np.ravel(np.asarray(y))[:1])
    return (time.perf_counter() - t0) / iters


def banded(rng, m, n, half_bw, row_nnz, dtype=np.float32, diag_boost=0.0):
    win = 2 * half_bw
    base = np.clip(np.arange(m) - half_bw, 0, n - win)
    pick = np.argsort(rng.random((m, win)), axis=1)[:, : row_nnz - 1]
    cols = base[:, None] + pick
    cols = np.concatenate([cols, np.minimum(np.arange(m), n - 1)[:, None]], axis=1)
    # unique+sort per row via lexsort trick
    cols = np.sort(cols, axis=1)
    dup = np.concatenate([np.zeros((m, 1), bool), cols[:, 1:] == cols[:, :-1]], axis=1)
    cols[dup] += 1  # nudge duplicates (stays in band)
    cols = np.sort(np.clip(cols, 0, n - 1), axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * cols.shape[1]
    val = rng.standard_normal(cols.size).astype(dtype)
    if diag_boost:
        isdiag = (cols == np.arange(m)[:, None]).reshape(-1)
        val[isdiag] = diag_boost
    return ptr, cols.reshape(-1).astype(np.int32), val


def main():
    import jax

    # persistent compile cache: remote compiles cost ~100s/kernel here
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, MatrixType, Operation
    from aoclsparse_tpu.core.context import get_context
    from aoclsparse_tpu.kernels.xla.spmm import spmm_bwd
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_form_for

    ctx = get_context()
    rng = np.random.default_rng(7)
    results = []

    m = n = 262144
    row_nnz, half_bw = 64, 64
    ptr, ind, val = banded(rng, m, n, half_bw, row_nnz, diag_boost=float(row_nnz))
    nnz = ind.size
    A = ast.create_csr(m, n, ptr, ind, val)
    plan = get_plan(A)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # ---- SpMV (bwd) ----
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none)
    if form.kind == "bwd":
        xp = jnp.pad(x, (form.bwd_padL, form.bwd_n_pad - form.bwd_padL - n))
        for mixed in (False, True):
            t = chain_time(
                lambda: spmv_bwd(form.bwd_val, xp, form.bwd_W, form.bwd_base8, form.bwd_n_pad, mixed)
            )
            gbytes = ((m + 1 + nnz) * 4 + (nnz + n + m) * 4) / 1e9
            results.append(
                {
                    "metric": f"spmv_f32{'_bf16mul' if mixed else ''}",
                    "value": round(gbytes / t, 2),
                    "unit": "GB/s(effective)",
                    "extra": {
                        "gflops": round(2 * nnz / t / 1e9, 1),
                        "gnnz_s": round(nnz / t / 1e9, 2),
                        "t_us": round(t * 1e6, 1),
                        "W": form.bwd_W,
                    },
                }
            )

    # ---- SpMM k=128 (bwdg) ----
    formg = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwdg")
    k = 128
    B = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    Bp = jnp.pad(B, ((formg.bwd_padL, formg.bwd_n_pad - formg.bwd_padL - n), (0, 0)))
    for mixed in (False, True):
        t = chain_time(
            lambda: spmm_bwd(
                formg.bwd_val, Bp, formg.bwd_G, formg.bwd_W, formg.bwd_base8, formg.bwd_n_pad, mixed
            ),
            iters=50,
        )
        results.append(
            {
                "metric": f"spmm_k{k}_f32{'_bf16mul' if mixed else ''}",
                "value": round(2 * nnz * k / t / 1e12, 3),
                "unit": "TFLOP/s",
                "extra": {"t_ms": round(t * 1e3, 3), "Wg": formg.bwd_W},
            }
        )

    # ---- TRSV (win) ----
    descr_t = MatrixDescriptor(type=MatrixType.triangular)
    tform = trsv_form_for(plan, descr_t, Operation.none)
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    m_pad = tform.nblk * tform.nb
    b2 = jnp.pad(b[:, None], ((0, m_pad - m), (0, 0)))
    t = chain_time(lambda: tform.solve(b2), iters=20)
    tri_nnz = int(np.sum(ind <= np.repeat(np.arange(m), row_nnz)))
    results.append(
        {
            "metric": "trsv_f32",
            "value": round((2 * tri_nnz - m) / t / 1e9, 2),
            "unit": "GFLOP/s",
            "extra": {"t_ms": round(t * 1e3, 3), "kind": tform.kind, "WL": tform.WL,
                      "nblk": tform.nblk},
        }
    )

    # ---- CG iteration throughput (jitted while_loop on bwd-like ELL) ----
    from aoclsparse_tpu.parallel.cg import cg_ell_jit

    form_e = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="ell")
    bb = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    t0 = time.perf_counter()
    xs, iters_done, rn = cg_ell_jit(
        form_e.ell_ind, form_e.ell_val, bb, jnp.zeros(m, jnp.float32),
        jnp.asarray(0.0, jnp.float32), jnp.asarray(1e-3, jnp.float32), 20,
    )
    np.asarray(xs[:1])
    t = (time.perf_counter() - t0) / max(int(iters_done), 1)
    results.append(
        {
            "metric": "cg_iter_time_ell",
            "value": round(t * 1e3, 2),
            "unit": "ms/iter",
            "extra": {"iters": int(iters_done), "note": "gather path incl. compile"},
        }
    )

    for r in results:
        r["device"] = ctx.device_kind
        print(json.dumps(r))


if __name__ == "__main__":
    main()
