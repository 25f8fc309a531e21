#!/usr/bin/env python
"""Headline benchmark: CSR SpMV through the planner (banded-window TPU form).

Methodology is the reference's (BASELINE.md): GFLOP/s = 2*nnz/t
(tests/include/aoclsparse_flops.hpp:40-44), effective GB/s from the csrmv
byte formula (aoclsparse_gbyte.hpp:41-47) — i.e. *useful* bytes, so the
banded form's padding overhead counts against us. vs_baseline = achieved
effective GB/s / (0.80 * peak HBM GB/s), the >=80%-of-roofline north star.

Timing: N chained dispatches, one device sync, divide — the remote-tunnel
sync latency (~27 ms) would otherwise swamp sub-ms kernels.

Operand: cant-like FEM band profile (m=262144, 64 nnz/row, halfband 64 —
matching the SuiteSparse suite's cant/consph shape class, BASELINE.md).

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu.core.context import get_context
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd, spmv_ell
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu import MatrixDescriptor, Operation

    ctx = get_context()
    dtype = np.float32

    m = n = 262144
    row_nnz = 64
    half_bw = 64
    rng = np.random.default_rng(7)
    # cant-like banded pattern: per row, 64 distinct columns drawn from a
    # 128-wide window centered on the diagonal (50% band fill, FEM-like)
    win = 2 * half_bw
    base = np.clip(np.arange(m) - half_bw, 0, n - win)
    pick = np.argsort(rng.random((m, win)), axis=1)[:, :row_nnz]
    cols = np.sort(base[:, None] + pick, axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * row_nnz
    val = rng.standard_normal(m * row_nnz).astype(dtype)
    nnz = m * row_nnz
    x = rng.standard_normal(n).astype(dtype)

    A = ast.create_csr(m, n, ptr, cols.reshape(-1).astype(np.int32), val)
    ast.set_mv_hint(A, Operation.none, MatrixDescriptor(), nop=1000)
    plan = get_plan(A)
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none)
    x_d = jnp.asarray(x)

    from aoclsparse_tpu.ops.level2.mv import _run_exec_form

    def run():
        # the library's actual dispatch path for this form (band kernel +
        # edge-peel spill when the planner created one)
        return _run_exec_form(form, x_d, None)

    # warmup / compile
    y = run()
    jax.block_until_ready(y)
    np.asarray(y[:1])

    # best-of-chunks chained timing: the TPU pool behind the tunnel is
    # contended (identical kernels vary 2-100x between windows); min over
    # chunks is the honest kernel time
    deadline = time.perf_counter() + 150.0  # overall sampling budget
    iters_per, chunks = 40, 12
    t = float("inf")
    for c in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters_per):
            y = run()
        np.asarray(y[:1])  # one sync per chunk
        t = min(t, (time.perf_counter() - t0) / iters_per)
        if time.perf_counter() > deadline:
            break
        if c % 4 == 3:
            time.sleep(2.0)  # sample across throttle sub-windows

    # secondary: bf16-multiply variant (f32 accumulate) for the extras field
    # (skipped when the sampling budget is already spent — compile costs
    # ~100 s through the remote tunnel)
    t_bf16 = None
    if form.kind == "bwd" and time.perf_counter() < deadline - 30:
        import os as _os

        _os.environ["AOCLSPARSE_TPU_MIXED_PRECISION"] = "1"
        try:
            y = run()
            np.asarray(y[:1])
            t_bf16 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(30):
                    y = run()
                np.asarray(y[:1])
                t_bf16 = min(t_bf16, (time.perf_counter() - t0) / 30)
        except Exception:
            t_bf16 = None
        finally:
            _os.environ.pop("AOCLSPARSE_TPU_MIXED_PRECISION", None)

    isize = 4
    vsize = np.dtype(dtype).itemsize
    gbytes = ((m + 1 + nnz) * isize + (nnz + n + m) * vsize) / 1e9
    gflops = 2.0 * nnz / 1e9 / t
    gbs = gbytes / t
    roofline = 0.80 * ctx.hbm_gbps
    print(
        json.dumps(
            {
                "metric": "spmv_csr_f32_gbs",
                "value": round(gbs, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbs / roofline, 4),
                "extra": {
                    "gflops": round(gflops, 3),
                    "gnnz_per_s": round(nnz / t / 1e9, 3),
                    "bf16mul_gnnz_per_s": round(nnz / t_bf16 / 1e9, 3) if t_bf16 else None,
                    "t_iter_us": round(t * 1e6, 2),
                    "exec_form": form.kind,
                    "bwd_W": getattr(form, "bwd_W", None),
                    "m": m,
                    "nnz": nnz,
                    "device": ctx.device_kind,
                    "hbm_peak_gbps": ctx.hbm_gbps,
                    "target": "0.80*HBM roofline (BASELINE.md)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
