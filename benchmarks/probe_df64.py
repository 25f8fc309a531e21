#!/usr/bin/env python
"""Probe: df64 band kernel (mv KID 13) compiled on the real chip.

SUITE_r3a found 'tpu.dynamic_rotate op operand #1 must be 32-bit' — the
pltpu.roll shift traced as i64 under jax_enable_x64. This verifies the
np.int32 shift fix compiles + matches the f64 oracle on-device, and times
the amortized loop. One JSON line per result.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.kernels.pallas.spmv import spmv_bandv_df
    from aoclsparse_tpu.planner.plan import get_plan

    rng = np.random.default_rng(7)
    m = n = 262144
    row_nnz, half_bw = 64, 64
    win = 2 * half_bw
    base = np.clip(np.arange(m) - half_bw, 0, n - win)
    pick = np.argsort(rng.random((m, win)), axis=1)[:, :row_nnz]
    cols = np.sort(base[:, None] + pick, axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * row_nnz
    val = rng.standard_normal(m * row_nnz)
    nnz = m * row_nnz

    A64 = ast.create_csr(m, n, ptr, cols.reshape(-1).astype(np.int32), val)
    fdf = get_plan(A64).exec_form_for(
        MatrixDescriptor(), Operation.none, kind="bandt", dtype=np.float64
    )
    vt4h, vt4l = fdf.bandt_vertical_df(TM=2048)
    Wdf = vt4h.shape[0] // 8
    x64 = jnp.asarray(rng.standard_normal(n))
    zi = jnp.zeros((0,), jnp.int32)
    zv = jnp.zeros((0,), jnp.float64)
    has_spill = fdf.sp_ind is not None and bool(fdf.sp_ind.shape[0])
    sp_v = fdf.sp_val if has_spill else zv
    sp_i = fdf.sp_ind if has_spill else zi
    sp_r = fdf.sp_rows if has_spill else zi

    t0 = time.perf_counter()
    y = spmv_bandv_df(
        vt4h, vt4l, x64, sp_v, sp_i, sp_r,
        m=fdf.m, W=Wdf, padL=fdf.bwd_padL, start=fdf.bandt_start, TM=2048,
        has_spill=has_spill,
    )
    yh = np.asarray(y)
    t_compile = time.perf_counter() - t0
    # f64 oracle on a slice of rows (full host oracle is slow)
    rows = np.arange(0, m, 1013)
    xv = np.asarray(x64)
    ref = np.array([np.dot(val[r * row_nnz:(r + 1) * row_nnz], xv[cols[r]]) for r in rows])
    relerr = float(np.max(np.abs(yh[rows] - ref) / np.maximum(np.abs(ref), 1e-300)))
    print(json.dumps({"metric": "df64_compiled_relerr", "value": relerr,
                      "compile_s": round(t_compile, 1)}), flush=True)

    @jax.jit
    def loop(eps, vh, vl, x0):
        def body(i, carry):
            xc, acc = carry
            yy = spmv_bandv_df(
                vh, vl, xc, sp_v, sp_i, sp_r,
                m=fdf.m, W=Wdf, padL=fdf.bwd_padL, start=fdf.bandt_start, TM=2048,
                has_spill=has_spill,
            )
            return (xc + eps * yy, acc + yy[0])

        _, acc = jax.lax.fori_loop(0, 20, body, (x0, jnp.float64(0.0)))
        return acc

    float(loop(jnp.float64(1e-9), vt4h, vt4l, x64))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(2):
            acc = loop(jnp.float64(1e-9), vt4h, vt4l, x64)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / 40)
    gb = ((m + 1 + nnz) * 4 + (nnz + n + m) * 8) / 1e9
    print(json.dumps({"metric": "spmv_band_df64", "value": round(gb / best, 2),
                      "unit": "GB/s(effective,amortized)",
                      "extra": {"t_periter_us": round(best * 1e6, 1),
                                "gnnz_s": round(nnz / best / 1e9, 2)}}), flush=True)


if __name__ == "__main__":
    main()
