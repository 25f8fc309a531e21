#!/usr/bin/env python
"""Headline benchmark: CSR SpMV throughput vs HBM roofline.

Methodology is the reference's (BASELINE.md): GFLOP/s = 2*nnz/t
(tests/include/aoclsparse_flops.hpp:40-44), GB/s from the csrmv byte formula
(aoclsparse_gbyte.hpp:41-47), timed over --iters with min/median stats.
vs_baseline = achieved effective GB/s / (0.80 * peak HBM GB/s) — the
north-star target of >= 80% of the per-chip HBM roofline (BASELINE.json).

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aoclsparse_tpu.core.context import get_context
    from aoclsparse_tpu.kernels.xla.spmv import spmv_ell

    ctx = get_context()
    dtype = np.float32

    # cant-like operand: ~2M nnz, 64 nnz/row (FEM band structure)
    m = n = 32768
    row_nnz = 64
    rng = np.random.default_rng(7)
    # banded + random mix for realistic locality
    base = np.arange(m, dtype=np.int64)[:, None]
    band = base + rng.integers(-128, 128, size=(m, row_nnz))
    ind = np.clip(band, 0, n - 1).astype(np.int32)
    ind.sort(axis=1)
    val = rng.standard_normal((m, row_nnz)).astype(dtype)
    nnz = m * row_nnz
    x = rng.standard_normal(n).astype(dtype)

    ind_d = jnp.asarray(ind)
    val_d = jnp.asarray(val)
    x_d = jnp.asarray(x)

    fn = jax.jit(spmv_ell)
    y = fn(ind_d, val_d, x_d)
    y.block_until_ready()  # compile + warmup

    iters = 100
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        y = fn(ind_d, val_d, x_d)
        y.block_until_ready()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))

    isize = 4
    vsize = np.dtype(dtype).itemsize
    # csrmv_gbyte_count: (m+1+nnz)*int + (nnz+n+m)*T
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
                    "t_median_ms": round(t * 1e3, 4),
                    "t_min_ms": round(min(times) * 1e3, 4),
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
