#!/usr/bin/env python
"""Probe: 8-sublane-vectorized Pallas band SpMV (acc8 formulation) vs the
shipping _kernel_t, f32 and native-bf16 variants.

Why: _kernel_t iterates W times over (1, TM) slices — Mosaic lays a
(1, TM) value as 1 active sublane in (8, 128) vregs, so ~7/8 of the VPU
issue slots are wasted and the kernel is compute-bound (~847 us at
m=262144, W=136 where the HBM bound is ~180 us). The acc8 form builds 8
lane-shifted copies of the x window ONCE, then does W/8 iterations of
full-width (8, TM) FMAs and a single cross-sublane reduce at the end.
bf16 variant stores the band in bf16 (halves the dominant HBM stream) and
upcasts 16-sublane-aligned slabs in bulk (the earlier per-(1,TM)-slice
astype repacked a 16-sublane tile per row and lost to f32).

Appends JSON lines to benchmarks/PROBE_bandt8.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_bandt8.jsonl")


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aoclsparse_tpu.kernels.pallas.spmv import pallas_spmv_band_t

    # ---- acc8 kernel -----------------------------------------------------
    def _kernel_t8(vt_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int, VS: int):
        """acc8 form: 8 lane-shifted x-window copies built once, then W/VS
        aligned (VS, TM) slab FMAs; one cross-sublane reduce at the end.
        VS = 8 for f32 slabs, 16 for bf16 (tile-aligned bulk upcast)."""
        x0 = x0_ref[:].reshape(1, TM)
        x1 = x1_ref[:].reshape(1, TM)
        xwin = jnp.concatenate([x0, x1], axis=1)  # (1, 2TM)
        Lr = TM + W - 8
        XS = jnp.concatenate(
            [xwin[:, r : r + Lr] for r in range(8)], axis=0
        )  # (8, Lr): row r = xwin shifted r lanes
        acc8 = jnp.zeros((8, TM), dtype=out_ref.dtype)
        for j0 in range(0, W, VS):
            v = vt_ref[j0 : j0 + VS, :].astype(out_ref.dtype)  # aligned slice
            for s in range(0, VS, 8):
                acc8 = acc8 + v[s : s + 8, :] * XS[:, j0 + s : j0 + s + TM]
        out_ref[:] = jnp.sum(acc8, axis=0, keepdims=True).reshape(8, TM // 8)

    @partial(jax.jit, static_argnames=("W", "start", "TM"))
    def band_t8(vt, xe, W: int, start: int, TM: int = 2048):
        Wm, m = vt.shape
        VS = 16 if vt.dtype == jnp.bfloat16 else 8
        assert Wm == W and W <= TM and W % VS == 0
        ntile = -(-m // TM)
        m_pad = ntile * TM
        if m_pad != m:
            vt = jnp.pad(vt, ((0, 0), (0, m_pad - m)))
        coarse, rem = divmod(start, TM)
        need = (ntile + coarse + 2) * TM + rem
        if xe.shape[0] < need:
            xe = jnp.pad(xe, (0, need - xe.shape[0]))
        if rem:
            xe = jnp.roll(xe, -rem)
        nchunk = xe.shape[0] // TM
        x2 = xe[: nchunk * TM].reshape(nchunk * 8, TM // 8)
        out = pl.pallas_call(
            partial(_kernel_t8, TM=TM, W=W, VS=VS),
            out_shape=jax.ShapeDtypeStruct((ntile * 8, TM // 8), jnp.float32),
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((W, TM), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TM // 8), lambda t: (t + coarse, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TM // 8), lambda t: (t + coarse + 1, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, TM // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(vt, x2, x2)
        return out.reshape(-1)[:m]

    # ---- operands: cant-class band ---------------------------------------
    rng = np.random.default_rng(7)
    m, W = 262144, 136
    W16 = -(-W // 16) * 16  # 144
    vt = rng.standard_normal((W16, m)).astype(np.float32)
    vt[W:] = 0.0
    x = rng.standard_normal(m).astype(np.float32)
    xe = np.pad(x, (W16, 0))  # generous left pad; start offsets into it
    start = 8  # arbitrary non-chunk-aligned start to exercise the roll path

    vt_j = jnp.asarray(vt)
    vt_b = jnp.asarray(vt.astype(jnp.bfloat16))
    xe_j = jnp.asarray(xe)

    # oracle
    y_ref = np.zeros(m, dtype=np.float64)
    for j in range(W):
        y_ref += vt[j].astype(np.float64) * xe[start + j : start + j + m]

    def stream_cal():
        """Same-window dense-stream rate (GB/s) via a big copy-reduce."""
        a = jnp.asarray(rng.standard_normal(32 * 1024 * 1024 // 4).astype(np.float32))
        f = jax.jit(lambda v: v.sum())
        float(f(a))
        t0 = time.perf_counter()
        n = 6
        r = None
        for _ in range(n):
            r = f(a)
        float(r)
        dt = (time.perf_counter() - t0) / n
        return a.size * 4 / dt / 1e9

    def timeit(fn, iters=30, chunks=6):
        y = fn()
        np.asarray(y[:1])
        best = float("inf")
        for c in range(chunks):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn()
            np.asarray(y[:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, y

    variants = [
        ("t_v1_f32_TM2048", lambda: pallas_spmv_band_t(vt_j, xe_j, W16, start, TM=2048)),
        ("t8_f32_TM2048", lambda: band_t8(vt_j, xe_j, W16, start, TM=2048)),
        ("t8_bf16_TM2048", lambda: band_t8(vt_b, xe_j, W16, start, TM=2048)),
        ("t8_f32_TM4096", lambda: band_t8(vt_j, xe_j, W16, start, TM=4096)),
        ("t8_bf16_TM4096", lambda: band_t8(vt_b, xe_j, W16, start, TM=4096)),
    ]
    cal = stream_cal()
    emit({"probe": "stream_cal_gbps", "value": round(cal, 1)})
    for name, fn in variants:
        try:
            t, y = timeit(fn)
        except Exception as e:  # Mosaic compile failures expected territory
            emit({"probe": name, "error": str(e)[:300]})
            continue
        err = float(np.max(np.abs(np.asarray(y, dtype=np.float64) - y_ref)))
        scale = float(np.max(np.abs(y_ref)))
        bytes_band = m * W16 * (2 if "bf16" in name else 4)
        emit(
            {
                "probe": name,
                "t_us": round(t * 1e6, 1),
                "gbps_band": round(bytes_band / t / 1e9, 1),
                "gnnz_s": round(m * W / t / 1e9, 2),
                "rel_err": err / scale,
            }
        )


if __name__ == "__main__":
    main()
