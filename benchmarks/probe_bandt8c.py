#!/usr/bin/env python
"""Probe 5: full acc8 band kernels with the Mosaic-safe construct set:
XS via roll+iota (sublane-concat crashes), cross-sublane reduce via 3
wraparound sublane pltpu.rolls + aligned row-0 slice (sum(axis=0)'s
output layout can't reshape at TM=2048), unaligned lane slices (pass).

Variants: {rollreduce, sum} x {TM 2048, 1024} x {f32, bf16}.
Appends to benchmarks/PROBE_bandt8.jsonl.
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

    def mk_kernel(reduce_mode):
        def _kernel(vt_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int, VS: int):
            x0 = x0_ref[:].reshape(1, TM)
            x1 = x1_ref[:].reshape(1, TM)
            xwin = jnp.concatenate([x0, x1], axis=1)  # (1, 2TM)
            xb = jnp.broadcast_to(xwin, (8, 2 * TM))
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * TM), 0)
            XS = jnp.zeros((8, 2 * TM), xwin.dtype)
            for r in range(8):
                rolled = pltpu.roll(xb, 2 * TM - r, axis=1) if r else xb
                XS = jnp.where(rows == r, rolled, XS)
            acc8 = jnp.zeros((8, TM), dtype=out_ref.dtype)
            for j0 in range(0, W, VS):
                v = vt_ref[j0 : j0 + VS, :].astype(out_ref.dtype)
                for s in range(0, VS, 8):
                    acc8 = acc8 + v[s : s + 8, :] * XS[:, j0 + s : j0 + s + TM]
            if reduce_mode == "sum":
                y = jnp.sum(acc8, axis=0, keepdims=True)
            else:  # rollreduce: wraparound sublane rolls; row 0 = total
                for k in (4, 2, 1):
                    acc8 = acc8 + pltpu.roll(acc8, k, axis=0)
                y = acc8[0:1, :]
            out_ref[:] = y.reshape(8, TM // 8)

        return _kernel

    def band_t8(vt, xe, W, start, TMk, mode):
        Wm, m = vt.shape
        VS = 16 if vt.dtype == jnp.bfloat16 else 8
        ntile = -(-m // TMk)
        m_pad = ntile * TMk
        if m_pad != m:
            vt = jnp.pad(vt, ((0, 0), (0, m_pad - m)))
        coarse, rem = divmod(start, TMk)
        need = (ntile + coarse + 2) * TMk + rem
        if xe.shape[0] < need:
            xe = jnp.pad(xe, (0, need - xe.shape[0]))
        if rem:
            xe = jnp.roll(xe, -rem)
        nchunk = xe.shape[0] // TMk
        x2 = xe[: nchunk * TMk].reshape(nchunk * 8, TMk // 8)
        out = pl.pallas_call(
            partial(mk_kernel(mode), TM=TMk, W=W, VS=VS),
            out_shape=jax.ShapeDtypeStruct((ntile * 8, TMk // 8), jnp.float32),
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((W, TMk), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TMk // 8), lambda t: (t + coarse, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TMk // 8), lambda t: (t + coarse + 1, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, TMk // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(vt, x2, x2)
        return out.reshape(-1)[:m]

    rng = np.random.default_rng(7)
    m, W = 262144, 136
    W16 = -(-W // 16) * 16
    vt = rng.standard_normal((W16, m)).astype(np.float32)
    vt[W:] = 0.0
    x = rng.standard_normal(m).astype(np.float32)
    xe = np.pad(x, (W16, 0))
    start = 8
    y_ref = np.zeros(m, dtype=np.float64)
    for j in range(W):
        y_ref += vt[j].astype(np.float64) * xe[start + j : start + j + m]
    vt_j = jnp.asarray(vt)
    vt_b = jnp.asarray(vt.astype(jnp.bfloat16))
    xe_j = jnp.asarray(xe)

    fns = {}
    for TMk in (2048, 1024):
        for mode in ("rollred", "sum"):
            fns[(TMk, mode)] = jax.jit(
                partial(band_t8, TMk=TMk, mode="sum" if mode == "sum" else "rr"),
                static_argnames=("W", "start"),
            )

    def sync(y):
        np.asarray(y[:1] if getattr(y, "ndim", 0) else y)

    def timeit(fn, iters=30, chunks=5):
        y = fn()
        sync(y)
        best = float("inf")
        for _ in range(chunks):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn()
            sync(y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, y

    # same-window v1 reference + stream
    from aoclsparse_tpu.kernels.pallas.spmv import pallas_spmv_band_t

    big = jnp.asarray(rng.standard_normal(32 * 1024 * 1024 // 4).astype(np.float32))
    sfn = jax.jit(lambda v: v.sum())
    t = timeit(lambda: sfn(big), iters=6, chunks=3)[0]
    emit({"probe": "c_stream_gbps", "value": round(big.size * 4 / t / 1e9, 1)})
    t, _ = timeit(lambda: pallas_spmv_band_t(vt_j, xe_j, W16, start, TM=2048))
    emit({"probe": "c_v1_f32", "t_us": round(t * 1e6, 1)})

    for name, v, TMk, mode in (
        ("c_t8_rollred_f32_TM2048", vt_j, 2048, "rollred"),
        ("c_t8_sum_f32_TM1024", vt_j, 1024, "sum"),
        ("c_t8_rollred_f32_TM1024", vt_j, 1024, "rollred"),
        ("c_t8_rollred_bf16_TM2048", vt_b, 2048, "rollred"),
        ("c_t8_rollred_bf16_TM1024", vt_b, 1024, "rollred"),
    ):
        try:
            t, y = timeit(lambda: fns[(TMk, mode)](v, xe_j, W=W16, start=start))
        except Exception as e:
            emit({"probe": name, "error": str(e)[-500:]})
            continue
        err = float(np.max(np.abs(np.asarray(y, dtype=np.float64) - y_ref)))
        scale = float(np.max(np.abs(y_ref)))
        bytes_band = m * W16 * (2 if v.dtype == jnp.bfloat16 else 4)
        emit(
            {
                "probe": name,
                "t_us": round(t * 1e6, 1),
                "gbps_band": round(bytes_band / t / 1e9, 1),
                "rel_err": err / scale,
            }
        )


if __name__ == "__main__":
    main()
