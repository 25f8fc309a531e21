#!/usr/bin/env python
"""Probe 6: window-hunting A/B — v1 (1,TM) kernel vs acc8 (8,TM) kernel,
f32 and bf16, on the cant-class band. Throttled windows flatten every
variant to the same tunnel-bound ~1.1 ms (probe round 3), so this loops
rounds with sleeps and reports per-round numbers next to the round's own
dense-stream rate; the discriminating data is the best-stream round.

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

    from aoclsparse_tpu.kernels.pallas.spmv import pallas_spmv_band_t

    def _kernel_t8(vt_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int, VS: int):
        x0 = x0_ref[:].reshape(1, TM)
        x1 = x1_ref[:].reshape(1, TM)
        xwin = jnp.concatenate([x0, x1], axis=1)
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
        for k in (4, 2, 1):
            acc8 = acc8 + pltpu.roll(acc8, k, axis=0)
        out_ref[:] = acc8[0:1, :].reshape(8, TM // 8)

    @partial(jax.jit, static_argnames=("W", "start", "TMk"))
    def band_t8(vt, xe, W: int, start: int, TMk: int = 1024):
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
            partial(_kernel_t8, TM=TMk, W=W, VS=VS),
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
    vt_j = jnp.asarray(vt)
    vt_b = jnp.asarray(vt.astype(jnp.bfloat16))
    xe_j = jnp.asarray(xe)
    big = jnp.asarray(rng.standard_normal(64 * 1024 * 1024 // 4).astype(np.float32))
    sfn = jax.jit(lambda v: v.sum())

    def timeit(fn, iters=25, chunks=3):
        y = fn()
        np.asarray(y[:1] if getattr(y, "ndim", 0) else y)
        best = float("inf")
        for _ in range(chunks):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn()
            np.asarray(y[:1] if getattr(y, "ndim", 0) else y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    variants = (
        ("v1_2048", lambda: pallas_spmv_band_t(vt_j, xe_j, W16, start, TM=2048)),
        ("v1_1024", lambda: pallas_spmv_band_t(vt_j, xe_j, W16, start, TM=1024)),
        ("t8_f32", lambda: band_t8(vt_j, xe_j, W16, start, TMk=1024)),
        ("t8_bf16", lambda: band_t8(vt_b, xe_j, W16, start, TMk=1024)),
    )
    best_stream = 0.0
    deadline = time.time() + 40 * 60
    rnd = 0
    while time.time() < deadline:
        rnd += 1
        ts = timeit(lambda: sfn(big), iters=4, chunks=2)
        stream = big.size * 4 / ts / 1e9
        rec = {"probe": "d_round", "round": rnd, "stream_gbps": round(stream, 1)}
        for name, fn in variants:
            rec[name + "_us"] = round(timeit(fn) * 1e6, 1)
        emit(rec)
        best_stream = max(best_stream, stream)
        if stream >= 150:
            break
        time.sleep(75)
    emit({"probe": "d_done", "best_stream": round(best_stream, 1)})


if __name__ == "__main__":
    main()
