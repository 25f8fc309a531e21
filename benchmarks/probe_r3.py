#!/usr/bin/env python
"""Round-3 kernel A/B probe on the headline band operand.

Round-2 concluded the pool's hot-operand share (~190 GB/s) was binding; a
fresh round-3 stream probe measured ~1 TB/s on a 128 MB fresh buffer, which
would mean the bandt kernel (763 us, stable across rounds) is KERNEL-bound:
its (1, TM) FMA chain uses one sublane in eight of every VPU tile. This
probe A/Bs, in one process / one window:

  stream512    sum over a 512 MB fresh buffer (rules out 128 MB VMEM
               residency explaining the 1 TB/s reading)
  copy256      read+write copy of 256 MB
  bandt        current default Pallas kernel, f32 (W, m) band
  bandv        vertical-layout kernel: band pre-transformed to the output's
               (8, TM/8) sublane distribution, every j a full-tile FMA
               (f32 + bf16 per-pair upcast — the ROADMAP "native bf16
               tile kernel" without the relayout)
  mxu_f32/bf16 block-window MXU form: (nblk, 256, 128) dense window blocks,
               (1, 256) @ (256, 128) lane-major dots (2x band bytes, but MXU)

Timing: chained dispatch + one fetch, best-of-chunks (tpu-pool-contention
methodology). Appends JSONL to benchmarks/PROBE_r3.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_r3.jsonl")
SESSION = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())


def emit(rec):
    rec.setdefault("session", SESSION)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_chunks(fn, fetch, iters=30, chunks=4, sleep=0.0):
    best = None
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        fetch(r)
        t = (time.perf_counter() - t0) / iters
        best = t if best is None else min(best, t)
        if sleep:
            time.sleep(sleep)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.kernels.pallas.spmv import (
        band_mxu_blocks,
        band_vert_layout,
        pallas_spmv_band_mxu,
        pallas_spmv_band_t,
        pallas_spmv_band_v,
    )
    from aoclsparse_tpu.planner.plan import get_plan

    dev = jax.devices()[0]
    emit({"event": "start", "device": str(dev)})

    # --- streams first (cheap compiles) ---
    rng = np.random.default_rng(7)
    N512 = 128 * 1024 * 1024  # 512 MB f32
    big = jnp.asarray(rng.standard_normal(N512, dtype=np.float32))
    ssum = jax.jit(lambda v: jnp.sum(v))
    float(ssum(big))
    t = time_chunks(lambda: ssum(big), lambda r: float(r), iters=8, chunks=4)
    emit({"probe": "stream512_read", "gbps": round(N512 * 4 / t / 1e9, 1), "t_us": round(t * 1e6, 1)})

    half = big[: N512 // 2]
    copy = jax.jit(lambda v: v * 2.0 + 1.0)
    np.asarray(copy(half)[:1])
    t = time_chunks(lambda: copy(half), lambda r: np.asarray(r[:1]), iters=8, chunks=4)
    emit({"probe": "copy256_rw", "gbps": round(N512 * 4 / t / 1e9, 1), "t_us": round(t * 1e6, 1),
          "note": "256MB read + 256MB write counted as 512MB moved"})

    # --- headline operand (bench.py profile: cant-class band) ---
    m = n = 262144
    row_nnz, half_bw = 64, 64
    win = 2 * half_bw
    base = np.clip(np.arange(m) - half_bw, 0, n - win)
    pick = np.argsort(rng.random((m, win)), axis=1)[:, :row_nnz]
    cols = np.sort(base[:, None] + pick, axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * row_nnz
    val = rng.standard_normal(m * row_nnz).astype(np.float32)
    nnz = m * row_nnz
    x = rng.standard_normal(n).astype(np.float32)

    A = ast.create_csr(m, n, ptr, cols.reshape(-1).astype(np.int32), val)
    ast.set_mv_hint(A, Operation.none, MatrixDescriptor(), nop=1000)
    plan = get_plan(A)
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bandt")
    W, padL, start = form.bwd_W, form.bwd_padL, form.bandt_start
    vt = form.bwd_val  # (W, m) f32 on device
    vt_np = np.asarray(vt)
    xe = jnp.pad(jnp.asarray(x), (padL, 0))
    isize, vsize = 4, 4
    gbytes_eff = ((m + 1 + nnz) * isize + (nnz + n + m) * vsize) / 1e9
    emit({"event": "operand", "m": m, "nnz": nnz, "W": W, "gbytes_eff": round(gbytes_eff, 4)})

    y_ref = None

    def report(name, fn, extra=None):
        nonlocal y_ref
        try:
            y = fn()
            yv = np.asarray(y)
        except Exception as e:
            emit({"probe": name, "error": repr(e)[:300]})
            return
        if y_ref is None:
            y_ref = yv.astype(np.float64)
            err = 0.0
        else:
            err = float(np.max(np.abs(yv - y_ref)) / np.max(np.abs(y_ref)))
        t = time_chunks(fn, lambda r: np.asarray(r[:1]), iters=30, chunks=4)
        rec = {"probe": name, "t_us": round(t * 1e6, 1),
               "gbs_eff": round(gbytes_eff / t, 1), "relerr": round(err, 7)}
        if extra:
            rec.update(extra)
        emit(rec)

    report("bandt_f32_tm2048", lambda: pallas_spmv_band_t(vt, xe, W, start, TM=2048))
    vt4 = jnp.asarray(band_vert_layout(vt_np, 2048))
    report("bandv_f32_tm2048", lambda: pallas_spmv_band_v(vt4, xe, W, start, TM=2048))
    vt4b = jnp.asarray(band_vert_layout(vt_np.astype(np.float32), 2048), dtype=jnp.bfloat16)
    report("bandv_bf16_tm2048", lambda: pallas_spmv_band_v(vt4b, xe, W, start, TM=2048))
    dt16 = jnp.asarray(band_mxu_blocks(vt_np, W), dtype=jnp.bfloat16)
    report("mxu_bf16_tm1024", lambda: pallas_spmv_band_mxu(dt16, xe, start, TM=1024))
    report("mxu_bf16_tm2048", lambda: pallas_spmv_band_mxu(dt16, xe, start, TM=2048))
    # re-time the champion + stream at the end to bracket the window
    report("bandt_f32_tm2048_post", lambda: pallas_spmv_band_t(vt, xe, W, start, TM=2048))
    report("bandv_bf16_tm2048_post", lambda: pallas_spmv_band_v(vt4b, xe, W, start, TM=2048))
    t = time_chunks(lambda: ssum(big), lambda r: float(r), iters=8, chunks=2)
    emit({"probe": "stream512_read_post", "gbps": round(N512 * 4 / t / 1e9, 1)})


if __name__ == "__main__":
    main()
