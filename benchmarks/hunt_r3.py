#!/usr/bin/env python
"""Round-3 good-window kernel hunter.

Compiles the band-SpMV kernel quartet up-front (bandt f32 / bandv f32 /
bandv bf16 / mxu bf16) on the headline cant-class operand, then loops:
sample the pool's read-stream rate; when it exceeds HUNT3_GOOD_GBPS
(default 200 — the VPU-chain kernel tops out ~190 GB/s effective, so only
faster windows can discriminate the designs), time all four back-to-back
plus the stream, and append to benchmarks/HUNT_r3.jsonl. Exits after
HUNT3_GOOD_ROUNDS good rounds (default 3) or HUNT3_HOURS (default 4).

Run as the ONLY TPU process.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "HUNT_r3.jsonl")
SESSION = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())


def emit(rec):
    rec.setdefault("session", SESSION)
    rec.setdefault("t", round(time.time()))
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
    from aoclsparse_tpu.kernels.pallas.spmv import (
        band_mxu_blocks,
        band_vert_layout,
        pallas_spmv_band_mxu,
        pallas_spmv_band_t,
        pallas_spmv_band_v,
    )
    from aoclsparse_tpu.planner.plan import get_plan

    good_gbps = float(os.environ.get("HUNT3_GOOD_GBPS", "170"))
    good_rounds = int(os.environ.get("HUNT3_GOOD_ROUNDS", "3"))
    hours = float(os.environ.get("HUNT3_HOURS", "4"))
    deadline = time.time() + hours * 3600

    rng = np.random.default_rng(7)
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
    vt = form.bwd_val
    vt_np = np.asarray(vt)
    xe = jnp.pad(jnp.asarray(x), (padL, 0))
    gbytes_eff = ((m + 1 + nnz) * 4 + (nnz + n + m) * 4) / 1e9

    vt4 = jnp.asarray(band_vert_layout(vt_np, 2048))
    vt4b = jnp.asarray(band_vert_layout(vt_np, 2048), dtype=jnp.bfloat16)
    dt16 = jnp.asarray(band_mxu_blocks(vt_np, W), dtype=jnp.bfloat16)

    # diagnostic: the same read-reduce as the XLA stream but as a Pallas
    # grid kernel — if its rate tracks the XLA stream the pool treats
    # custom calls like any program; if it pins at the band kernels' ~190
    # GB/s ceiling, Pallas programs are throttled differently
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from functools import partial as _part

    def _psum_kernel(x_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

    def pallas_stream(buf2d, TMS=512):
        nt = buf2d.shape[0] // TMS
        return pl.pallas_call(
            _psum_kernel,
            out_shape=jax.ShapeDtypeStruct((1, buf2d.shape[1]), jnp.float32),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((TMS, buf2d.shape[1]), lambda t: (t, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, buf2d.shape[1]), lambda t: (0, 0), memory_space=pltpu.VMEM),
        )(buf2d)

    stream2d = jnp.asarray(
        rng.standard_normal(32 * 1024 * 1024, dtype=np.float32).reshape(-1, 512)
    )
    pstream = jax.jit(_part(pallas_stream))

    kernels = {
        "bandt_f32": lambda: pallas_spmv_band_t(vt, xe, W, start, TM=2048),
        "bandt_f32_tm8192": lambda: pallas_spmv_band_t(vt, xe, W, start, TM=8192),
        "bandv_f32": lambda: pallas_spmv_band_v(vt4, xe, W, start, TM=2048),
        "bandv_bf16": lambda: pallas_spmv_band_v(vt4b, xe, W, start, TM=2048),
        "mxu_bf16": lambda: pallas_spmv_band_mxu(dt16, xe, start, TM=2048),
        "pallas_stream128mb": lambda: pstream(stream2d),
    }

    # ---- loop-amortized variants: round-12 baseline showed every Pallas
    # call lands at ~0.9-1.0 ms in a throttled window REGARDLESS of bytes
    # (64 vs 128 MB) or compute — a per-DISPATCH floor (tunnel RPC/pool
    # queuing), not bandwidth. R chained applications inside one program
    # (genuine dependency chain, runtime eps defeats CSE) measure the true
    # on-chip per-iteration time.
    R_LOOP = 50

    def _mk_loop(kernel_fn):
        @jax.jit
        def looped(eps):
            def body(i, carry):
                xe_c, acc = carry
                y = kernel_fn(xe_c)
                xe_c = xe_c.at[: y.shape[0]].add(eps * y)
                return (xe_c, acc + y[0])

            _, acc = jax.lax.fori_loop(0, R_LOOP, body, (xe, jnp.float32(0.0)))
            return acc

        return looped

    loop_bandt = _mk_loop(lambda xe_c: pallas_spmv_band_t(vt, xe_c, W, start, TM=2048))
    loop_bandv16 = _mk_loop(
        lambda xe_c: pallas_spmv_band_v(vt4b, xe_c, W, start, TM=2048)
    )
    loop_mxu16 = _mk_loop(lambda xe_c: pallas_spmv_band_mxu(dt16, xe_c, start, TM=2048))
    eps_v = jnp.float32(1e-7)

    # per-dispatch floor probe: a near-noop Pallas kernel (one (8, 128) tile)
    def _tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    tiny_in = jnp.ones((8, 128), jnp.float32)
    tiny = jax.jit(
        lambda v: pl.pallas_call(
            _tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(v)
    )

    stream_buf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024, dtype=np.float32))
    ssum = jax.jit(jnp.sum)

    kernels["noop_floor"] = lambda: tiny(tiny_in)
    kernels["loop50_bandt_f32"] = lambda: loop_bandt(eps_v)
    kernels["loop50_bandv_bf16"] = lambda: loop_bandv16(eps_v)
    kernels["loop50_mxu_bf16"] = lambda: loop_mxu16(eps_v)

    kbytes = {name: gbytes_eff for name in kernels}
    kbytes["pallas_stream128mb"] = 128 * 1024 * 1024 / 1e9  # raw bytes read
    kbytes["noop_floor"] = 0.0
    for _n in ("loop50_bandt_f32", "loop50_bandv_bf16", "loop50_mxu_bf16"):
        kbytes[_n] = gbytes_eff * R_LOOP  # per-call = R_LOOP SpMV applications

    # compile everything now (window time is for timing only); drop any
    # kernel whose Mosaic compile fails rather than losing the whole hunt
    for name, fn in list(kernels.items()):
        try:
            yv = np.asarray(fn())
            emit({"event": "compiled", "kernel": name, "y0": float(yv.ravel()[0])})
        except Exception as e:
            emit({"event": "compile_failed", "kernel": name, "error": repr(e)[:200]})
            del kernels[name]
    float(ssum(stream_buf))

    def stream_gbps(iters=6):
        t0 = time.perf_counter()
        for _ in range(iters):
            z = ssum(stream_buf)
        float(z)
        return stream_buf.size * 4 / ((time.perf_counter() - t0) / iters) / 1e9

    def time_kernel(fn, iters=30):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn()
        # fetch a single element, never the whole array (the tunnel bills
        # transfers; block_until_ready is a no-op through it)
        np.asarray(y if getattr(y, "ndim", 0) == 0 else y.reshape(-1)[:1])
        return (time.perf_counter() - t0) / iters

    good = 0
    rnd = 0
    while time.time() < deadline and good < good_rounds:
        rnd += 1
        s = stream_gbps()
        if s < good_gbps and rnd % 12 != 0:
            emit({"round": rnd, "stream_gbps": round(s, 1), "good": False})
            time.sleep(45)
            continue
        # every 12th round also time the quartet in a mediocre window: the
        # kernels' relative order is informative even when the absolute
        # rate is window-capped
        rec = {"round": rnd, "stream_gbps": round(s, 1), "good": s >= good_gbps}
        for name, fn in kernels.items():
            it = 3 if name.startswith("loop50") else 30
            t = min(time_kernel(fn, it), time_kernel(fn, it))
            if name.startswith("loop50"):
                rec[name + "_periter_us"] = round(t * 1e6 / 50, 1)
            rec[name + "_us"] = round(t * 1e6, 1)
            rec[name + "_gbs_eff"] = round(kbytes[name] / t, 1)
        rec["stream_gbps_post"] = round(stream_gbps(), 1)
        emit(rec)
        if rec["good"]:
            good += 1
    emit({"event": "done", "good_rounds": good})


if __name__ == "__main__":
    main()
