#!/usr/bin/env python
"""Round-4 SpGEMM device-engine probe (VERDICT r3 item 3).

Same operand as the suite's spgemm rows (m=65536 band, 16.7M products):
A/B the Pallas grid-parallel band kernel vs the lax.scan engine vs the
native host engine, with and without the CSR extraction gather, all in the
same window. Appends to PROBE_r4.jsonl.
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
    from aoclsparse_tpu import Operation
    from aoclsparse_tpu.core.descr import GENERAL
    from aoclsparse_tpu.kernels.xla.spgemm_band import (
        _band_gemm_scan,
        _ensure_streams,
        band_gemm_cband,
        build_band_gemm_plan,
    )
    from aoclsparse_tpu.ops.level3.spgemm import _effective, _symbolic
    from benchmarks.suite import banded

    rng = np.random.default_rng(7)
    mA = 65536
    ptr2, ind2, val2 = banded(rng, mA, mA, 32, 16)
    A2 = ast.create_csr(mA, mA, ptr2, ind2, val2)
    effA = _effective(A2, GENERAL, Operation.none)
    t0 = time.perf_counter()
    plan2 = _symbolic(effA, effA)
    t_sym = time.perf_counter() - t0
    P = int(np.asarray(plan2.pa).shape[0])

    gp = build_band_gemm_plan(effA, effA, plan2.ptr, plan2.ind, G=512, force=True)
    assert gp is not None
    emit({"probe": "r4_spgemm_setup", "P_M": round(P / 1e6, 1),
          "nnzC_M": round(plan2.nnz / 1e6, 2), "sym_s": round(t_sym, 2),
          "G": gp.G, "WA": gp.WA, "WB": gp.WB, "WC": gp.WC,
          "nstream": gp.nstream, "nblk": gp.nblk})

    # host reference values for correctness
    from aoclsparse_tpu import native as nat

    cv_host = nat.spgemm_numeric_host(
        np.asarray(plan2.pa), np.asarray(plan2.pb), np.asarray(plan2.pc),
        np.asarray(effA.val), np.asarray(effA.val), plan2.nnz)

    ex = jnp.asarray(gp.extract_idx)

    def values_from(cband):
        return cband.reshape(-1)[ex]

    # pallas engine (band_gemm_cband default on TPU)
    os.environ["AOCLSPARSE_TPU_SPGEMM_PALLAS"] = "1"
    t0 = time.perf_counter()
    cb = band_gemm_cband(gp, effA.val, effA.val)
    v = np.asarray(values_from(cb))
    t_first = time.perf_counter() - t0
    rel = float(np.abs(v - cv_host).max() / max(1.0, np.abs(cv_host).max()))
    emit({"probe": "r4_spgemm_pallas_check", "rel_err": rel,
          "t_first_s": round(t_first, 2)})

    def timeit(fn, iters=5, chunks=4, fetch=lambda r: np.asarray(np.ravel(np.asarray(r))[:1])):
        fetch(fn())
        best = float("inf")
        for _ in range(chunks):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn()
            fetch(r)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    rec = {"probe": "r4_spgemm_ab", "P_M": round(P / 1e6, 1)}
    # cband only (lazy values, the chained-product path)
    t_pal_band = timeit(lambda: band_gemm_cband(gp, effA.val, effA.val))
    rec["pallas_cband_ms"] = round(t_pal_band * 1e3, 2)
    # cband + extraction
    t_pal_full = timeit(lambda: values_from(band_gemm_cband(gp, effA.val, effA.val)))
    rec["pallas_values_ms"] = round(t_pal_full * 1e3, 2)
    rec["pallas_values_gflops"] = round(2 * P / t_pal_full / 1e9, 2)
    # scan engine same window
    os.environ["AOCLSPARSE_TPU_SPGEMM_PALLAS"] = "0"
    try:
        streams = _ensure_streams(gp)
        t_scan = timeit(
            lambda: _band_gemm_scan(
                gp.formA.bwd_val, streams, G=gp.G, WB=gp.WB, WC=gp.WC,
                ranges=gp.stream_ranges),
            iters=2, chunks=3)
        rec["scan_cband_ms"] = round(t_scan * 1e3, 2)
    except Exception as e:
        rec["scan_err"] = repr(e)[:120]
    os.environ["AOCLSPARSE_TPU_SPGEMM_PALLAS"] = "1"
    # host engine same window
    pa_h, pb_h, pc_h = np.asarray(plan2.pa), np.asarray(plan2.pb), np.asarray(plan2.pc)
    av_h = np.asarray(effA.val)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        nat.spgemm_numeric_host(pa_h, pb_h, pc_h, av_h, av_h, plan2.nnz)
        best = min(best, time.perf_counter() - t0)
    rec["host_ms"] = round(best * 1e3, 2)
    emit(rec)

    # G sweep for the pallas engine (tile geometry)
    for G in (128, 256):
        try:
            gpg = build_band_gemm_plan(effA, effA, plan2.ptr, plan2.ind, G=G, force=True)
            if gpg is None:
                emit({"probe": "r4_spgemm_gsweep", "G": G, "skip": "no plan"})
                continue
            exg = jnp.asarray(gpg.extract_idx)
            t_b = timeit(lambda: band_gemm_cband(gpg, effA.val, effA.val))
            t_f = timeit(lambda: band_gemm_cband(gpg, effA.val, effA.val).reshape(-1)[exg])
            emit({"probe": "r4_spgemm_gsweep", "G": G, "WA": gpg.WA, "WC": gpg.WC,
                  "cband_ms": round(t_b * 1e3, 2), "values_ms": round(t_f * 1e3, 2)})
        except Exception as e:
            emit({"probe": "r4_spgemm_gsweep", "G": G, "error": repr(e)[:120]})


if __name__ == "__main__":
    main()
