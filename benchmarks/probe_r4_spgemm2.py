#!/usr/bin/env python
"""Round-4 SpGEMM pallas-kernel decomposition probe: chained amortized
timing (operands as jit args, scalar fetch), kernel vs extraction split,
G sweep, precision check after the HIGHEST fix. Appends to PROBE_r4.jsonl."""

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
    from aoclsparse_tpu.kernels.pallas.spgemm import pallas_band_gemm
    from aoclsparse_tpu.kernels.xla.spgemm_band import build_band_gemm_plan
    from aoclsparse_tpu.ops.level3.spgemm import _effective, _symbolic
    from aoclsparse_tpu import native as nat
    from benchmarks.suite import banded

    rng = np.random.default_rng(7)
    mA = 65536
    ptr2, ind2, val2 = banded(rng, mA, mA, 32, 16)
    A2 = ast.create_csr(mA, mA, ptr2, ind2, val2)
    effA = _effective(A2, GENERAL, Operation.none)
    plan2 = _symbolic(effA, effA)
    P = int(plan2.P)
    cv_host = nat.spgemm_numeric_host(
        np.asarray(plan2.pa), np.asarray(plan2.pb), np.asarray(plan2.pc),
        np.asarray(effA.val), np.asarray(effA.val), plan2.nnz)

    R = 10

    for G in (128, 512):
        gp = build_band_gemm_plan(effA, effA, plan2.ptr, plan2.ind, G=G, force=True)
        if gp is None:
            emit({"probe": "r4b_spgemm", "G": G, "skip": True})
            continue
        gp.formA.refresh(effA.val)
        gp.formB.refresh(effA.val)
        Ab = gp.formA.bwd_val
        Bb = gp.formB.bwd_val
        ex = jnp.asarray(gp.extract_idx)

        @jax.jit
        def kloop(eps, Aa, Ba):
            def body(i, carry):
                Ac, acc = carry
                cb = pallas_band_gemm(
                    Ac, Ba, G=gp.G, WB=gp.WB, WC=gp.WC, d0=gp.d0,
                    ranges=gp.stream_ranges)
                return (Ac.at[0, 0, 0].add(eps * cb[0, 0, 0]), acc + cb[0, 0, 0])

            _, acc = jax.lax.fori_loop(0, R, body, (Aa, jnp.float32(0.0)))
            return acc

        @jax.jit
        def floop(eps, Aa, Ba, exa):
            def body(i, carry):
                Ac, acc = carry
                cb = pallas_band_gemm(
                    Ac, Ba, G=gp.G, WB=gp.WB, WC=gp.WC, d0=gp.d0,
                    ranges=gp.stream_ranges)
                v = cb.reshape(-1)[exa]
                return (Ac.at[0, 0, 0].add(eps * v[0]), acc + v[0])

            _, acc = jax.lax.fori_loop(0, R, body, (Aa, jnp.float32(0.0)))
            return acc

        rec = {"probe": "r4b_spgemm", "G": G, "WA": gp.WA, "WC": gp.WC,
               "nstream": gp.nstream, "nblk": gp.nblk}
        # correctness after the precision fix
        try:
            cb = pallas_band_gemm(Ab, Bb, G=gp.G, WB=gp.WB, WC=gp.WC, d0=gp.d0,
                                  ranges=gp.stream_ranges)
            v = np.asarray(cb.reshape(-1)[ex])
            rec["rel_err"] = float(
                np.abs(v - cv_host).max() / max(1.0, np.abs(cv_host).max()))
        except Exception as e:
            rec["kernel_err"] = repr(e)[:160]
            emit(rec)
            continue
        for name, loop, args in (
            ("kernel_ms", kloop, (Ab, Bb)),
            ("full_ms", floop, (Ab, Bb, ex)),
        ):
            try:
                float(loop(jnp.float32(1e-30), *args))
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(loop(jnp.float32(1e-30), *args))
                    best = min(best, (time.perf_counter() - t0) / R)
                rec[name] = round(best * 1e3, 2)
            except Exception as e:
                rec[name + "_err"] = repr(e)[:160]
        emit(rec)

    # host same-window for reference
    pa_h, pb_h, pc_h = np.asarray(plan2.pa), np.asarray(plan2.pb), np.asarray(plan2.pc)
    av_h = np.asarray(effA.val)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        nat.spgemm_numeric_host(pa_h, pb_h, pc_h, av_h, av_h, plan2.nnz)
        best = min(best, time.perf_counter() - t0)
    emit({"probe": "r4b_spgemm_host", "host_ms": round(best * 1e3, 2),
          "P_M": round(P / 1e6, 1)})


if __name__ == "__main__":
    main()
