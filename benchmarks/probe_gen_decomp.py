#!/usr/bin/env python
"""Probe: where does the circuit-profile gen SpMV's time actually go?

BENCH_gen shows ~2.9 ms/call with spill 98k AND with spill 4.7k (different
windows) — so the spill-gather theory of the cost needs a same-window
decomposition. This runs, in ONE process (one pool window), the full gen
dispatch and ablations: no-spill, no-hub, band-only (Pallas), permutes
only, and an empty dispatch (floor), plus a dense-stream calibration.

Appends JSON lines to benchmarks/PROBE_gen_decomp.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_gen_decomp.jsonl")


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

    from bench_gen import build_csr, circuit_profile

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.kernels.pallas.spmv import pallas_spmv_band_t
    from aoclsparse_tpu.kernels.xla.spmv import spmv_gen_bandt
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form
    from aoclsparse_tpu.planner.plan import get_plan

    rng = np.random.default_rng(11)
    m = 262144
    descr = MatrixDescriptor()
    r, c = circuit_profile(rng, m)
    ptr, ind, val = build_csr(r, c, m, rng=rng)
    A = ast.create_csr(m, m, ptr, ind, val)
    t0 = time.perf_counter()
    plan = get_plan(A)
    form = plan.exec_form_for(descr, Operation.none, dtype=A.dtype)
    emit({"probe": "plan_s", "value": round(time.perf_counter() - t0, 2), "form": form.kind})
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def timeit(fn, iters=30, chunks=5):
        y = fn()
        np.asarray(y[:1] if hasattr(y, "shape") and y.shape else y)
        best = float("inf")
        for _ in range(chunks):
            t1 = time.perf_counter()
            for _ in range(iters):
                y = fn()
            np.asarray(y[:1] if hasattr(y, "shape") and y.shape else y)
            best = min(best, (time.perf_counter() - t1) / iters)
        return best

    # same-window dense stream
    big = jnp.asarray(rng.standard_normal(32 * 1024 * 1024 // 4).astype(np.float32))
    sfn = jax.jit(lambda v: v.sum())
    t = timeit(lambda: sfn(big), iters=6, chunks=4)
    emit({"probe": "stream_gbps", "value": round(big.size * 4 / t / 1e9, 1)})

    assert form.kind == "gen" and form.gen_bandt
    has_spill = form.sp_ind is not None and bool(form.sp_ind.shape[0])
    has_hub = form.hub_cols is not None and bool(form.hub_cols.shape[0])
    has_hubrow = form.hubr_rows is not None and bool(form.hubr_rows.shape[0])
    has_flip = form.gen_flip is not None
    zero_i = jnp.zeros((0,), jnp.int32)
    zero_v = jnp.zeros((0,), x.dtype)
    zero_m = jnp.zeros((0, 0), x.dtype)
    zero_b = jnp.zeros((0,), jnp.bool_)
    emit(
        {
            "probe": "form_geom",
            "W": form.bwd_W,
            "hub_k": int(form.hub_cols.shape[0]) if has_hub else 0,
            "spill": int(form.sp_ind.shape[0]) if has_spill else 0,
            "flips": int(np.asarray(form.gen_flip).sum()) if has_flip else 0,
        }
    )

    def run_variant(spill, hub, hubrow, flip):
        return spmv_gen_bandt(
            form.bwd_val,
            x,
            form.gen_perm,
            form.gen_out,
            form.gen_flip if flip else zero_b,
            form.hub_slab if hub else zero_m,
            form.hub_cols if hub else zero_i,
            form.hubr_slab if hubrow else zero_m,
            form.hubr_rows if hubrow else zero_i,
            form.sp_val if spill else zero_v,
            form.sp_ind if spill else zero_i,
            form.sp_rows if spill else zero_i,
            B=form.gen_B,
            W=form.bwd_W,
            padL=form.bwd_padL,
            start=form.bandt_start,
            TM=2048,
            m=form.m,
            m_pad=form.gen_m_pad,
            interpret=False,
            has_hub=hub,
            has_hubrow=hubrow,
            has_spill=spill,
            has_flip=flip,
        )

    variants = [
        ("full", lambda: run_variant(has_spill, has_hub, has_hubrow, has_flip)),
        ("no_spill", lambda: run_variant(False, has_hub, has_hubrow, has_flip)),
        ("no_hub", lambda: run_variant(has_spill, False, False, has_flip)),
        ("band_perm_only", lambda: run_variant(False, False, False, has_flip)),
        ("band_perm_noflip", lambda: run_variant(False, False, False, False)),
    ]
    for name, fn in variants:
        try:
            t = timeit(fn)
            emit({"probe": name, "t_us": round(t * 1e6, 1)})
        except Exception as e:
            emit({"probe": name, "error": str(e)[:200]})

    # bare Pallas band call on the same vt (no permutes, no composition)
    vt = form.bwd_val
    xe = jnp.pad(x, (form.bwd_padL, form.gen_m_pad + form.bwd_W - m))
    t = timeit(
        lambda: pallas_spmv_band_t(vt, xe, form.bwd_W, form.bandt_start, TM=2048)
    )
    emit({"probe": "pallas_band_only", "t_us": round(t * 1e6, 1)})

    # dispatch floor: trivial jitted op on m-length operand
    tiny = jax.jit(lambda v: v * 2.0 + 1.0)
    t = timeit(lambda: tiny(x))
    emit({"probe": "dispatch_floor_elemwise_m", "t_us": round(t * 1e6, 1)})

    # library-dispatch full path (includes epilogue etc.)
    t = timeit(lambda: _run_exec_form(form, x, None))
    emit({"probe": "library_run_exec_form", "t_us": round(t * 1e6, 1)})


if __name__ == "__main__":
    main()
