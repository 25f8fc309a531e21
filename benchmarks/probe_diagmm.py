#!/usr/bin/env python
"""Validate + time the diag-form SpMM engine (mm KID 7) on the pwtk
stand-in on the real chip: Mosaic compile of pallas_spmm_diag, parity vs
the host oracle, amortized args-loop timing vs the old gather row
(REAL_r5 pwtk mm_k64 measured 401.74 ms). Appends to
benchmarks/PROBE_diagmm.jsonl. ONE TPU process."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_diagmm.jsonl")


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
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.io import read_mtx
    from aoclsparse_tpu.planner.plan import get_plan

    name = os.environ.get("DIAGMM_MATRIX", "pwtk")
    path = f"/tmp/realmat/{name}.mtx"
    if os.path.exists(path):
        A = read_mtx(path, dtype=np.float32)
    else:
        from realmat import generate

        m, n, ptr, ind, val = generate(name, diag_boost=80.0)
        A = ast.create_csr(m, n, ptr, ind, val.astype(np.float32))
    m, n = A.shape
    GEN = MatrixDescriptor()
    plan = get_plan(A)
    form = plan.exec_form_for(GEN, Operation.none, dtype=A.dtype)
    K = int(os.environ.get("DIAGMM_K", "64"))
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))
    base = {"matrix": name, "m": int(m), "nnz": int(A.nnz), "K": K,
            "form": form.kind}
    if form.kind == "diag":
        span = max(form.dia_offs_static) - min(form.dia_offs_static)
        base["ndiag"] = len(form.dia_offs_static)
        base["span"] = int(span)
    elif form.kind == "gen":
        base["W"] = int(form.bwd_W)

    # parity vs host oracle on a K=8 slice
    t0 = time.perf_counter()
    C = ast.mm(1.0, A, GEN, Operation.none, B[:, :8], 0.0, kid=7)
    C_h = np.asarray(C)
    t_first = time.perf_counter() - t0
    _, _, _, ptr_h, ind_h, val_h = ast.export_csr(A)
    ptr_h = np.asarray(ptr_h); ind_h = np.asarray(ind_h)
    val_h = np.asarray(val_h, dtype=np.float64)
    rows_h = np.repeat(np.arange(m), np.diff(ptr_h))
    want = np.zeros((m, 8))
    Bh = np.asarray(B[:, :8], dtype=np.float64)
    np.add.at(want, rows_h, (val_h[:, None] * Bh[ind_h]))
    rel = float(np.max(np.abs(C_h - want)) / max(1.0, np.abs(want).max()))
    emit({**base, "op": "parity", "rel_err": rel, "t_first_s": round(t_first, 2)})

    # amortized timing through the library dispatch (args loop)
    closed = jax.make_jaxpr(
        lambda Bc: ast.mm(1.0, A, GEN, Operation.none, Bc, 0.0)
    )(B)
    consts = [jnp.asarray(c) for c in closed.consts]
    R = 10

    @jax.jit
    def mmloop(eps, B0, *cs):
        def body(i, Bc):
            Y = jax.core.eval_jaxpr(closed.jaxpr, list(cs), Bc)[0]
            return Bc.at[:8].add(eps * Y[:8].astype(Bc.dtype))

        return jax.lax.fori_loop(0, R, body, B0)[0, 0]

    float(mmloop(jnp.float32(1e-7), B, *consts))
    best = float("inf")
    for c in range(4):
        t0 = time.perf_counter()
        float(mmloop(jnp.float32(1e-7), B, *consts))
        best = min(best, (time.perf_counter() - t0) / R)
        time.sleep(0.5)
    emit({**base, "op": "mm_k64_probe", "t_ms": round(best * 1e3, 2),
          "tflops": round(2.0 * A.nnz * K / best / 1e12, 3),
          "note": "old gather row: 401.74 ms (REAL_r5 pwtk mm_k64)"})


if __name__ == "__main__":
    main()
