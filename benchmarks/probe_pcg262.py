#!/usr/bin/env python
"""VERDICT r4 item 7: pcg_ilu0 per-iteration slope on the 262k suite operand,
measured with a same-window stream calibration so the row can finally be
attributed (r4 measured 6.56 ms/iter in a 27-31 GB/s window; the model says
2.5-3 in a normal one). Appends JSON rows to benchmarks/PCG262_r5.jsonl."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PCG262_r5.jsonl")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu.solvers.fused import pcg_solve
    from suite import banded

    rng = np.random.default_rng(7)
    m = n = 262144
    ptr, ind, val = banded(rng, m, n, 64, 64, diag_boost=64.0)
    A = ast.create_csr(m, n, ptr, ind, val)
    b = rng.standard_normal(m).astype(np.float32)

    stream_buf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024).astype(np.float32))

    @jax.jit
    def stream(bf, a0):
        def body(i, acc):
            return jnp.sum(bf * (1.0 + 1e-30 * acc))

        return jax.lax.fori_loop(0, 16, body, a0)

    def window_gbps():
        float(stream(stream_buf, jnp.float32(0.0)))  # pre-warm
        t0 = time.perf_counter()
        for _ in range(3):
            z = stream(stream_buf, jnp.float32(0.0))
        float(z)
        return stream_buf.size * 4 / ((time.perf_counter() - t0) / 48) / 1e9

    # warm both budgets (compile)
    for mx in (4, 16):
        pcg_solve(A, b, rtol=0.0, atol=0.0, maxit=mx, precond="ilu0")

    rounds = int(os.environ.get("PCG262_ROUNDS", "6"))
    best = None
    for r in range(rounds):
        w0 = window_gbps()
        ts = {}
        for mx in (4, 16):
            bb = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _, it, _ = pcg_solve(A, b, rtol=0.0, atol=0.0, maxit=mx, precond="ilu0")
                bb = min(bb, time.perf_counter() - t0)
            ts[mx] = (bb, int(it))
        w1 = window_gbps()
        (tl, il), (th, ih) = ts[4], ts[16]
        slope = None if ih <= il else (th - tl) * 1e3 / (ih - il)
        rec = {
            "metric": "pcg_ilu0_ms_per_iter_262k",
            "round": r,
            "slope_ms_iter": None if slope is None else round(slope, 3),
            "window_stream_gbps": round(max(w0, w1), 1),
            "points": {str(k): [round(v[0] * 1e3, 1), v[1]] for k, v in ts.items()},
            "ts": time.time(),
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with open(OUT, "a") as f:
            f.write(line + "\n")
        if slope is not None and (best is None or slope < best):
            best = slope
        if best is not None and best <= 5.0 and max(w0, w1) >= 100:
            break  # target met in a normal window (VERDICT r4 item 7)
        time.sleep(4.0)
    print(json.dumps({"metric": "pcg262_best_slope", "value": best}))


if __name__ == "__main__":
    main()
