#!/usr/bin/env python
"""On-TPU probe: TRSV blocked-scan block-size sweep (VERDICT r1 weak #3 —
10.6 ms for 16.8M nnz is scan-step-overhead bound; fewer/larger blocks
amortize the ~8us/step cost until the dense diagonal blocks dominate)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_trsv.jsonl")


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
    from aoclsparse_tpu import MatrixDescriptor, MatrixType, Operation
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_form_for

    rng = np.random.default_rng(7)
    m = 262144
    row_nnz, half = 64, 64
    base = np.clip(np.arange(m) - half, 0, m - 2 * half)
    pick = np.argsort(rng.random((m, 2 * half)), axis=1)[:, : row_nnz - 1]
    cols = np.concatenate([base[:, None] + pick, np.arange(m)[:, None]], axis=1)
    cols = np.sort(cols, axis=1)
    dup = np.concatenate([np.zeros((m, 1), bool), cols[:, 1:] == cols[:, :-1]], axis=1)
    cols[dup] += 1
    cols = np.sort(np.clip(cols, 0, m - 1), axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * cols.shape[1]
    val = rng.standard_normal(cols.size).astype(np.float32)
    isdiag = (cols == np.arange(m)[:, None]).reshape(-1)
    val[isdiag] = float(row_nnz)
    A = ast.create_csr(m, m, ptr, cols.reshape(-1).astype(np.int32), val)
    plan = get_plan(A)
    descr = MatrixDescriptor(type=MatrixType.triangular)
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))

    def sync(y):
        return np.asarray(jnp.ravel(y)[:1])

    for nb in (512, 1024, 2048):
        try:
            form = trsv_form_for(plan, descr, Operation.none, nb=nb)
            m_pad = form.nblk * form.nb
            b2 = jnp.pad(b[:, None], ((0, m_pad - m), (0, 0)))
            y = form.solve(b2)
            sync(y)
            t = float("inf")
            for c in range(5):
                t1 = time.perf_counter()
                for _ in range(10):
                    y = form.solve(b2)
                sync(y)
                t = min(t, (time.perf_counter() - t1) / 10)
                time.sleep(0.5)
            emit(
                {
                    "probe": f"trsv_nb{nb}",
                    "t_ms": round(t * 1e3, 2),
                    "nblk": form.nblk,
                    "WL": form.WL,
                    "kind": form.kind,
                }
            )
        except Exception as e:
            emit({"probe": f"trsv_nb{nb}", "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
