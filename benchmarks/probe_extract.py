#!/usr/bin/env python
"""VERDICT r4 item 6: measure the SpGEMM extraction routes on the suite's
16.7M-product operand and record what autotune pins. Appends to
benchmarks/PROBE_extract.jsonl. ONE TPU process."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_extract.jsonl")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import aoclsparse_tpu as ast
    from aoclsparse_tpu.kernels.autotune import autotune_spgemm
    from aoclsparse_tpu.core.types import Request
    from aoclsparse_tpu.core.descr import GENERAL
    from aoclsparse_tpu.ops.level3.spgemm import sp2m
    from aoclsparse_tpu import Operation
    from suite import banded

    rng = np.random.default_rng(7)
    mA = 65536
    ptr2, ind2, val2 = banded(rng, mA, mA, 32, 16)
    A2 = ast.create_csr(mA, mA, ptr2, ind2, val2)

    C, results = autotune_spgemm(A2, A2, iters=3, chunks=3)
    plan = C._spgemm_plan
    rec = {
        "metric": "spgemm_extract_routes",
        "results_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
        "pinned_engine": "host" if getattr(plan, "_host_engine", False)
        else ("band" if plan.band is not None else "expand"),
        "extract_route": getattr(plan, "_extract_route", None),
        "nnzC_M": round(plan.nnz / 1e6, 2),
        "products_M": None if not plan.P else round(plan.P / 1e6, 1),
        "ts": time.time(),
    }
    # end-to-end: finalize + full materialization through the pinned route
    if plan.band is not None:
        for route in ("gather", "host"):
            plan._extract_route = route
            best = float("inf")
            for _ in range(3):
                C = sp2m(Operation.none, GENERAL, A2, Operation.none, GENERAL, A2,
                         request=Request.finalize, C=C)
                t0 = time.perf_counter()
                v = C.data.val  # triggers the lazy thunk
                np.asarray(np.ravel(np.asarray(v))[:1])
                best = min(best, time.perf_counter() - t0)
            rec[f"materialize_{route}_ms"] = round(best * 1e3, 2)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
