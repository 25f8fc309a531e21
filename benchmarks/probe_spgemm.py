#!/usr/bin/env python
"""On-TPU probe for SpGEMM-numeric primitives (round 2, VERDICT #4).

The numeric stage is Cval = segsum(Aval[pa] * Bval[pb], pc) with P ~ 16.7M:
measure each index op's real rate to pick the redesign:

  - random 16M gather (baseline; the r1 bottleneck)
  - SORTED-index gather (pa is non-decreasing by construction)
  - piecewise-contiguous gather (pb = concatenated B-row runs)
  - jnp.repeat by counts (the exact pa expansion semantics)
  - sorted segment-sum P -> nnzC
  - narrow panel gathers w8/w32 (for the gen form's block-size ladder)

Appends JSON lines to benchmarks/PROBE_spgemm.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_spgemm.jsonl")


def _sync(y):
    import jax.numpy as jnp

    while isinstance(y, (tuple, list)):
        y = y[0]
    return np.asarray(jnp.ravel(y)[:1])


def bench(fn, args, iters=15, chunks=5, sleep=1.0):
    y = fn(*args)
    _sync(y)
    t = float("inf")
    for c in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _sync(y)
        t = min(t, (time.perf_counter() - t0) / iters)
        if c % 2 == 1:
            time.sleep(sleep)
    return t


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
    from functools import partial

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(3)
    P = 16 * 1024 * 1024
    nsrc = 2 * 1024 * 1024
    src = jax.random.normal(key, (nsrc,), dtype=jnp.float32)

    # 1. random gather baseline
    idx_rand = jnp.asarray(rng.integers(0, nsrc, P, dtype=np.int32))

    @jax.jit
    def g_rand(src, idx):
        return src[idx]

    t = bench(g_rand, (src, idx_rand))
    emit({"probe": "gather_random_16M", "t_ms": round(t * 1e3, 2), "gelem_s": round(P / t / 1e9, 3)})

    # 2. sorted gather (repeat semantics: each source index appears ~8x)
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, nsrc, P)).astype(np.int32))
    t = bench(g_rand, (src, idx_sorted))
    emit({"probe": "gather_sorted_16M", "t_ms": round(t * 1e3, 2), "gelem_s": round(P / t / 1e9, 3)})

    # 3. piecewise-contiguous gather (runs of 8 consecutive)
    starts = rng.integers(0, nsrc - 8, P // 8, dtype=np.int32)
    idx_runs = (starts[:, None] + np.arange(8, dtype=np.int32)[None, :]).reshape(-1)
    idx_runs = jnp.asarray(idx_runs)
    t = bench(g_rand, (src, idx_runs))
    emit({"probe": "gather_runs8_16M", "t_ms": round(t * 1e3, 2), "gelem_s": round(P / t / 1e9, 3)})

    # 4. jnp.repeat by counts (exact pa expansion)
    counts = np.full(nsrc, P // nsrc, dtype=np.int32)
    counts_j = jnp.asarray(counts)

    @partial(jax.jit, static_argnames=("total",))
    def rep(src, counts, total):
        return jnp.repeat(src, counts, total_repeat_length=total)

    t = bench(rep, (src, counts_j, P))
    emit({"probe": "repeat_16M", "t_ms": round(t * 1e3, 2), "gelem_s": round(P / t / 1e9, 3)})

    # 5. sorted segment-sum P -> nnzC (~6.7M segments)
    nnzC = 6 * 1024 * 1024
    seg = np.sort(rng.integers(0, nnzC, P)).astype(np.int32)
    seg_j = jnp.asarray(seg)
    vals = jax.random.normal(key, (P,), dtype=jnp.float32)

    @partial(jax.jit, static_argnames=("n",))
    def ssum(v, s, n):
        return jax.ops.segment_sum(v, s, num_segments=n, indices_are_sorted=True)

    t = bench(ssum, (vals, seg_j, nnzC))
    emit({"probe": "segsum_sorted_16M", "t_ms": round(t * 1e3, 2), "gelem_s": round(P / t / 1e9, 3)})

    # 6. narrow panel gathers for the gen-form granularity ladder
    n = 262144
    x = jax.random.normal(key, (n,), dtype=jnp.float32)
    for w in (8, 32):
        T = n // w  # gather the whole vector's worth of panels
        pidx = jnp.asarray(rng.integers(0, n // w, T, dtype=np.int32))

        @jax.jit
        def pg(x, idx, w=w):
            return x.reshape(-1, w)[idx]

        t = bench(pg, (x, pidx), iters=30)
        emit(
            {
                "probe": f"panel_gather_w{w}",
                "t_us": round(t * 1e6, 1),
                "gelem_s": round(T * w / t / 1e9, 3),
            }
        )

    emit({"probe": "done"})


if __name__ == "__main__":
    main()
