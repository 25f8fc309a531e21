#!/usr/bin/env python
"""On-TPU probe for general-sparsity SpMV kernel candidates (round 2).

Measures, on the real chip, the primitives the planner needs cost numbers
for before committing to a general-structure execution format:

  1. panel row-gather rate at widths 128/256/512 (x panels for tiles)
  2. full tile-SpMV kernel (panel gather + broadcast-mult-reduce +
     sorted segment-sum) at G=8/32
  3. dense-column slab matvec (hub columns of power-law matrices)
  4. full-length permutation gather x[perm] (RCM re-ordering cost per call)
  5. lax.sort throughput (sort-based gather alternative)

Each result prints one JSON line to stdout AND appends to
benchmarks/PROBE_general.jsonl. Timing: chained dispatch + single sync,
best-of-chunks (the pool is contended; see RESULTS_r1.md caveats).
"""

import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_general.jsonl")


def _sync(y):
    # block_until_ready is a no-op through the axon tunnel: a real one-element
    # FETCH is the only reliable device sync (see RESULTS_r1.md / bench.py)
    import jax.numpy as jnp
    import numpy as np

    while isinstance(y, (tuple, list)):
        y = y[0]
    return np.asarray(jnp.ravel(y)[:1])


def bench(fn, args, iters=30, chunks=6, sleep=1.0):
    y = fn(*args)
    _sync(y)
    t = float("inf")
    for c in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _sync(y)
        t = min(t, (time.perf_counter() - t0) / iters)
        if c % 3 == 2:
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

    dev = jax.devices()[0]
    emit({"probe": "device", "kind": str(getattr(dev, "device_kind", dev.platform))})
    key = jax.random.PRNGKey(0)

    n = 262144
    x = jax.random.normal(key, (n,), dtype=jnp.float32)

    # ---- 1. panel row-gather at widths 128/256/512
    T = 32768
    for w in (128, 256, 512):
        npan = n // w
        idx = jnp.asarray(np.random.default_rng(1).integers(0, npan, T, dtype=np.int32))

        @jax.jit
        def pgather(x, idx, w=w):
            return x.reshape(-1, w)[idx]

        t = bench(pgather, (x, idx))
        emit(
            {
                "probe": f"panel_gather_w{w}",
                "t_us": round(t * 1e6, 1),
                "gbs": round(T * w * 4 / t / 1e9, 2),
                "gelem_s": round(T * w / t / 1e9, 3),
            }
        )

    # ---- 2. full tile kernel: (T,G,128) tiles, sorted group ids
    for G in (8, 32):
        ngrp = 4096
        tiles_per_grp = T // ngrp
        gid = jnp.asarray(np.repeat(np.arange(ngrp, dtype=np.int32), tiles_per_grp))
        pan = jnp.asarray(np.random.default_rng(2).integers(0, n // 128, T, dtype=np.int32))
        tv = jax.random.normal(key, (T, G, 128), dtype=jnp.float32)

        @partial(jax.jit, static_argnames=("ngrp",))
        def tile_spmv(tv, pan, gid, x, ngrp):
            xg = x.reshape(-1, 128)[pan]  # (T, 128) panel gather
            prod = jnp.sum(tv * xg[:, None, :], axis=-1)  # (T, G) VPU reduce
            yg = jax.ops.segment_sum(prod, gid, num_segments=ngrp, indices_are_sorted=True)
            return yg.reshape(-1)

        t = bench(tile_spmv, (tv, pan, gid, x, ngrp))
        a_bytes = T * G * 128 * 4
        emit(
            {
                "probe": f"tile_spmv_G{G}",
                "t_us": round(t * 1e6, 1),
                "tile_gbs": round(a_bytes / t / 1e9, 2),
                "nnz_rate_at_fill_0.1_G": round(0.1 * T * G * 128 / t / 1e9, 3),
            }
        )

    # ---- 2b. tile kernel WITHOUT gather (panels precomputed) — isolates
    # the gather share so the planner cost model can split the two terms
    G = 8
    tv = jax.random.normal(key, (T, G, 128), dtype=jnp.float32)
    xg_fixed = jax.random.normal(key, (T, 128), dtype=jnp.float32)
    gid = jnp.asarray(np.repeat(np.arange(4096, dtype=np.int32), T // 4096))

    @partial(jax.jit, static_argnames=("ngrp",))
    def tile_nogather(tv, xg, gid, ngrp):
        prod = jnp.sum(tv * xg[:, None, :], axis=-1)
        return jax.ops.segment_sum(prod, gid, num_segments=ngrp, indices_are_sorted=True)

    t = bench(tile_nogather, (tv, xg_fixed, gid, 4096))
    emit(
        {
            "probe": "tile_spmv_G8_nogather",
            "t_us": round(t * 1e6, 1),
            "tile_gbs": round(T * G * 128 * 4 / t / 1e9, 2),
        }
    )

    # ---- 3. dense-column slab: y += D @ x_hub (hub columns)
    for k in (128, 512):
        D = jax.random.normal(key, (n, k), dtype=jnp.float32)
        cols = jnp.asarray(np.random.default_rng(3).integers(0, n, k, dtype=np.int32))

        @jax.jit
        def slab(D, x, cols):
            return D @ x[cols]

        t = bench(slab, (D, x, cols), iters=20)
        emit(
            {
                "probe": f"dense_slab_k{k}",
                "t_us": round(t * 1e6, 1),
                "gbs": round(n * k * 4 / t / 1e9, 2),
            }
        )

    # ---- 4. full-length permutation gather (RCM per-call cost)
    perm = jnp.asarray(np.random.default_rng(4).permutation(n).astype(np.int32))

    @jax.jit
    def pgath(x, perm):
        return x[perm]

    t = bench(pgath, (x, perm))
    emit(
        {
            "probe": "perm_gather_n262144",
            "t_us": round(t * 1e6, 1),
            "gelem_s": round(n / t / 1e9, 4),
        }
    )

    # ---- 5. sort throughput (sort-based-gather feasibility)
    keys32 = jax.random.randint(key, (4 * 1024 * 1024,), 0, 1 << 30, dtype=jnp.int32)

    @jax.jit
    def dosort(k):
        return jax.lax.sort(k)

    t = bench(dosort, (keys32,), iters=10, chunks=4)
    emit(
        {
            "probe": "sort_4M_i32",
            "t_us": round(t * 1e6, 1),
            "gelem_s": round(keys32.shape[0] / t / 1e9, 3),
        }
    )

    emit({"probe": "done"})


if __name__ == "__main__":
    main()
