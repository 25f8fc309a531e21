"""A/B probe: Benes static-permutation routing vs XLA gather on the real TPU.

Decides VERDICT r4 item 1's direction: the scatter-tail engines are gated on
the router actually beating the measured ~13-18 ns/element gather floor
in the SAME pool window. Measurement per the repo rules: chained in-program
loops with a value dependency, operands as jit ARGS, best-of-chunks, with a
chained 128 MB read-stream calibration bracketing each chunk.

Emits JSONL rows to benchmarks/PROBE_route.jsonl and stdout.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from aoclsparse_tpu import native
from aoclsparse_tpu.kernels.xla.route import apply_benes, benes_strides

OUT = Path(__file__).parent / "PROBE_route.jsonl"
R = 20
R_STREAM = 16
CHUNKS = int(os.environ.get("PROBE_CHUNKS", "5"))


def emit(row):
    row["ts"] = round(time.time(), 1)
    line = json.dumps(row)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    k = int(os.environ.get("PROBE_K", "20"))
    n = 1 << k
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    print(f"planning benes k={k} ...", flush=True)
    t0 = time.perf_counter()
    masks_np = native.benes_plan(k, perm)
    t_plan = time.perf_counter() - t0

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    masks = jnp.asarray(masks_np)
    idx = jnp.asarray(perm.astype(np.int32))
    stream_buf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024).astype(np.float32))

    @jax.jit
    def stream(b, a0):
        def body(i, acc):
            return jnp.sum(b * (1.0 + 1e-30 * acc))

        return jax.lax.fori_loop(0, R_STREAM, body, a0)

    @jax.jit
    def loop_gather(v0, ix, a0):
        def body(i, acc):
            out = (v0 * (1.0 + 1e-30 * acc))[ix]
            return out[0] + acc * 1e-30

        return jax.lax.fori_loop(0, R, body, a0)

    @jax.jit
    def loop_route(v0, mk, a0):
        def body(i, acc):
            out = apply_benes(v0 * (1.0 + 1e-30 * acc), mk, k)
            return out[0] + acc * 1e-30

        return jax.lax.fori_loop(0, R, body, a0)

    # warm / compile + correctness
    g = float(loop_gather(v, idx, jnp.float32(0.0)))
    r = float(loop_route(v, masks, jnp.float32(0.0)))
    vh = np.asarray(v)
    want = float(vh[perm][0])  # the carry converges to out[0]
    assert abs(g - want) < 1e-3 * max(1, abs(want)), (g, want)
    assert abs(r - want) < 1e-3 * max(1, abs(want)), (r, want)
    float(stream(stream_buf, jnp.float32(0.0)))

    def stream_gbps():
        t0 = time.perf_counter()
        for _ in range(3):
            float(stream(stream_buf, jnp.float32(0.0)))
        t_s = (time.perf_counter() - t0) / (3 * R_STREAM)
        return stream_buf.size * 4 / t_s / 1e9

    best = {"gather": float("inf"), "route": float("inf")}
    best_stream = 0.0
    for cix in range(CHUNKS):
        s_pre = stream_gbps()
        t0 = time.perf_counter()
        float(loop_gather(v, idx, jnp.float32(0.0)))
        t_g = (time.perf_counter() - t0) / R
        t0 = time.perf_counter()
        float(loop_route(v, masks, jnp.float32(0.0)))
        t_r = (time.perf_counter() - t0) / R
        s_post = stream_gbps()
        s = max(s_pre, s_post)
        best_stream = max(best_stream, s)
        best["gather"] = min(best["gather"], t_g)
        best["route"] = min(best["route"], t_r)
        emit({"op": "chunk", "k": k, "chunk": cix, "t_gather_us": round(t_g * 1e6, 1),
              "t_route_us": round(t_r * 1e6, 1), "stream_gbps": round(s, 1)})
        time.sleep(1.0)

    nstages = len(benes_strides(k))
    route_traffic = nstages * (2 * n * 4 + n) + 2 * n * 4  # rolls+mask+io
    emit({
        "op": "summary", "k": k, "n": n, "plan_s": round(t_plan, 2),
        "gather_ns_per_elem": round(best["gather"] / n * 1e9, 2),
        "route_ns_per_elem": round(best["route"] / n * 1e9, 2),
        "speedup": round(best["gather"] / best["route"], 2),
        "route_eff_gbps": round(route_traffic / best["route"] / 1e9, 1),
        "best_stream_gbps": round(best_stream, 1),
        "nstages": nstages,
    })


if __name__ == "__main__":
    main()
