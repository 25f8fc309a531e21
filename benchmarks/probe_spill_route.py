"""A/B: spill-route engine (one-hot select -> Benes -> one-hot accum) vs
the gather+segment-sum spill tail, on the real TPU at webbase-class scale.

Synthetic spill with webbase-1M's measured stats (P=691489 unstructured
entries over m_pad~1.0M, REAL_r4 plan row). Chained loops, args-passing,
best-of-chunks, stream-bracketed (repo measurement rules)."""

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

from aoclsparse_tpu.planner.spill_route import build_spill_route, spill_route_apply

OUT = Path(__file__).parent / "PROBE_route.jsonl"
R = 20
R_STREAM = 16


def emit(row):
    row["ts"] = round(time.time(), 1)
    line = json.dumps(row)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    P = int(os.environ.get("PROBE_P", "691489"))
    m_pad = int(os.environ.get("PROBE_M", str(1024 * 977)))
    rng = np.random.default_rng(1)
    rows = np.sort(rng.integers(0, m_pad, P))
    cols = rng.integers(0, m_pad, P)
    vals = rng.standard_normal(P).astype(np.float32)

    t0 = time.perf_counter()
    sr = build_spill_route(rows, cols, vals, m_pad)
    t_plan = time.perf_counter() - t0
    print(f"plan {t_plan:.2f}s k={sr.k} sel_tiles={sr.n_sel_tiles} acc_tiles={sr.n_acc_tiles}", flush=True)

    xp = jnp.asarray(rng.standard_normal(m_pad).astype(np.float32))
    yp = jnp.asarray(np.zeros(m_pad, dtype=np.float32))
    d_rows = jnp.asarray(rows.astype(np.int32))
    d_cols = jnp.asarray(cols.astype(np.int32))
    d_vals = jnp.asarray(vals)
    ops = sr.ops()
    statics = sr.statics()
    stream_buf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024).astype(np.float32))

    @jax.jit
    def stream(b, a0):
        def body(i, acc):
            return jnp.sum(b * (1.0 + 1e-30 * acc))

        return jax.lax.fori_loop(0, R_STREAM, body, a0)

    @jax.jit
    def loop_gather(x0, y0, rr, cc, vv, a0):
        def body(i, acc):
            out = y0 + jax.ops.segment_sum(
                vv * (x0 * (1.0 + 1e-30 * acc))[cc], rr,
                num_segments=m_pad, indices_are_sorted=True)
            return out[0] + acc * 1e-30

        return jax.lax.fori_loop(0, R, body, a0)

    @jax.jit
    def loop_route(x0, y0, *opargs):
        a0 = jnp.float32(0.0)

        def body(i, acc):
            out = spill_route_apply(x0 * (1.0 + 1e-30 * acc), y0, opargs, statics)
            return out[0] + acc * 1e-30

        return jax.lax.fori_loop(0, R, body, a0)

    # correctness on-device first
    g = np.asarray(jax.jit(lambda: yp + jax.ops.segment_sum(
        d_vals * xp[d_cols], d_rows, num_segments=m_pad, indices_are_sorted=True))())
    r = np.asarray(jax.jit(lambda: spill_route_apply(xp, yp, ops, statics))())
    err = np.abs(g - r).max() / max(1.0, np.abs(g).max())
    emit({"op": "spill_route_parity_tpu", "P": P, "rel_err": float(err)})
    assert err < 1e-5, err

    float(loop_gather(xp, yp, d_rows, d_cols, d_vals, jnp.float32(0.0)))
    float(loop_route(xp, yp, *ops))

    def stream_gbps():
        t0 = time.perf_counter()
        for _ in range(3):
            float(stream(stream_buf, jnp.float32(0.0)))
        return stream_buf.size * 4 / ((time.perf_counter() - t0) / (3 * R_STREAM)) / 1e9

    best = {"gather": 1e9, "route": 1e9}
    best_stream = 0.0
    for cix in range(5):
        s_pre = stream_gbps()
        t0 = time.perf_counter()
        float(loop_gather(xp, yp, d_rows, d_cols, d_vals, jnp.float32(0.0)))
        t_g = (time.perf_counter() - t0) / R
        t0 = time.perf_counter()
        float(loop_route(xp, yp, *ops))
        t_r = (time.perf_counter() - t0) / R
        s = max(s_pre, stream_gbps())
        best_stream = max(best_stream, s)
        best["gather"] = min(best["gather"], t_g)
        best["route"] = min(best["route"], t_r)
        emit({"op": "spill_chunk", "chunk": cix, "t_gather_us": round(t_g * 1e6, 1),
              "t_route_us": round(t_r * 1e6, 1), "stream_gbps": round(s, 1)})
        time.sleep(1.0)

    emit({"op": "spill_summary", "P": P, "m_pad": m_pad, "plan_s": round(t_plan, 2),
          "gather_ns_per_entry": round(best["gather"] / P * 1e9, 2),
          "route_ns_per_entry": round(best["route"] / P * 1e9, 2),
          "speedup": round(best["gather"] / best["route"], 2),
          "best_stream_gbps": round(best_stream, 1), "k": sr.k})


if __name__ == "__main__":
    main()
