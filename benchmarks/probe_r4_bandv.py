#!/usr/bin/env python
"""Round-4 probe: f32 bandv variants vs the 0.8-roofline target.

Hypothesis (VERDICT r3 item 1): the f32 bandv kernel sits at ~half its HBM
roofline because each grid step's band block is a COLUMN slab of the flat
(W*8, ntile*TM/8) layout — every DMA'd block row is a ~4 KB strided
segment. Variants:

  base  — pallas_spmv_band_v, flat layout (current KID 12 path)
  vc    — tile-major contiguous layout, BlockSpec pipeline
  vd    — tile-major layout, single grid step, manual double-buffered DMA

All timings are the amortized per-iteration time of R chained in-program
applications (fori_loop with a real dependency), best-of-chunks, with a
same-window chained read-stream calibration. Appends to PROBE_r4.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

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

    from aoclsparse_tpu.kernels.pallas.spmv import (
        band_vert_layout,
        band_vert_layout_tiles,
        pallas_spmv_band_v,
        pallas_spmv_band_vc,
        pallas_spmv_band_vd,
    )

    rng = np.random.default_rng(7)
    m, W = 262144, 128
    vt = rng.standard_normal((W, m)).astype(np.float32)
    x = rng.standard_normal(m).astype(np.float32)
    R = 50

    # useful-byte formula of the headline (bench.py): CSR bytes of the
    # equivalent 64-nnz/row operand
    nnz = m * 64
    gbytes = ((m + 1 + nnz) * 4 + (nnz + m + m) * 4) / 1e9
    band_gb_f32 = W * m * 4 / 1e9

    def make_loop(kern, vt_dev, TM, R=R):
        need = (-(-m // TM) + 2) * TM

        @jax.jit
        def loop(vt_a, xe, eps):
            def body(i, carry):
                xc, acc = carry
                y = kern(vt_a, xc, W, 0, TM=TM)
                return (xc.at[:128].add(eps * y[:128]), acc + y[0])

            _, acc = jax.lax.fori_loop(0, R, body, (xe, jnp.float32(0.0)))
            return acc

        xe = jnp.asarray(np.pad(x, (0, need - m)))
        # compile + warm
        float(loop(vt_dev, xe, jnp.float32(1e-7)))
        return lambda: float(loop(vt_dev, xe, jnp.float32(1e-7)))

    # oracle: one plain dispatch per kernel, checked against numpy
    dense_ref = None

    def check(kern, vt_dev, TM):
        nonlocal dense_ref
        need = (-(-m // TM) + 2) * TM
        xe = jnp.asarray(np.pad(x, (0, need - m)))
        y = np.asarray(kern(vt_dev, xe, W, 0, TM=TM))[:m]
        if dense_ref is None:
            xp = np.pad(x, (0, W + m))
            idx = np.arange(m)[:, None] + np.arange(W)[None, :]
            dense_ref = (vt.T * xp[idx]).sum(1)
        err = np.abs(y - dense_ref).max() / max(1.0, np.abs(dense_ref).max())
        return float(err)

    variants = []

    def add(name, kern, layout, TM, dtype=np.float32):
        try:
            src = vt.astype(dtype) if dtype != np.float32 else vt
            vt_dev = jnp.asarray(layout(src, TM) if layout else src)
            err = check(kern, vt_dev, TM)
            fn = make_loop(kern, vt_dev, TM)
            variants.append((name, fn))
            emit({"probe": "r4_bandv_setup", "variant": name, "relerr": err})
        except Exception as e:
            emit({"probe": "r4_bandv_setup", "variant": name,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})

    add("base_f32_8192", pallas_spmv_band_v, band_vert_layout, 8192)
    add("vc_f32_8192", pallas_spmv_band_vc, band_vert_layout_tiles, 8192)
    add("vc_f32_4096", pallas_spmv_band_vc, band_vert_layout_tiles, 4096)
    add("vd_f32_8192", pallas_spmv_band_vd, band_vert_layout_tiles, 8192)
    add("vd_f32_4096", pallas_spmv_band_vd, band_vert_layout_tiles, 4096)
    add("vd_f32_2048", pallas_spmv_band_vd, band_vert_layout_tiles, 2048)
    add("vc_bf16_8192", pallas_spmv_band_vc, band_vert_layout_tiles, 8192, jnp.bfloat16)
    add("vd_bf16_8192", pallas_spmv_band_vd, band_vert_layout_tiles, 8192, jnp.bfloat16)

    # chained stream calibration (bench.py methodology)
    sbuf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024).astype(np.float32))
    RS = 16

    @jax.jit
    def stream(b, a0):
        def body(i, acc):
            return jnp.sum(b * (1.0 + 1e-30 * acc))

        return jax.lax.fori_loop(0, RS, body, a0)

    float(stream(sbuf, jnp.float32(0.0)))

    def stream_gbps():
        t0 = time.perf_counter()
        for _ in range(2):
            z = stream(sbuf, jnp.float32(0.0))
        float(z)
        return sbuf.size * 4 / ((time.perf_counter() - t0) / (2 * RS)) / 1e9

    best = {}
    deadline = time.time() + float(os.environ.get("PROBE_WALL_S", "2100"))
    rnd = 0
    while time.time() < deadline:
        rnd += 1
        s_pre = stream_gbps()
        rec = {"probe": "r4_bandv", "round": rnd, "stream_pre": round(s_pre, 1)}
        for name, fn in variants:
            t0 = time.perf_counter()
            fn()
            t = (time.perf_counter() - t0) / R
            rec[name + "_us"] = round(t * 1e6, 2)
            rec[name + "_eff"] = round(gbytes / t, 1)
            if name not in best or t < best[name]:
                best[name] = t
        rec["stream_post"] = round(stream_gbps(), 1)
        emit(rec)
        # stop early if the best f32 variant already beats the 0.8 target
        t_best = min((t for n, t in best.items() if "f32" in n), default=1.0)
        if gbytes / t_best >= 0.80 * 819 and rnd >= 3:
            break
        time.sleep(6.0 if rnd % 3 else 20.0)

    summary = {
        "probe": "r4_bandv_done",
        "band_gb_f32": round(band_gb_f32, 4),
        "gbytes_useful": round(gbytes, 4),
    }
    for name, t in best.items():
        summary[name + "_best_us"] = round(t * 1e6, 2)
        summary[name + "_best_eff_gbs"] = round(gbytes / t, 1)
    emit(summary)


if __name__ == "__main__":
    main()
