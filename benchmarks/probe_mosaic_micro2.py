#!/usr/bin/env python
"""Probe 4: the sublane-concat is the (known-crashing) culprit; roll+iota
and sum(axis=0) pass. Isolate the remaining acc8 constructs:

  m2_lane_slice_val8 : unaligned LANE slices of an (8, 2TM) value
  m2_roll_iter       : iterative pltpu.roll + ALIGNED [:, :TM] slices
  m2_t8_roll_full    : full acc8 band kernel, XS via roll+iota, per-j0
                       unaligned lane slices (if lane slices pass)
  m2_t8_rollonly_full: full acc8 band kernel, per-iteration roll, aligned
                       slices only (fallback shape)

Appends to benchmarks/PROBE_bandt8.jsonl.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_bandt8.jsonl")


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TM = 1024

    def run_small(kern):
        a = jnp.asarray(
            np.random.default_rng(0).standard_normal((8, TM)).astype(np.float32)
        )
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, TM // 8), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((8, TM), lambda t: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, TM // 8), lambda t: (0, 0), memory_space=pltpu.VMEM),
        )
        return np.asarray(fn(a))

    def build_XS(xwin, TM2):
        """(8, TM2) XS[r] = xwin shifted left r lanes, via roll + iota."""
        xb = jnp.broadcast_to(xwin, (8, TM2))
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, TM2), 0)
        XS = jnp.zeros((8, TM2), xwin.dtype)
        for r in range(8):
            rolled = pltpu.roll(xb, TM2 - r, axis=1) if r else xb
            XS = jnp.where(rows == r, rolled, XS)
        return XS

    def k_lane_slice_val8(in_ref, out_ref):
        XS = build_XS(in_ref[0:1, :], TM)
        acc = XS[:, 1 : 1 + TM - 128] + XS[:, 9 : 9 + TM - 128]  # unaligned
        s = jnp.sum(acc, axis=0, keepdims=True)
        out_ref[:] = jnp.pad(s, ((0, 0), (0, 128))).reshape(8, TM // 8)

    def k_roll_iter(in_ref, out_ref):
        XS = build_XS(in_ref[0:1, :], TM)
        acc = jnp.zeros((8, TM), jnp.float32)
        for i in range(3):
            acc = acc + XS
            XS = pltpu.roll(XS, TM - 8, axis=1)  # shift left 8 lanes
        s = jnp.sum(acc, axis=0, keepdims=True)
        out_ref[:] = s.reshape(8, TM // 8)

    for name, kern in (
        ("m2_lane_slice_val8", k_lane_slice_val8),
        ("m2_roll_iter", k_roll_iter),
    ):
        try:
            run_small(kern)
            emit({"probe": name, "ok": True})
        except Exception as e:
            txt = str(e)
            emit({"probe": name, "ok": False, "err_tail": txt[-700:]})

    # ---- full band kernels ------------------------------------------------
    def mk_full(mode):
        def _kernel(vt_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int, VS: int):
            x0 = x0_ref[:].reshape(1, TM)
            x1 = x1_ref[:].reshape(1, TM)
            xwin = jnp.concatenate([x0, x1], axis=1)  # (1, 2TM)
            XS = build_XS(xwin, 2 * TM)
            acc8 = jnp.zeros((8, TM), dtype=out_ref.dtype)
            if mode == "slice":
                for j0 in range(0, W, VS):
                    v = vt_ref[j0 : j0 + VS, :].astype(out_ref.dtype)
                    for s in range(0, VS, 8):
                        acc8 = acc8 + v[s : s + 8, :] * XS[:, j0 + s : j0 + s + TM]
            else:  # rollonly: aligned [:, :TM] slices, roll XS 8 lanes/iter
                for j0 in range(0, W, VS):
                    v = vt_ref[j0 : j0 + VS, :].astype(out_ref.dtype)
                    for s in range(0, VS, 8):
                        acc8 = acc8 + v[s : s + 8, :] * XS[:, :TM]
                        XS = pltpu.roll(XS, 2 * TM - 8, axis=1)
            s_ = jnp.sum(acc8, axis=0, keepdims=True)
            out_ref[:] = s_.reshape(8, TM // 8)

        return _kernel

    def band_t8(vt, xe, W, start, TMk, mode):
        Wm, m = vt.shape
        VS = 16 if vt.dtype == jnp.bfloat16 else 8
        ntile = -(-m // TMk)
        m_pad = ntile * TMk
        if m_pad != m:
            vt = jnp.pad(vt, ((0, 0), (0, m_pad - m)))
        coarse, rem = divmod(start, TMk)
        need = (ntile + coarse + 2) * TMk + rem
        if xe.shape[0] < need:
            xe = jnp.pad(xe, (0, need - xe.shape[0]))
        if rem:
            xe = jnp.roll(xe, -rem)
        nchunk = xe.shape[0] // TMk
        x2 = xe[: nchunk * TMk].reshape(nchunk * 8, TMk // 8)
        out = pl.pallas_call(
            partial(mk_full(mode), TM=TMk, W=W, VS=VS),
            out_shape=jax.ShapeDtypeStruct((ntile * 8, TMk // 8), jnp.float32),
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((W, TMk), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TMk // 8), lambda t: (t + coarse, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TMk // 8), lambda t: (t + coarse + 1, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, TMk // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(vt, x2, x2)
        return out.reshape(-1)[:m]

    rng = np.random.default_rng(7)
    m, W = 262144, 136
    W16 = -(-W // 16) * 16
    vt = rng.standard_normal((W16, m)).astype(np.float32)
    vt[W:] = 0.0
    x = rng.standard_normal(m).astype(np.float32)
    xe = np.pad(x, (W16, 0))
    start = 8
    y_ref = np.zeros(m, dtype=np.float64)
    for j in range(W):
        y_ref += vt[j].astype(np.float64) * xe[start + j : start + j + m]
    vt_j = jnp.asarray(vt)
    vt_b = jnp.asarray(vt.astype(jnp.bfloat16))
    xe_j = jnp.asarray(xe)

    fns = {}
    for mode in ("slice", "rollonly"):
        fns[mode] = jax.jit(
            partial(band_t8, TMk=2048, mode=mode), static_argnames=("W", "start")
        )

    def timeit(fn, iters=30, chunks=5):
        y = fn()
        np.asarray(y[:1])
        best = float("inf")
        for _ in range(chunks):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn()
            np.asarray(y[:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, y

    for name, v, mode in (
        ("m2_t8_roll_slice_f32", vt_j, "slice"),
        ("m2_t8_rollonly_f32", vt_j, "rollonly"),
        ("m2_t8_roll_slice_bf16", vt_b, "slice"),
        ("m2_t8_rollonly_bf16", vt_b, "rollonly"),
    ):
        try:
            t, y = timeit(lambda: fns[mode](v, xe_j, W=W16, start=start))
        except Exception as e:
            emit({"probe": name, "error": str(e)[-700:]})
            continue
        err = float(np.max(np.abs(np.asarray(y, dtype=np.float64) - y_ref)))
        scale = float(np.max(np.abs(y_ref)))
        bytes_band = m * W16 * (2 if v.dtype == jnp.bfloat16 else 4)
        emit(
            {
                "probe": name,
                "t_us": round(t * 1e6, 1),
                "gbps_band": round(bytes_band / t / 1e9, 1),
                "rel_err": err / scale,
            }
        )


if __name__ == "__main__":
    main()
