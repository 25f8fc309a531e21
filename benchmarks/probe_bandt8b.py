#!/usr/bin/env python
"""Probe 2: bisect the Mosaic compile failure of the acc8 band kernel.

probe_bandt8 showed every acc8 variant fails remote compile (HTTP 500)
while v1 runs. Suspects: (a) sublane-axis concat of unaligned lane slices
(XS construction), (b) non-128-multiple lane dimension (Lr = TM+W-8).
Variants here isolate them:

  t8_padLr : concat XS, Lr padded to a 128 multiple (2TM-128)
  t8_roll  : XS built from pltpu.roll + sublane-iota where (no concat)
  t8_xsref : no XS at all — per-j0 FMA against 8 broadcast rows with
             per-row lane slices taken straight from xwin (closest to v1)

Appends to benchmarks/PROBE_bandt8.jsonl with full error text.
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

    def mk_kernel(mode):
        def _kernel(vt_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int, VS: int):
            x0 = x0_ref[:].reshape(1, TM)
            x1 = x1_ref[:].reshape(1, TM)
            xwin = jnp.concatenate([x0, x1], axis=1)  # (1, 2TM)
            if mode == "padLr":
                Lr = 2 * TM - 128
                XS = jnp.concatenate(
                    [xwin[:, r : r + Lr] for r in range(8)], axis=0
                )
            elif mode == "roll":
                xb = jnp.broadcast_to(xwin, (8, 2 * TM))
                rows = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * TM), 0)
                XS = jnp.zeros((8, 2 * TM), xwin.dtype)
                for r in range(8):
                    rolled = pltpu.roll(xb, 2 * TM - r, axis=1) if r else xb
                    XS = jnp.where(rows == r, rolled, XS)
            else:  # xsref: no stacked XS
                XS = None
            acc8 = jnp.zeros((8, TM), dtype=out_ref.dtype)
            for j0 in range(0, W, VS):
                v = vt_ref[j0 : j0 + VS, :].astype(out_ref.dtype)
                for s in range(0, VS, 8):
                    if XS is not None:
                        acc8 = acc8 + v[s : s + 8, :] * XS[:, j0 + s : j0 + s + TM]
                    else:
                        piece = jnp.concatenate(
                            [xwin[:, j0 + s + r : j0 + s + r + TM] for r in range(8)],
                            axis=0,
                        )
                        acc8 = acc8 + v[s : s + 8, :] * piece
            out_ref[:] = jnp.sum(acc8, axis=0, keepdims=True).reshape(8, TM // 8)

        return _kernel

    def band_t8(vt, xe, W, start, TM, mode):
        Wm, m = vt.shape
        VS = 16 if vt.dtype == jnp.bfloat16 else 8
        ntile = -(-m // TM)
        m_pad = ntile * TM
        if m_pad != m:
            vt = jnp.pad(vt, ((0, 0), (0, m_pad - m)))
        coarse, rem = divmod(start, TM)
        need = (ntile + coarse + 2) * TM + rem
        if xe.shape[0] < need:
            xe = jnp.pad(xe, (0, need - xe.shape[0]))
        if rem:
            xe = jnp.roll(xe, -rem)
        nchunk = xe.shape[0] // TM
        x2 = xe[: nchunk * TM].reshape(nchunk * 8, TM // 8)
        out = pl.pallas_call(
            partial(mk_kernel(mode), TM=TM, W=W, VS=VS),
            out_shape=jax.ShapeDtypeStruct((ntile * 8, TM // 8), jnp.float32),
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((W, TM), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TM // 8), lambda t: (t + coarse, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TM // 8), lambda t: (t + coarse + 1, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, TM // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(vt, x2, x2)
        return out.reshape(-1)[:m]

    fns = {}
    for mode in ("padLr", "roll", "xsref"):
        fns[mode] = jax.jit(
            partial(band_t8, TM=2048, mode=mode), static_argnames=("W", "start")
        )

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
        ("t8b_padLr_f32", vt_j, "padLr"),
        ("t8b_roll_f32", vt_j, "roll"),
        ("t8b_xsref_f32", vt_j, "xsref"),
        ("t8b_roll_bf16", vt_b, "roll"),
        ("t8b_padLr_bf16", vt_b, "padLr"),
    ):
        try:
            t, y = timeit(lambda: fns[mode](v, xe_j, W=W16, start=start))
        except Exception as e:
            emit({"probe": name, "error": str(e)[:2000]})
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
