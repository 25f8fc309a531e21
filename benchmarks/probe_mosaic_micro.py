#!/usr/bin/env python
"""Probe 3: micro-bisect Mosaic constructs for the acc8 band kernel.

One tiny pallas kernel per construct; whichever fails names the culprit.
Appends to benchmarks/PROBE_bandt8.jsonl (full exception text).
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

    def run(kern, n_in=1):
        a = jnp.asarray(np.random.default_rng(0).standard_normal((8, TM)).astype(np.float32))
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, TM // 8), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((8, TM), lambda t: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, TM // 8), lambda t: (0, 0), memory_space=pltpu.VMEM),
        )
        y = fn(a)
        return np.asarray(y)

    def k_control(in_ref, out_ref):
        # v1-style: (1, TM) ops only
        x = in_ref[0:1, :]
        out_ref[:] = (x * 2.0).reshape(8, TM // 8)

    def k_sum0(in_ref, out_ref):
        s = jnp.sum(in_ref[:], axis=0, keepdims=True)  # (1, TM)
        out_ref[:] = s.reshape(8, TM // 8)

    def k_concat_sub(in_ref, out_ref):
        x = in_ref[0:1, :]
        XS = jnp.concatenate([x[:, r : r + TM - 128] for r in range(8)], axis=0)
        s = jnp.sum(XS, axis=0, keepdims=True)
        out_ref[:] = jnp.pad(s, ((0, 0), (0, 128))).reshape(8, TM // 8)

    def k_concat_sub_only(in_ref, out_ref):
        # concat w/o cross-sublane sum: reduce back via (8,TM)->elementwise,
        # then take row 0 (sublane slice at 0 is aligned)
        x = in_ref[0:1, :]
        XS = jnp.concatenate([x[:, r : r + TM - 128] for r in range(8)], axis=0)
        y = XS * 2.0
        out_ref[:] = jnp.pad(y[0:1, :], ((0, 0), (0, 128))).reshape(8, TM // 8)

    def k_roll_iota(in_ref, out_ref):
        xb = in_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, TM), 0)
        XS = jnp.zeros((8, TM), jnp.float32)
        for r in range(8):
            rolled = pltpu.roll(xb, TM - r, axis=1) if r else xb
            XS = jnp.where(rows == r, rolled, XS)
        out_ref[:] = (XS[0:1, :] * 1.0).reshape(8, TM // 8)

    def k_fma8(in_ref, out_ref):
        acc = jnp.zeros((8, TM), jnp.float32)
        for i in range(4):
            acc = acc + in_ref[:] * float(i + 1)
        out_ref[:] = (acc[0:1, :]).reshape(8, TM // 8)

    def k_reshape_1tm(in_ref, out_ref):
        # plain (1,TM)->(8,TM//8) reshape of a computed value (v1 does this)
        s = in_ref[0:1, :] + 1.0
        out_ref[:] = s.reshape(8, TM // 8)

    for name, kern in (
        ("m_control", k_control),
        ("m_sum_axis0", k_sum0),
        ("m_fma8_full", k_fma8),
        ("m_concat_sublane", k_concat_sub_only),
        ("m_concat_plus_sum", k_concat_sub),
        ("m_roll_iota", k_roll_iota),
    ):
        t0 = time.perf_counter()
        try:
            run(kern)
            emit({"probe": name, "ok": True, "t_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:
            txt = str(e)
            # keep the tail too — Mosaic errors often live at the end
            emit({"probe": name, "ok": False, "err_head": txt[:600], "err_tail": txt[-1200:]})


if __name__ == "__main__":
    main()
