#!/usr/bin/env python
"""Round-4 gen-composite component probe (VERDICT r3 item 5).

Times the pieces of the gen SpMV decomposition separately on the web and
circuit profiles, plus an A/B of the block-permute engines:
  - row-gather (current: xb[bperm], ~GEN_PANEL_NS)
  - one-hot MATMUL permute (MXU): P @ xb with an exact bit-masked 3-way
    bf16 split of the f32 payload (each output element is a single 1.0*h
    product, so the reconstruction is exact to f32)
and f32 vs bf16 band/hub variants. Appends to PROBE_r4.jsonl.
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

    rng = np.random.default_rng(7)
    m = 262144
    R = 50

    def timeit_loop(fn_loop, chunks=5):
        best = 1e9
        for _ in range(chunks):
            t0 = time.perf_counter()
            float(fn_loop())
            best = min(best, (time.perf_counter() - t0) / R)
        return best

    # ---- permute engine A/B on (nblk, B) = (2048, 128) ----
    B = 128
    nblk = m // B
    xb = jnp.asarray(rng.standard_normal((nblk, B)).astype(np.float32))
    bperm = rng.permutation(nblk).astype(np.int32)
    bperm_d = jnp.asarray(bperm)
    P = np.zeros((nblk, nblk), dtype=np.float32)
    P[np.arange(nblk), bperm] = 1.0
    P_bf = jnp.asarray(P.astype(jnp.bfloat16))

    def split3(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        h1 = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
        r = x - h1
        ur = jax.lax.bitcast_convert_type(r, jnp.uint32)
        h2 = jax.lax.bitcast_convert_type(ur & np.uint32(0xFFFF0000), jnp.float32)
        r2 = r - h2
        return h1, h2, r2

    def perm_mm(Pb, x):
        h1, h2, r2 = split3(x)
        o = jnp.dot(Pb, h1.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        o = o + jnp.dot(Pb, h2.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        o = o + jnp.dot(Pb, r2.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return o

    # accuracy check
    want = np.asarray(xb)[bperm]
    got_mm = np.asarray(jax.jit(perm_mm)(P_bf, xb))
    got_g = np.asarray(jax.jit(lambda x, p: x[p])(xb, bperm_d))
    emit({"probe": "r4_perm_ab", "check_gather": float(np.abs(got_g - want).max()),
          "check_mm": float(np.abs(got_mm - want).max()),
          "relerr_mm": float(np.abs(got_mm - want).max() / np.abs(want).max())})

    @jax.jit
    def loop_gather(x, p):
        def body(i, c):
            x, acc = c
            y = x[p]
            return (x.at[0, :1].add(1e-30 * acc), acc + y[0, 0])
        _, a = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0)))
        return a

    @jax.jit
    def loop_mm(x, Pb):
        def body(i, c):
            x, acc = c
            y = perm_mm(Pb, x)
            return (x.at[0, :1].add(1e-30 * acc), acc + y[0, 0])
        _, a = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0)))
        return a

    float(loop_gather(xb, bperm_d)); float(loop_mm(xb, P_bf))
    tg = timeit_loop(lambda: loop_gather(xb, bperm_d))
    tm = timeit_loop(lambda: loop_mm(xb, P_bf))
    emit({"probe": "r4_perm_ab_time", "B": B, "nblk": nblk,
          "gather_us": round(tg * 1e6, 1), "matmul_us": round(tm * 1e6, 1)})

    # element-level permute A/B (scramble class, B=1): gather vs 2-stage?
    perm_e = rng.permutation(m).astype(np.int32)
    xe = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    pe = jnp.asarray(perm_e)

    @jax.jit
    def loop_egather(x, p):
        def body(i, c):
            x, acc = c
            y = x[p]
            return (x.at[:1].add(1e-30 * acc), acc + y[0])
        _, a = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0)))
        return a

    float(loop_egather(xe, pe))
    te = timeit_loop(lambda: loop_egather(xe, pe))
    emit({"probe": "r4_perm_elem", "gather_us": round(te * 1e6, 1)})

    # ---- full library mv on web/circuit with f32 vs bf16 and perm engines ----
    from benchmarks.bench_gen import circuit_profile, web_profile  # noqa: F401
    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form

    for name, prof in (("circuit", circuit_profile), ("web", web_profile)):
        r, c = prof(rng, m)
        order = np.lexsort((c, r))
        r, c = r[order], c[order]
        keep = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
        r, c = r[keep], c[keep]
        # ensure diagonal
        dr = np.setdiff1d(np.arange(m), r[c == r])
        r = np.concatenate([r, dr]); c = np.concatenate([c, dr])
        order = np.lexsort((c, r)); r, c = r[order], c[order]
        v = rng.standard_normal(r.size).astype(np.float32)
        ptr = np.zeros(m + 1, np.int64); np.add.at(ptr, r + 1, 1); ptr = np.cumsum(ptr)
        A = ast.create_csr(m, m, ptr, c.astype(np.int32), v)
        t0 = time.perf_counter()
        plan = get_plan(A)
        form = plan.exec_form_for(MatrixDescriptor(), Operation.none, dtype=A.dtype)
        t_plan = time.perf_counter() - t0
        nnz = int(ptr[-1])
        x = jnp.asarray(rng.standard_normal(m).astype(np.float32))

        rec = {"probe": "r4_gen", "profile": name, "kind": form.kind, "nnz": nnz,
               "plan_s": round(t_plan, 1)}
        if form.kind == "gen":
            rec.update({"W": form.bwd_W, "B": form.gen_B,
                        "spill": 0 if form.sp_ind is None else int(form.sp_ind.shape[0]),
                        "hub": 0 if form.hub_cols is None else int(form.hub_cols.shape[0])})

        for label, mixed in (("f32", False), ("bf16", True)):
            if mixed:
                os.environ["AOCLSPARSE_TPU_MIXED_PRECISION"] = "1"
            try:
                @jax.jit
                def loop(eps, x0):
                    def body(i, carry):
                        xc, acc = carry
                        y = _run_exec_form(form, xc, None)
                        return (xc.at[:128].add(eps * y[:128]), acc + y[0])
                    _, acc = jax.lax.fori_loop(0, R, body, (x0, jnp.float32(0.0)))
                    return acc

                float(loop(jnp.float32(1e-7), x))
                t = timeit_loop(lambda: loop(jnp.float32(1e-7), x))
                rec[f"t_{label}_us"] = round(t * 1e6, 1)
                rec[f"gnnz_{label}"] = round(nnz / t / 1e9, 3)
            except Exception as e:
                rec[f"err_{label}"] = repr(e)[:150]
            finally:
                os.environ["AOCLSPARSE_TPU_MIXED_PRECISION"] = "0"
        emit(rec)


if __name__ == "__main__":
    main()
