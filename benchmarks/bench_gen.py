#!/usr/bin/env python
"""General-sparsity SpMV benchmark on the real TPU (VERDICT round-1 item #1).

Synthetic stand-ins for the reference matrixlist's non-banded classes
(tests/benchmarks/matrices/matrixlist: scircuit, webbase-1M, rajat31...;
the actual SuiteSparse files are not available offline):

  circuit : local coupling (6/row, +-16) + 32 power-rail hub columns +
            0.3% uniform scatter               (scircuit/rajat class)
  web     : power-law hubs (zipf in-degree) + 85% block-local links +
            5% uniform scatter                 (webbase/in-2004 class)
  scramble: 64/row FEM band under a hidden element permutation
            (worst case for block locality -> element-RCM mode)

Each profile runs through the library's own dispatch (ast.mv) so the
planner's auto format choice is part of what's measured. Prints one JSON
line per profile; appends to benchmarks/BENCH_gen.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_gen.jsonl")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def circuit_profile(rng, m):
    local = 6
    half = 16
    rows = np.repeat(np.arange(m, dtype=np.int64), local)
    cols = rows + rng.integers(-half, half + 1, rows.size)
    hubs = rng.choice(m, 32, replace=False)
    hr = rng.integers(0, m, m // 8)
    hc = hubs[rng.integers(0, hubs.size, hr.size)]
    sr = rng.integers(0, m, int(0.003 * m * local))
    sc = rng.integers(0, m, sr.size)
    r = np.concatenate([rows, hr, sr])
    c = np.clip(np.concatenate([cols, hc, sc]), 0, m - 1)
    return r, c


def web_profile(rng, m):
    # zipf-ish hub in-degrees + block-local links + uniform tail
    nnz_loc = 4 * m
    rows_l = rng.integers(0, m, nnz_loc)
    # local links stay inside a site-block neighborhood (URL-ordered web
    # graphs link densely within a site; webbase/in-2004 class)
    cols_l = np.clip(rows_l + rng.integers(-256, 256, nnz_loc), 0, m - 1)
    n_hub_entries = int(0.5 * m)
    hub_ids = rng.zipf(1.6, n_hub_entries) % 2000  # top-2000 hub pages
    hub_pages = rng.permutation(m)[:2000]
    rows_h = rng.integers(0, m, n_hub_entries)
    cols_h = hub_pages[hub_ids]
    n_rand = int(0.25 * m)
    rows_r = rng.integers(0, m, n_rand)
    cols_r = rng.integers(0, m, n_rand)
    r = np.concatenate([rows_l, rows_h, rows_r])
    c = np.concatenate([cols_l, cols_h, cols_r])
    return r, c


def scramble_profile(rng, m):
    row_nnz, half = 64, 64
    p = rng.permutation(m)
    rows = np.repeat(np.arange(m, dtype=np.int64), row_nnz)
    cols = np.clip(rows + rng.integers(-half, half + 1, rows.size), 0, m - 1)
    return p[rows], p[cols]


def build_csr(r, c, m, dtype=np.float32, rng=None):
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    uq = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
    r, c = r[uq], c[uq]
    ptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(ptr, r + 1, 1)
    ptr = np.cumsum(ptr)
    val = rng.standard_normal(c.size).astype(dtype)
    return ptr, c.astype(np.int32), val


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, Operation
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form

    rng = np.random.default_rng(11)
    m = 262144
    descr = MatrixDescriptor()

    for name, gen_fn in (
        ("circuit", circuit_profile),
        ("web", web_profile),
        ("scramble", scramble_profile),
    ):
        r, c = gen_fn(rng, m)
        ptr, ind, val = build_csr(r, c, m, rng=rng)
        nnz = int(ind.size)
        A = ast.create_csr(m, m, ptr, ind, val)
        t0 = time.perf_counter()
        plan = get_plan(A)
        form = plan.exec_form_for(descr, Operation.none, dtype=A.dtype)
        t_plan = time.perf_counter() - t0
        x = jnp.asarray(rng.standard_normal(m).astype(np.float32))

        def run():
            return _run_exec_form(form, x, None)

        y = run()
        np.asarray(y[:1])  # fetch-sync (block_until_ready is a tunnel no-op)
        # verify once on-device result vs host oracle
        yh = np.asarray(y)
        dcheck = np.zeros(m, dtype=np.float64)
        np.add.at(dcheck, np.repeat(np.arange(m), np.diff(ptr)), 0.0)
        xs = np.asarray(x, dtype=np.float64)
        rows_h = np.repeat(np.arange(m), np.diff(ptr))
        ref = np.zeros(m)
        np.add.at(ref, rows_h, val.astype(np.float64) * xs[ind])
        err = np.max(np.abs(yh - ref)) / max(1.0, np.max(np.abs(ref)))

        # AMORTIZED timing (round 3): the tunnel's ~0.9-4 ms per-dispatch
        # floor dominates single calls; 50 chained in-program applications
        # with a real dependency measure the on-chip per-iteration time.
        # gen/bandt forms get an ARG-passing loop (big operands as jit
        # arguments — closure constants ship in the remote compile request
        # and the wide web-profile band exceeds its ~200 MB body limit)
        _loop50 = None
        if form.kind == "gen" and getattr(form, "gen_bandt", False):
            from aoclsparse_tpu.kernels.xla.spmv import spmv_gen_bandv
            from aoclsparse_tpu.ops.level2.mv import _zero_aux, _zero_operands

            from aoclsparse_tpu.kernels.pallas.spmv import bandv_tm

            TMg = bandv_tm(form.bwd_W)
            vt4_a = form.bandt_vertical(TM=TMg)
            has_spill = form.sp_ind is not None and bool(form.sp_ind.shape[0])
            has_hub = form.hub_cols is not None and bool(form.hub_cols.shape[0])
            has_hubrow = form.hubr_rows is not None and bool(form.hubr_rows.shape[0])
            has_flip = form.gen_flip is not None
            zi, zv = _zero_operands(np.float32)
            zm, zb = _zero_aux(np.float32)
            hs_a = form.hub_slab if has_hub else zm
            hr_a = form.hubr_slab if has_hubrow else zm
            sv_a = form.sp_val if has_spill else zv
            # one-hot MXU permutes (the library's TPU default since r4)
            try:
                p_in_a, p_out_a = form.gen_perm_onehots()
            except Exception:
                p_in_a = p_out_a = None

            @jax.jit
            def _loop50(eps, vt4c, hsc, hrc, svc, x0):
                def body(i, carry):
                    xc, acc = carry
                    yv = spmv_gen_bandv(
                        vt4c, xc, form.gen_perm, form.gen_out,
                        form.gen_flip if has_flip else zb,
                        hsc, form.hub_cols if has_hub else zi,
                        hrc, form.hubr_rows if has_hubrow else zi,
                        svc, form.sp_ind if has_spill else zi,
                        form.sp_rows if has_spill else zi,
                        B=form.gen_B, W=vt4c.shape[0] // 8, padL=form.bwd_padL,
                        start=form.bandt_start, TM=TMg, m=form.m,
                        m_pad=form.gen_m_pad, has_hub=has_hub,
                        has_hubrow=has_hubrow, has_spill=has_spill,
                        has_flip=has_flip,
                        bperm_oh=p_in_a, bout_oh=p_out_a,
                    )
                    return (xc + eps * yv, acc + yv[0])

                _, acc = jax.lax.fori_loop(0, 50, body, (x0, jnp.float32(0.0)))
                return acc

            _loop_args = (vt4_a, hs_a, hr_a, sv_a)
            # bf16 band variant (docs/precision.md): the band dominates the
            # gen composite's traffic — the web-profile lever
            try:
                _vt4_bf16 = form.bandt_vertical(TM=TMg, bf16=True)
            except Exception:
                _vt4_bf16 = None

            # PERMUTED-SPACE loop (solver-iteration rate): the per-call x/y
            # element permutes are two O(m) gathers; Krylov loops hoist them
            # (solvers/fused.py _gen_pspace) — this measures that rate
            from aoclsparse_tpu.kernels.xla.spmv import spmv_gen_bandv_p

            src_p, inv_p, hubc_p = form.gen_perm_maps()
            xp0 = jnp.pad(x, (0, form.gen_m_pad - m))[src_p]

            @jax.jit
            def _loop50_p(eps, vt4c, hsc, hrc, svc, xp_0):
                def body(i, carry):
                    xc, acc = carry
                    yv = spmv_gen_bandv_p(
                        vt4c, xc, hsc, hubc_p if has_hub else zi,
                        hrc, form.hubr_rows if has_hubrow else zi,
                        svc, form.sp_ind if has_spill else zi,
                        form.sp_rows if has_spill else zi,
                        W=vt4c.shape[0] // 8, padL=form.bwd_padL,
                        start=form.bandt_start, TM=TMg,
                        m_pad=form.gen_m_pad, has_hub=has_hub,
                        has_hubrow=has_hubrow, has_spill=has_spill,
                    )
                    return (xc + eps * yv, acc + yv[0])

                _, acc = jax.lax.fori_loop(0, 50, body, (xp_0, jnp.float32(0.0)))
                return acc
        if _loop50 is None:

            @jax.jit
            def _loop50(eps, x0):
                def body(i, carry):
                    xc, acc = carry
                    yv = _run_exec_form(form, xc, None)
                    return (xc + eps * yv, acc + yv[0])

                _, acc = jax.lax.fori_loop(0, 50, body, (x0, jnp.float32(0.0)))
                return acc

            _loop_args = ()
            _vt4_bf16 = None
            t_pspace = None

        def _run_loop():
            return _loop50(jnp.float32(1e-7), *_loop_args, x)

        t = t_single = float("inf")
        iters, chunks = 2, 6
        amortized = True
        try:
            acc = _run_loop()  # compile (can 413: non-gen forms keep their
            float(acc)  # arrays as closure constants in the loop)
        except Exception:
            amortized = False
        for cix in range(chunks):
            if amortized:
                t1 = time.perf_counter()
                for _ in range(iters):
                    acc = _run_loop()
                float(acc)
                t = min(t, (time.perf_counter() - t1) / (iters * 50))
            t1 = time.perf_counter()
            for _ in range(10):
                y = run()
            np.asarray(y[:1])
            t_single = min(t_single, (time.perf_counter() - t1) / 10)
            if cix % 3 == 2:
                time.sleep(1.5)
        if not amortized:
            t = t_single
        t_pspace = None
        if amortized and _loop_args:
            try:
                acc = _loop50_p(jnp.float32(1e-7), *_loop_args, xp0)
                float(acc)
                t_pspace = float("inf")
                for _ in range(3):
                    t1 = time.perf_counter()
                    for _ in range(iters):
                        acc = _loop50_p(jnp.float32(1e-7), *_loop_args, xp0)
                    float(acc)
                    t_pspace = min(t_pspace, (time.perf_counter() - t1) / (iters * 50))
            except Exception:
                t_pspace = None
        t_bf16 = None
        if amortized and _loop_args and _vt4_bf16 is not None:
            try:
                acc = _loop50(jnp.float32(1e-7), _vt4_bf16, *_loop_args[1:], x)
                float(acc)
                t_bf16 = float("inf")
                for _ in range(3):
                    t1 = time.perf_counter()
                    for _ in range(iters):
                        acc = _loop50(jnp.float32(1e-7), _vt4_bf16, *_loop_args[1:], x)
                    float(acc)
                    t_bf16 = min(t_bf16, (time.perf_counter() - t1) / (iters * 50))
            except Exception:
                t_bf16 = None
        emit(
            {
                "profile": name,
                "form": form.kind,
                "gen_B": getattr(form, "gen_B", None),
                "W": getattr(form, "bwd_W", None),
                "hub_k": None if form.hub_cols is None else int(form.hub_cols.shape[0]),
                "hubr_k": None
                if getattr(form, "hubr_rows", None) is None
                else int(form.hubr_rows.shape[0]),
                "spill": None if form.sp_ind is None else int(form.sp_ind.shape[0]),
                "m": m,
                "nnz": nnz,
                "t_us": round(t * 1e6, 1),
                "t_single_us": round(t_single * 1e6, 1),
                "timing": "amortized(50)"
                if amortized
                else "single-dispatch (amortized program exceeded the remote"
                " compile-request limit; includes the ~1-4 ms tunnel floor)",
                "gnnz_s": round(nnz / t / 1e9, 3),
                "plan_s": round(t_plan, 2),
                "rel_err": float(err),
                "t_pspace_us": None if t_pspace is None else round(t_pspace * 1e6, 1),
                "gnnz_s_pspace": None if t_pspace is None else round(nnz / t_pspace / 1e9, 3),
                "t_bf16_us": None if t_bf16 is None else round(t_bf16 * 1e6, 1),
                "gnnz_s_bf16": None if t_bf16 is None else round(nnz / t_bf16 / 1e9, 3),
            }
        )


if __name__ == "__main__":
    main()
