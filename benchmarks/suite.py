#!/usr/bin/env python
"""Multi-op benchmark suite (reference: aoclsparse-bench drivers,
tests/benchmarks/aoclsparse_test.cpp + testing_*.hpp): SpMV (band + diag
forms) / SpMM / TRSV / CG / SpGEMM numeric, one JSON line per metric.

Timing = best-of-chunks chained dispatch (the TPU pool behind the tunnel is
contended; medians across chunks wobble 2-5x, min is the honest kernel time).
Run single-process on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain_min(run, iters_per=20, chunks=5):
    import jax

    y = run()
    jax.block_until_ready(y)
    np.asarray(np.ravel(np.asarray(y))[:1])
    best = float("inf")
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters_per):
            y = run()
        np.asarray(np.ravel(np.asarray(y))[:1])
        best = min(best, (time.perf_counter() - t0) / iters_per)
    return best


def banded(rng, m, n, half_bw, row_nnz, dtype=np.float32, diag_boost=0.0):
    win = 2 * half_bw
    base = np.clip(np.arange(m) - half_bw, 0, n - win)
    pick = np.argsort(rng.random((m, win)), axis=1)[:, : row_nnz - 1]
    cols = base[:, None] + pick
    cols = np.concatenate([cols, np.minimum(np.arange(m), n - 1)[:, None]], axis=1)
    cols = np.sort(cols, axis=1)
    dup = np.concatenate([np.zeros((m, 1), bool), cols[:, 1:] == cols[:, :-1]], axis=1)
    cols[dup] += 1
    cols = np.sort(np.clip(cols, 0, n - 1), axis=1)
    ptr = np.arange(m + 1, dtype=np.int64) * cols.shape[1]
    val = rng.standard_normal(cols.size).astype(dtype)
    if diag_boost:
        isdiag = (cols == np.arange(m)[:, None]).reshape(-1)
        val[isdiag] = diag_boost
    return ptr, cols.reshape(-1).astype(np.int32), val


def stencil5(nx, dtype=np.float32):
    """5-point Laplacian on nx*nx grid, built directly in diagonal form."""
    n = nx * nx
    offs = np.array([-nx, -1, 0, 1, nx])
    rows = np.arange(n)
    entries = []
    for d in offs:
        j = rows + d
        ok = (j >= 0) & (j < n)
        if d in (1, -1):  # no wrap across grid rows
            ok &= (rows // nx) == (j // nx)
        entries.append((rows[ok], j[ok]))
    allr = np.concatenate([r for r, _ in entries])
    allc = np.concatenate([c for _, c in entries])
    order = np.lexsort((allc, allr))
    allr, allc = allr[order], allc[order]
    val = np.where(allr == allc, 4.0, -1.0).astype(dtype)
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(ptr, allr + 1, 1)
    ptr = np.cumsum(ptr)
    return ptr, allc.astype(np.int32), val, n


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import aoclsparse_tpu as ast
    from aoclsparse_tpu import MatrixDescriptor, MatrixType, Operation
    from aoclsparse_tpu.core.context import get_context
    from aoclsparse_tpu.kernels.xla.spmm import spmm_bwd
    from aoclsparse_tpu.kernels.xla.spmv import spmv_bwd, spmv_diag_scan
    from aoclsparse_tpu.planner.plan import get_plan
    from aoclsparse_tpu.planner.triangular import trsv_form_for

    ctx = get_context()
    rng = np.random.default_rng(7)

    class _Emit(list):
        # print each metric the moment it lands so a mid-suite crash or
        # timeout doesn't lose the completed rows (an early SUITE_r3 run
        # lost everything to a late TRSV error)
        def append(self, r):
            r["device"] = ctx.device_kind
            print(json.dumps(r), flush=True)
            super().append(r)

    results = _Emit()

    # same-window achievable-bandwidth calibration (see bench.py): a dense
    # READ stream over 128 MB (SpMV traffic is read-dominant; the old
    # read+write kernel paid a 128 MB allocation per call and understated
    # achievable in traffic-metered windows); rerun alongside every family
    stream_buf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024).astype(np.float32))

    @jax.jit
    def _stream(b):
        return jnp.sum(b)

    def window_gbps():
        t = chain_min(lambda: _stream(stream_buf), iters_per=6, chunks=2)
        return round(stream_buf.size * 4 / t / 1e9, 1)

    m = n = 262144
    row_nnz, half_bw = 64, 64
    ptr, ind, val = banded(rng, m, n, half_bw, row_nnz, diag_boost=float(row_nnz))
    nnz = ind.size
    A = ast.create_csr(m, n, ptr, ind, val)
    plan = get_plan(A)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # ---- host-truth comparator (VERDICT r4 item 10): scipy.sparse timings
    # as the independent "what a CPU does" column on every device row — the
    # EXTERNAL_BENCHMARKING analog of the reference bench harness
    # (tests/include/aoclsparse_no_ext_benchmarking.hpp:1-40).
    import scipy.sparse as _sp
    import scipy.sparse.linalg as _spla

    S_host = _sp.csr_matrix(
        (np.asarray(val), np.asarray(ind), np.asarray(ptr)), shape=(m, n)
    )
    xh = np.asarray(x)

    def scipy_ms(fn, iters=3):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best * 1e3, 3)

    host_spmv_ms = scipy_ms(lambda: S_host @ xh)

    # ---- SpMV banded via the Pallas transposed-band form (TPU default) ----
    from aoclsparse_tpu.ops.level2.mv import _run_exec_form

    try:
        formt = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bandt")
        t = chain_min(lambda: _run_exec_form(formt, x, None))
        gbytes = ((m + 1 + nnz) * 4 + (nnz + n + m) * 4) / 1e9
        results.append(
            {
                "metric": "spmv_bandt_pallas_f32",
                "value": round(gbytes / t, 2),
                "unit": "GB/s(effective)",
                "extra": {
                    "gnnz_s": round(nnz / t / 1e9, 2),
                    "t_us": round(t * 1e6, 1),
                    "W": formt.bwd_W,
                    "window_stream_gbps": window_gbps(),
                    "host_scipy_ms": host_spmv_ms,
                },
            }
        )
    except Exception as e:
        results.append({"metric": "spmv_bandt_pallas_f32", "error": repr(e)[:200]})

    # ---- SpMV f64 (emulated on TPU — reported honestly, csrmv.sh:88-92
    # double-precision methodology counterpart). x64 is scoped to this block:
    # globally-enabled x64 leaks int64 into the Pallas/solver traces, which
    # the Mosaic/TPU compile rejects ----
    try:
        jax.config.update("jax_enable_x64", True)
        try:
            A64 = ast.create_csr(m, n, ptr, ind, val.astype(np.float64))
            form64 = get_plan(A64).exec_form_for(
                MatrixDescriptor(), Operation.none, kind="bwd", dtype=np.float64
            )
            x64 = jnp.asarray(np.asarray(x), dtype=jnp.float64)
            xp64 = jnp.pad(x64, (form64.bwd_padL, form64.bwd_n_pad - form64.bwd_padL - n))
            t = chain_min(
                lambda: spmv_bwd(
                    form64.bwd_val, xp64, form64.bwd_W, form64.bwd_base8, form64.bwd_n_pad, False
                ),
                iters_per=10,
                chunks=4,
            )
        finally:
            jax.config.update("jax_enable_x64", False)
        gbytes64 = ((m + 1 + nnz) * 4 + (nnz + n + m) * 8) / 1e9
        results.append(
            {
                "metric": "spmv_band_f64",
                "value": round(gbytes64 / t, 2),
                "unit": "GB/s(effective)",
                "extra": {
                    "gnnz_s": round(nnz / t / 1e9, 2),
                    "t_us": round(t * 1e6, 1),
                    "note": "f64 emulated on TPU v5e",
                },
            }
        )
    except Exception as e:
        results.append({"metric": "spmv_band_f64", "error": repr(e)[:200]})

    # ---- SpMV f64 via the double-float band kernel (mv KID 13,
    # kernels/pallas/spmv.py spmv_bandv_df): (hi, lo) f32 pairs at VPU f32
    # rates, ~2^-48 relative accuracy (docs/precision.md) — the fast-path
    # counterpart of the emulated-f64 row above. Band pair passed as jit
    # ARGUMENTS (a closure constant would ship ~268 MB in the compile
    # request). Loop-amortized like the bandv rows. ----
    try:
        from aoclsparse_tpu.kernels.pallas.spmv import spmv_bandv_df

        jax.config.update("jax_enable_x64", True)
        try:
            A64df = ast.create_csr(m, n, ptr, ind, val.astype(np.float64))
            fdf = get_plan(A64df).exec_form_for(
                MatrixDescriptor(), Operation.none, kind="bandt", dtype=np.float64
            )
            from aoclsparse_tpu.kernels.pallas.spmv import bandv_tm as _btm

            TMdf = _btm(fdf.bwd_W, itemsize=8)
            vt4h, vt4l = fdf.bandt_vertical_df(TM=TMdf)
            Wdf = vt4h.shape[0] // 8
            x64df = jnp.asarray(np.asarray(x), dtype=jnp.float64)
            zi_df = jnp.zeros((0,), jnp.int32)
            zv_df = jnp.zeros((0,), jnp.float64)
            has_sp = fdf.sp_ind is not None and bool(fdf.sp_ind.shape[0])
            spv, spi, spr = (
                (fdf.sp_val, fdf.sp_ind, fdf.sp_rows) if has_sp else (zv_df, zi_df, zi_df)
            )

            @jax.jit
            def _dfloop(eps, vh, vl, x0):
                def body(i, carry):
                    xc, acc = carry
                    y = spmv_bandv_df(
                        vh, vl, xc, spv, spi, spr,
                        m=fdf.m, W=Wdf, padL=fdf.bwd_padL,
                        start=fdf.bandt_start, TM=TMdf, has_spill=has_sp,
                    )
                    return (xc + eps * y, acc + y[0])

                _, acc = jax.lax.fori_loop(0, 20, body, (x0, jnp.float64(0.0)))
                return acc

            t = chain_min(
                lambda: _dfloop(jnp.float64(1e-9), vt4h, vt4l, x64df),
                iters_per=2,
                chunks=4,
            ) / 20
        finally:
            jax.config.update("jax_enable_x64", False)
        gbytes64 = ((m + 1 + nnz) * 4 + (nnz + n + m) * 8) / 1e9
        results.append(
            {
                "metric": "spmv_band_df64",
                "value": round(gbytes64 / t, 2),
                "unit": "GB/s(effective,amortized)",
                "extra": {
                    "gnnz_s": round(nnz / t / 1e9, 2),
                    "t_us": round(t * 1e6, 1),
                    "note": "double-float (two-f32) band kernel, mv KID 13;"
                    " ~2^-48 rel err (docs/precision.md)",
                    "window_stream_gbps": window_gbps(),
                },
            }
        )
    except Exception as e:
        results.append({"metric": "spmv_band_df64", "error": repr(e)[:200]})

    # ---- SpMV banded via the vertical-layout Pallas form (mv KID 12),
    # f32 + bf16 band, plus the LOOP-AMORTIZED on-chip per-iteration time:
    # per-dispatch tunnel overhead (~0.9-4 ms in throttled windows,
    # HUNT_r3.jsonl) otherwise dominates; 50 chained applications inside
    # one program match the reference's tight-loop methodology
    # (testing_csrmv.hpp:79-92 pays ~ns per call, not an RPC) ----
    try:
        from aoclsparse_tpu.kernels.pallas.spmv import bandv_tm, pallas_spmv_band_v

        gbytes = ((m + 1 + nnz) * 4 + (nnz + n + m) * 4) / 1e9
        TMv = bandv_tm(formt.bwd_W)
        for bf16 in (False, True):
            vt4 = formt.bandt_vertical(TM=TMv, bf16=bf16)
            xe_v = jnp.pad(x, (formt.bwd_padL, 2 * TMv))
            Wv = vt4.shape[0] // 8

            def _once():
                return pallas_spmv_band_v(vt4, xe_v, Wv, formt.bandt_start, TM=TMv)

            t1 = chain_min(_once)

            @jax.jit
            def _loop50(eps, vt4a, xe0, Wv=Wv):
                def body(i, carry):
                    xe_c, acc = carry
                    y = pallas_spmv_band_v(vt4a, xe_c, Wv, formt.bandt_start, TM=TMv)
                    # 128-element dependency defeats CSE without a
                    # full-vector axpy (see bench.py)
                    return (xe_c.at[:128].add(eps * y[:128]), acc + y[0])

                _, acc = jax.lax.fori_loop(0, 50, body, (xe0, jnp.float32(0.0)))
                return acc

            t50 = chain_min(
                lambda: _loop50(jnp.float32(1e-7), vt4, xe_v), iters_per=2, chunks=4
            ) / 50
            results.append(
                {
                    "metric": f"spmv_bandv_{'bf16' if bf16 else 'f32'}",
                    "value": round(gbytes / t50, 2),
                    "unit": "GB/s(effective,amortized)",
                    "extra": {
                        "t_periter_us": round(t50 * 1e6, 1),
                        "t_percall_us": round(t1 * 1e6, 1),
                        "gnnz_s": round(nnz / t50 / 1e9, 2),
                        "window_stream_gbps": window_gbps(),
                    },
                }
            )
    except Exception as e:
        results.append({"metric": "spmv_bandv", "error": repr(e)[:200]})

    # ---- SpMV banded (bwd) ----
    form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwd")
    xp = jnp.pad(x, (form.bwd_padL, form.bwd_n_pad - form.bwd_padL - n))
    for mixed in (False, True):
        t = chain_min(
            lambda: spmv_bwd(form.bwd_val, xp, form.bwd_W, form.bwd_base8, form.bwd_n_pad, mixed)
        )
        gbytes = ((m + 1 + nnz) * 4 + (nnz + n + m) * 4) / 1e9
        results.append(
            {
                "metric": f"spmv_band_f32{'_bf16mul' if mixed else ''}",
                "value": round(gbytes / t, 2),
                "unit": "GB/s(effective)",
                "extra": {
                    "gflops": round(2 * nnz / t / 1e9, 1),
                    "gnnz_s": round(nnz / t / 1e9, 2),
                    "t_us": round(t * 1e6, 1),
                    "W": form.bwd_W,
                },
            }
        )

    # ---- SpMV stencil (diag) ----
    sptr, sind, sval, ns = stencil5(512)  # 262144 rows, 5 diagonals
    S = ast.create_csr(ns, ns, sptr, sind, sval)
    sform = get_plan(S).exec_form_for(MatrixDescriptor(), Operation.none, kind="diag")
    xs = jnp.asarray(rng.standard_normal(ns).astype(np.float32))

    from aoclsparse_tpu.kernels.xla.spmv import spmv_diag

    @jax.jit
    def _stloop(eps, dv, x0):
        def body(i, carry):
            xc, acc = carry
            # the library dispatch path: static-slice UNROLLED kernel for few
            # diagonals (the scan variant pays a traced dynamic_slice per
            # diagonal per step — the documented pathology on this stack)
            y = spmv_diag(
                dv, sform.dia_offs, xc, sform.m, sform.dia_L, sform.dia_n_pad,
                offs_static=sform.dia_offs_static,
            )
            return (xc + eps * y, acc + y[0])

        _, acc = jax.lax.fori_loop(0, 50, body, (x0, jnp.float32(0.0)))
        return acc

    t = chain_min(
        lambda: _stloop(jnp.float32(1e-7), sform.dia_val, xs), iters_per=2, chunks=4
    ) / 50
    snnz = sind.size
    results.append(
        {
            "metric": "spmv_stencil5_diag_f32",
            "value": round(((ns + 1 + snnz) * 4 + (snnz + 2 * ns) * 4) / 1e9 / t, 2),
            "unit": "GB/s(effective,amortized)",
            "extra": {"gnnz_s": round(snnz / t / 1e9, 2), "t_us": round(t * 1e6, 1),
                      "ndiag": int(sform.dia_offs.shape[0])},
        }
    )

    # ---- SpMM k=128 (bwdg scan) ----
    formg = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bwdg")
    k = 128
    B = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    Bp = jnp.pad(B, ((formg.bwd_padL, formg.bwd_n_pad - formg.bwd_padL - n), (0, 0)))
    t = chain_min(
        lambda: spmm_bwd(
            formg.bwd_val, Bp, formg.bwd_G, formg.bwd_W, formg.bwd_base8, formg.bwd_n_pad, False
        ),
        iters_per=5,
        chunks=4,
    )
    results.append(
        {
            "metric": f"spmm_k{k}_f32",
            "value": round(2 * nnz * k / t / 1e12, 3),
            "unit": "TFLOP/s",
            "extra": {"t_ms": round(t * 1e3, 3), "Wg": formg.bwd_W, "G": formg.bwd_G,
                      "host_scipy_ms": scipy_ms(lambda: S_host @ np.asarray(B), iters=2)},
        }
    )

    # ---- SpMM k=128 via the Pallas band forms: KID 4 (bandtm VPU chain)
    # vs KID 5 (bandmxu MXU window blocks), amortized over a 10-deep chain
    # (B_next = C * eps + B keeps a real dependency) ----
    for kid_mm, label in ((4, "bandtm"), (5, "bandmxu"), (5, "bandmxu_bf16")):
        try:
            mixed_mm = label.endswith("bf16")
            C0 = ast.mm(1.0, A, MatrixDescriptor(), Operation.none, B, 0.0, kid=kid_mm)
            np.asarray(jnp.ravel(C0)[:1])

            form_mm = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="bandtm")
            # band operands must be jit ARGUMENTS: a closure becomes an HLO
            # constant and the remote compile request ships the whole band
            # (HTTP 413 length limit at 256 MB)
            band_arg = form_mm.band_mxu_dt() if kid_mm == 5 else form_mm.bwd_val
            B_arg = B
            if mixed_mm:
                # precision-policy variant: bf16 band blocks AND a bf16
                # B-resident chain (B traffic is half the f32 row's) with
                # f32 MXU accumulation — docs/precision.md semantics
                band_arg = band_arg.astype(jnp.bfloat16)
                B_arg = B.astype(jnp.bfloat16)

            @jax.jit
            def _mmloop(eps, band, B0, kid_mm=kid_mm):
                from aoclsparse_tpu.kernels.pallas.spmv import (
                    pallas_spmm_band_mxu,
                    pallas_spmm_band_t,
                )

                def body(i, Bc):
                    if kid_mm == 5:
                        Cc = pallas_spmm_band_mxu(
                            band,
                            jnp.pad(Bc, ((form_mm.bwd_padL, 2048), (0, 0))),
                            form_mm.bandt_start,
                            TM=1024,
                        )[: form_mm.m]
                    else:
                        Cc = pallas_spmm_band_t(
                            band,
                            jnp.pad(Bc, ((form_mm.bwd_padL, 2048), (0, 0))),
                            form_mm.bwd_W,
                            form_mm.bandt_start,
                            TM=256,
                        )[: form_mm.m]
                    return (Bc + eps * Cc).astype(Bc.dtype)

                return jax.lax.fori_loop(0, 10, body, B0)[0, 0].astype(jnp.float32)

            t10 = chain_min(
                lambda: _mmloop(jnp.float32(1e-7), band_arg, B_arg), iters_per=2, chunks=4
            ) / 10
            # binding-resource accounting: dt + 2x B-tile stream (structural
            # window overlap) + C write — implied GB/s vs the same-window
            # dense stream shows whether the kernel is HBM-bound
            traffic_mb = (
                band_arg.size * band_arg.dtype.itemsize
                + 2 * m * k * B_arg.dtype.itemsize
                + m * k * 4
            ) / 1e6
            results.append(
                {
                    "metric": f"spmm_k{k}_{label}",
                    "value": round(2 * nnz * k / t10 / 1e12, 3),
                    "unit": "TFLOP/s(amortized)",
                    "extra": {
                        "t_ms": round(t10 * 1e3, 3),
                        "kid": kid_mm,
                        "traffic_model_mb": round(traffic_mb, 1),
                        "implied_gbs": round(traffic_mb / 1e3 / t10, 1),
                        "window_stream_gbps": window_gbps(),
                    },
                }
            )
        except Exception as e:
            results.append({"metric": f"spmm_k{k}_{label}", "error": repr(e)[:200]})

    # ---- TRSV (win): the form's D/Dinv/Lval arrays are passed as jit
    # ARGUMENTS — closed over they become HLO constants and the remote
    # compile request ships ~270 MB (HTTP 413; killed SUITE_r3a) ----
    descr_t = MatrixDescriptor(type=MatrixType.triangular)
    tform = trsv_form_for(plan, descr_t, Operation.none)
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    m_pad = tform.nblk * tform.nb
    b2 = jnp.pad(b[:, None], ((0, m_pad - m), (0, 0)))
    tri_nnz = int(np.sum(ind <= np.repeat(np.arange(m), ind.size // m)))
    try:
        from aoclsparse_tpu.kernels.xla.trsv import (
            invert_diag_blocks,
            trsv_blocked_win_inv,
        )

        assert tform.kind == "win"
        Dinv = invert_diag_blocks(tform.D)

        @jax.jit
        def _svloop(eps, Dinv_a, Lval_a, b0):
            def body(i, carry):
                bc, acc = carry
                xs_ = trsv_blocked_win_inv(Dinv_a, Lval_a, bc, tform.nb, m_pad, tform.WL)
                return (b0 + eps * xs_, acc + xs_[0, 0])

            _, acc = jax.lax.fori_loop(0, 20, body, (b0, jnp.float32(0.0)))
            return acc

        try:
            t = chain_min(
                lambda: _svloop(jnp.float32(1e-7), Dinv, tform.Lval, b2),
                iters_per=2,
                chunks=4,
            ) / 20
            amort = True
        except Exception:
            t = chain_min(lambda: tform.solve(b2), iters_per=5, chunks=4)
            amort = False
        # Pallas sequential-grid twin (VMEM-scratch window, ~1us/step vs
        # the XLA scan's ~2.4us) when its layout gates pass
        t_pl = None
        try:
            if tform.nb % 128 == 0 and tform.WL % 8 == 0 and tform.WL <= tform.nb:
                from aoclsparse_tpu.kernels.pallas.trsv import pallas_trsv_win_inv8

                nblk_p = -(-tform.nblk // 8) * 8
                dinvT_p = jnp.swapaxes(Dinv, 1, 2)
                lwT_p = jnp.swapaxes(tform.Lval, 1, 2)
                if nblk_p != tform.nblk:
                    eye_p = jnp.broadcast_to(
                        jnp.eye(tform.nb, dtype=dinvT_p.dtype),
                        (nblk_p - tform.nblk, tform.nb, tform.nb),
                    )
                    dinvT_p = jnp.concatenate([dinvT_p, eye_p])
                    lwT_p = jnp.concatenate(
                        [lwT_p, jnp.zeros((nblk_p - tform.nblk, tform.WL, tform.nb), lwT_p.dtype)]
                    )
                bflat = jnp.pad(b2[:, 0], (0, nblk_p * tform.nb - m_pad))

                @jax.jit
                def _svloop_pl(eps, dT, lT, b0):
                    def body(i, carry):
                        bc, acc = carry
                        xs_ = pallas_trsv_win_inv8(dT, lT, bc, tform.nb, tform.WL)
                        return (b0 + eps * xs_, acc + xs_[0])

                    _, acc = jax.lax.fori_loop(0, 20, body, (b0, jnp.float32(0.0)))
                    return acc

                t_pl = chain_min(
                    lambda: _svloop_pl(jnp.float32(1e-7), dinvT_p, lwT_p, bflat),
                    iters_per=2,
                    chunks=4,
                ) / 20
        except Exception:
            t_pl = None
        t_best = t if t_pl is None else min(t, t_pl)
        results.append(
            {
                "metric": "trsv_f32",
                "value": round((2 * tri_nnz - m) / t_best / 1e9, 2),
                "unit": "GFLOP/s" + ("(amortized)" if amort else ""),
                "extra": {"t_ms": round(t_best * 1e3, 3),
                          "t_xla_scan_ms": round(t * 1e3, 3),
                          "t_pallas_ms": None if t_pl is None else round(t_pl * 1e3, 3),
                          "kind": tform.kind, "WL": tform.WL,
                          "nblk": tform.nblk, "nb": tform.nb,
                          "host_scipy_ms": scipy_ms(
                              lambda: _spla.spsolve_triangular(
                                  _sp.tril(S_host).tocsr(), xh, lower=True),
                              iters=2)},
            }
        )
    except Exception as e:
        results.append({"metric": "trsv_f32", "error": repr(e)[:200]})

    # ---- TRSM multi-RHS: amortized like the TRSV row, arrays as args ----
    try:
        K = 64
        Bk = jnp.pad(
            jnp.asarray(rng.standard_normal((m, K)).astype(np.float32)),
            ((0, m_pad - m), (0, 0)),
        )

        @jax.jit
        def _smloop(eps, Dinv_a, Lval_a, B0):
            def body(i, carry):
                Bc, acc = carry
                Xs = trsv_blocked_win_inv(Dinv_a, Lval_a, Bc, tform.nb, m_pad, tform.WL)
                return (B0 + eps * Xs, acc + Xs[0, 0])

            _, acc = jax.lax.fori_loop(0, 10, body, (B0, jnp.float32(0.0)))
            return acc

        t = chain_min(
            lambda: _smloop(jnp.float32(1e-7), Dinv, tform.Lval, Bk),
            iters_per=2,
            chunks=4,
        ) / 10
        # Pallas sequential-grid multi-RHS twin (K columns ride lanes)
        t_pl = None
        try:
            if (
                tform.nb % 128 == 0
                and tform.WL % 8 == 0
                and tform.WL <= tform.nb
                and K % 8 == 0
            ):
                from aoclsparse_tpu.kernels.pallas.trsv import pallas_trsm_win_inv

                dinvT_m = jnp.swapaxes(Dinv, 1, 2)
                lwT_m = jnp.swapaxes(tform.Lval, 1, 2)
                Bt0 = Bk.reshape(tform.nblk, tform.nb, K).swapaxes(1, 2)

                @jax.jit
                def _smloop_pl(eps, dT, lT, B0):
                    def body(i, carry):
                        Bc, acc = carry
                        Xt = pallas_trsm_win_inv(dT, lT, Bc, tform.nb, tform.WL)
                        return (B0 + eps * Xt, acc + Xt[0, 0, 0])

                    _, acc = jax.lax.fori_loop(0, 10, body, (B0, jnp.float32(0.0)))
                    return acc

                t_pl = chain_min(
                    lambda: _smloop_pl(jnp.float32(1e-7), dinvT_m, lwT_m, Bt0),
                    iters_per=2,
                    chunks=4,
                ) / 10
        except Exception:
            t_pl = None
        t_best = t if t_pl is None else min(t, t_pl)
        results.append(
            {
                "metric": "trsm_f32_k64",
                "value": round(K * (2 * tri_nnz - m) / t_best / 1e9, 2),
                "unit": "GFLOP/s(amortized)",
                "extra": {"t_ms": round(t_best * 1e3, 3),
                          "t_xla_scan_ms": round(t * 1e3, 3),
                          "t_pallas_ms": None if t_pl is None else round(t_pl * 1e3, 3),
                          "K": K, "nb": tform.nb},
            }
        )
    except Exception as e:
        results.append({"metric": "trsm_f32_k64", "error": repr(e)[:200]})

    # ---- CG on band form: time per iteration ----
    from aoclsparse_tpu.parallel.cg import cg_bwd_jit

    bb = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    def run_cg():
        xr, it, rn = cg_bwd_jit(
            form.bwd_val, bb, jnp.zeros(m, jnp.float32),
            jnp.asarray(0.0, jnp.float32), jnp.asarray(1e-30, jnp.float32), 25,
            form.bwd_W, form.bwd_base8, form.bwd_padL, form.bwd_n_pad,
        )
        return xr
    t = chain_min(run_cg, iters_per=2, chunks=3)
    results.append(
        {
            "metric": "cg_band_iter_time",
            "value": round(t / 25 * 1e3, 3),
            "unit": "ms/iter",
            "extra": {"t_solve25_ms": round(t * 1e3, 2)},
        }
    )

    # ---- CG with the Pallas bandv matvec (the headline kernel; band as a
    # jit argument) ----
    try:
        from aoclsparse_tpu.parallel.cg import cg_bandv_jit

        TMcg = bandv_tm(formt.bwd_W)
        vt4cg = formt.bandt_vertical(TM=TMcg)

        def run_cg_v():
            xr, it, rn = cg_bandv_jit(
                vt4cg, bb, jnp.zeros(m, jnp.float32),
                jnp.asarray(0.0, jnp.float32), jnp.asarray(1e-30, jnp.float32), 25,
                vt4cg.shape[0] // 8, formt.bwd_padL, formt.bandt_start, TM=TMcg,
                sp_ind=formt.sp_ind, sp_rows=formt.sp_rows, sp_val=formt.sp_val,
            )
            return xr

        t = chain_min(run_cg_v, iters_per=2, chunks=3)
        results.append(
            {
                "metric": "cg_bandv_iter_time",
                "value": round(t / 25 * 1e3, 3),
                "unit": "ms/iter",
                "extra": {"t_solve25_ms": round(t * 1e3, 2), "matvec": "pallas bandv"},
            }
        )
    except Exception as e:
        results.append({"metric": "cg_bandv_iter_time", "error": repr(e)[:200]})

    # ---- SpGEMM: host symbolic + device numeric ----
    from aoclsparse_tpu.core.descr import GENERAL
    from aoclsparse_tpu.ops.level3.spgemm import _effective, _numeric, _symbolic

    mA = 65536
    ptr2, ind2, val2 = banded(rng, mA, mA, 32, 16)
    A2 = ast.create_csr(mA, mA, ptr2, ind2, val2)
    effA = _effective(A2, GENERAL, Operation.none)
    t0 = time.perf_counter()
    plan2 = _symbolic(effA, effA)
    t_sym = time.perf_counter() - t0
    t = chain_min(
        lambda: _numeric(effA.val, effA.val, plan2.pa, plan2.pb, plan2.pc, plan2.nnz, False, False),
        iters_per=5,
        chunks=4,
    )
    P = int(np.asarray(plan2.pa).shape[0])
    results.append(
        {
            "metric": "spgemm_numeric",
            "value": round(2 * P / t / 1e9, 2),
            "unit": "GFLOP/s",
            "extra": {
                "t_ms": round(t * 1e3, 3),
                "products_M": round(P / 1e6, 1),
                "nnzC_M": round(plan2.nnz / 1e6, 2),
                "symbolic_host_s": round(t_sym, 2),
            },
        }
    )

    # ---- SpGEMM threaded HOST numeric engine (third engine) ----
    try:
        from aoclsparse_tpu import native as _nat

        pa_h = np.asarray(plan2.pa)
        pb_h = np.asarray(plan2.pb)
        pc_h = np.asarray(plan2.pc)
        av_h = np.asarray(effA.val)
        t0 = time.perf_counter()
        cv = _nat.spgemm_numeric_host(pa_h, pb_h, pc_h, av_h, av_h, plan2.nnz)
        t_first = time.perf_counter() - t0
        if cv is not None:
            best = t_first
            for _ in range(3):
                t0 = time.perf_counter()
                _nat.spgemm_numeric_host(pa_h, pb_h, pc_h, av_h, av_h, plan2.nnz)
                best = min(best, time.perf_counter() - t0)
            results.append(
                {
                    "metric": "spgemm_numeric_host",
                    "value": round(2 * P / best / 1e9, 2),
                    "unit": "GFLOP/s",
                    "extra": {"t_ms": round(best * 1e3, 3), "products_M": round(P / 1e6, 1)},
                }
            )
    except Exception as e:
        results.append({"metric": "spgemm_numeric_host", "error": repr(e)[:200]})

    # ---- TRSV level-scheduled wavefront engine on a circuit profile ----
    try:
        from aoclsparse_tpu.planner.triangular import trsv_level_form_for

        mc = 65536
        # shallow-DAG circuit triangle: sparse random strict-lower + diag
        rows_c = np.repeat(np.arange(mc), 3)
        cols_c = (rng.random(3 * mc) * np.repeat(np.arange(mc), 3)).astype(np.int64)
        mask_c = cols_c < rows_c
        rc, cc = rows_c[mask_c], cols_c[mask_c]
        key = rc * mc + cc
        key = np.unique(key)
        rc, cc = key // mc, key % mc
        rows_all = np.concatenate([rc, np.arange(mc)])
        cols_all = np.concatenate([cc, np.arange(mc)])
        order_c = np.lexsort((cols_all, rows_all))
        rows_all, cols_all = rows_all[order_c], cols_all[order_c]
        vals_all = rng.standard_normal(rows_all.size).astype(np.float32)
        vals_all[cols_all == rows_all] = 4.0
        ptr_c = np.zeros(mc + 1, np.int64)
        np.add.at(ptr_c, rows_all + 1, 1)
        ptr_c = np.cumsum(ptr_c)
        Ac = ast.create_csr(mc, mc, ptr_c, cols_all.astype(np.int32), vals_all)
        bc = jnp.asarray(rng.standard_normal(mc).astype(np.float32))
        lf = trsv_level_form_for(get_plan(Ac), descr_t, Operation.none)
        t_lvl = chain_min(lambda: lf.solve(bc), iters_per=5, chunks=4)
        bf = trsv_form_for(get_plan(Ac), descr_t, Operation.none)
        mp_c = bf.nblk * bf.nb
        bc2 = jnp.pad(bc[:, None], ((0, mp_c - mc), (0, 0)))
        t_blk = chain_min(lambda: bf.solve(bc2), iters_per=5, chunks=4)
        nnz_c = rows_all.size
        results.append(
            {
                "metric": "trsv_level_circuit",
                "value": round((2 * nnz_c - mc) / t_lvl / 1e9, 3),
                "unit": "GFLOP/s",
                "extra": {
                    "t_level_ms": round(t_lvl * 1e3, 3),
                    "t_blocked_ms": round(t_blk * 1e3, 3),
                    "nlev": lf.nlev,
                    "m": mc,
                    "speedup_vs_blocked": round(t_blk / t_lvl, 2),
                },
            }
        )
    except Exception as e:
        results.append({"metric": "trsv_level_circuit", "error": repr(e)[:200]})

    # ---- host latency engines (mv KID 11, trsv/trsm KID 2): the whole-call
    # numpy paths that exist to dodge the ~1-3 ms tunnel dispatch on tiny
    # operands; reported as host-vs-device time so the crossover is visible
    try:
        import time as _time

        mh_ = 48
        ptr_h, ind_h, val_h, dense_hs = 0, 0, 0, None
        dense_hs = np.tril(
            rng.standard_normal((mh_, mh_)) * (rng.random((mh_, mh_)) < 0.2), -1
        ).astype(np.float32) + np.diag(3 + rng.random(mh_)).astype(np.float32)
        mask_h = dense_hs != 0
        ptr_h = np.concatenate([[0], np.cumsum(mask_h.sum(1))])
        # f32 throughout: under jit-default-f32 the handle values land f32,
        # and f64 operands would (correctly) trip the narrowing check
        Ahost = ast.create_csr(mh_, mh_, ptr_h, np.nonzero(mask_h)[1], dense_hs[mask_h])
        bh_ = rng.standard_normal(mh_).astype(np.float32)
        Bh_ = rng.standard_normal((mh_, 8)).astype(np.float32)
        descr_g = MatrixDescriptor()

        def _host_best(fn, iters=50, chunks=3):
            best = float("inf")
            fn()
            for _ in range(chunks):
                t0 = _time.perf_counter()
                for _ in range(iters):
                    fn()
                best = min(best, (_time.perf_counter() - t0) / iters)
            return best

        t_mv_h = _host_best(lambda: ast.mv(1.0, Ahost, descr_g, Operation.none, bh_, 0.0, kid=11))
        t_mv_d = chain_min(
            lambda: ast.mv(1.0, Ahost, descr_g, Operation.none, bh_, 0.0),
            iters_per=20,
            chunks=3,
        )
        t_sv_h = _host_best(lambda: ast.trsv(1.0, Ahost, descr_t, Operation.none, bh_, kid=2))
        t_sv_d = chain_min(
            lambda: ast.trsv(1.0, Ahost, descr_t, Operation.none, bh_),
            iters_per=20,
            chunks=3,
        )
        t_sm_h = _host_best(
            lambda: ast.trsm(1.0, Ahost, descr_t, Operation.none, Bh_, kid=2), iters=20
        )
        t_sm_d = chain_min(
            lambda: ast.trsm(1.0, Ahost, descr_t, Operation.none, Bh_),
            iters_per=10,
            chunks=3,
        )
        results.append(
            {
                "metric": "host_latency_engines",
                "value": round(t_sv_d / t_sv_h, 2),
                "unit": "x (trsv device/host)",
                "extra": {
                    "m": mh_,
                    "mv_host_us": round(t_mv_h * 1e6, 1),
                    "mv_device_us": round(t_mv_d * 1e6, 1),
                    "trsv_host_us": round(t_sv_h * 1e6, 1),
                    "trsv_device_us": round(t_sv_d * 1e6, 1),
                    "trsm_k8_host_us": round(t_sm_h * 1e6, 1),
                    "trsm_k8_device_us": round(t_sm_d * 1e6, 1),
                },
            }
        )
    except Exception as e:
        results.append({"metric": "host_latency_engines", "error": repr(e)[:200]})

    # ---- SpGEMM band x band numeric (scan-of-matmuls engine) ----
    try:
        from aoclsparse_tpu.kernels.xla.spgemm_band import (
            band_gemm_values,
            build_band_gemm_plan,
        )

        band2 = build_band_gemm_plan(effA, effA, plan2.ptr, plan2.ind, G=128, force=True)
        if band2 is not None:
            band2.formA.refresh(effA.val)
            band2.formB.refresh(effA.val)
            Ab2, Bb2 = band2.formA.bwd_val, band2.formB.bwd_val
            ex2 = jnp.asarray(band2.extract_idx)
            from aoclsparse_tpu.kernels.pallas.spgemm import pallas_band_gemm

            RB = 10

            def _bloop_make(with_extract):
                @jax.jit
                def loop(eps, Aa, Ba, exa):
                    def body(i, carry):
                        Ac, acc = carry
                        cb = pallas_band_gemm(
                            Ac, Ba, G=band2.G, WB=band2.WB, WC=band2.WC,
                            d0=band2.d0, ranges=band2.stream_ranges)
                        s = cb.reshape(-1)[exa][0] if with_extract else cb[0, 0, 0]
                        return (Ac.at[0, 0, 0].add(eps * s), acc + s)

                    _, acc = jax.lax.fori_loop(0, RB, body, (Aa, jnp.float32(0.0)))
                    return acc

                float(loop(jnp.float32(1e-30), Ab2, Bb2, ex2))
                return lambda: float(loop(jnp.float32(1e-30), Ab2, Bb2, ex2))

            t = chain_min(_bloop_make(True), iters_per=1, chunks=4) / RB
            t_k = chain_min(_bloop_make(False), iters_per=1, chunks=4) / RB
            results.append(
                {
                    "metric": "spgemm_numeric_band",
                    "value": round(2 * P / t / 1e9, 2),
                    "unit": "GFLOP/s(amortized; pallas grid kernel + extraction)",
                    "extra": {
                        "t_ms": round(t * 1e3, 3),
                        "kernel_only_ms": round(t_k * 1e3, 3),
                        "note": "kernel_only is the lazy-values path (band-"
                        "form product, TPU default; extraction deferred)",
                        "WA": band2.WA,
                        "WC": band2.WC,
                        "G": band2.G,
                        "window_stream_gbps": window_gbps(),
                    },
                }
            )
    except Exception as e:
        results.append({"metric": "spgemm_numeric_band", "error": repr(e)[:200]})

    # ---- fused preconditioned CG (one dispatch per solve) ----
    try:
        mF = 65536
        pF, iF, vF = banded(rng, mF, mF, 16, 9, diag_boost=64.0)
        # symmetrize: A + A^T keeps the band, guarantees SPD with the boost
        dF_upper = ast.create_csr(mF, mF, pF, iF, vF)
        from aoclsparse_tpu.solvers.fused import pcg_solve

        bF = rng.standard_normal(mF).astype(np.float32)
        t0 = time.perf_counter()
        xF, itF, rnF = pcg_solve(dF_upper, bF, rtol=1e-5, maxit=60, precond="ilu0")
        t_first = time.perf_counter() - t0

        def run_pcg():
            xr, it, rn = pcg_solve(dF_upper, bF, rtol=1e-5, maxit=60, precond="ilu0")
            return xr

        t = chain_min(run_pcg, iters_per=1, chunks=3)

        # ms/iter as the per-iteration SLOPE between two fixed budgets: the
        # whole fused solve is ONE dispatch, so total/iters at small iteration
        # counts reports the ~tens-of-ms tunnel dispatch+fetch floor, not the
        # iteration cost (round-4 probe: t(maxit=12) == t(maxit=25) with both
        # converged at 9). rtol=atol=0 keeps the loop running to the budget.
        def pcg_slope(Ah, bh, mx_lo, mx_hi):
            ts = {}
            for mx in (mx_lo, mx_hi):
                xs, it, _ = pcg_solve(Ah, bh, rtol=0.0, atol=0.0, maxit=mx, precond="ilu0")
                best = float("inf")
                for _ in range(3):
                    t0s = time.perf_counter()
                    xs, it, _ = pcg_solve(Ah, bh, rtol=0.0, atol=0.0, maxit=mx, precond="ilu0")
                    best = min(best, time.perf_counter() - t0s)
                ts[mx] = (best, int(it))
            (tl, il), (th, ih) = ts[mx_lo], ts[mx_hi]
            return (None if ih <= il else (th - tl) * 1e3 / (ih - il)), ts

        # wide iteration spread: the per-iteration delta must clear the
        # multi-ms window jitter on the ~55 ms one-dispatch total (a 4->8
        # spread measured a negative slope in SUITE_r4b)
        slope, ts = pcg_slope(dF_upper, bF, 4, 20)
        results.append(
            {
                "metric": "pcg_ilu0_solve",
                "value": round(t * 1e3 / max(itF, 1), 3),
                "unit": "ms/iter(total/iters: includes the one-dispatch tunnel floor)",
                "extra": {
                    "iters": itF,
                    "t_solve_ms": round(t * 1e3, 1),
                    "m": mF,
                    "ms_per_iter_slope": None if slope is None else round(slope, 3),
                    "slope_points": {str(k): [round(v[0] * 1e3, 1), v[1]] for k, v in ts.items()},
                    # independent CPU reference: scipy CG per-iteration on
                    # the same operand (slope between two maxiter budgets)
                    "host_scipy_cg_ms_iter": (lambda SF: round(
                        (scipy_ms(lambda: _spla.cg(SF, bF, maxiter=24), iters=2)
                         - scipy_ms(lambda: _spla.cg(SF, bF, maxiter=4), iters=2)) / 20, 3))(
                        _sp.csr_matrix((vF, iF, pF), shape=(mF, mF))),
                },
            }
        )
        # the VERDICT r3 item-4 target operand: slope at m=262144 (the
        # suite's headline band, 16.7M nnz, diag-dominant)
        b262 = rng.standard_normal(m).astype(np.float32)
        slope262, ts262 = pcg_slope(A, b262, 4, 16)
        results.append(
            {
                "metric": "pcg_ilu0_ms_per_iter_262k",
                "value": None if slope262 is None else round(slope262, 3),
                "unit": "ms/iter(slope)",
                "extra": {
                    "m": m,
                    "nnz": nnz,
                    "slope_points": {
                        str(k): [round(v[0] * 1e3, 1), v[1]] for k, v in ts262.items()
                    },
                },
            }
        )
    except Exception as e:
        results.append({"metric": "pcg_ilu0_solve", "error": repr(e)[:200]})

    # ---- ILU0: host factor time + device apply bandwidth (reference
    # methodology: csrilu0_gbyte_count(M, nnz) = ((M+1+nnz)*int + 2*nnz*T)/1e9,
    # tests/include/aoclsparse_gbyte.hpp:121-124). Factor = native C++ IKJ
    # sweep (host_kernels.cpp); apply = L/U blocked-scan solves, amortized
    # over a 20-deep in-program chain like the TRSV row. ----
    try:
        from aoclsparse_tpu.kernels.xla.trsv import (
            invert_diag_blocks as _inv_blocks,
            trsv_blocked_win_inv as _win_inv,
        )
        from aoclsparse_tpu.solvers.ilu import ilu0_factorize

        from aoclsparse_tpu import native as _native
        from aoclsparse_tpu.planner.plan import get_plan as _gp

        A_f = ast.create_csr(m, n, ptr, ind, val)  # fresh handle: time the factor
        _cl = _gp(A_f).clean
        t0 = time.perf_counter()
        _native.ilu0_factor(_cl.m, _cl.ptr, _cl.ind, np.asarray(_cl.val))
        t_factor_native = time.perf_counter() - t0  # the IKJ sweep alone
        t0 = time.perf_counter()
        stI = ilu0_factorize(A_f)
        t_factor = time.perf_counter() - t0  # sweep + L/U blocked-form builds
        bI = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        lF, uF = stI.l_form, stI.u_form
        assert lF.kind == "win" and uF.kind == "win"
        DinvL, DinvU = _inv_blocks(lF.D), _inv_blocks(uF.D)
        padL_ = lF.nblk * lF.nb - m
        padU_ = uF.nblk * uF.nb - m

        # L/U solve pair with the form arrays as jit ARGUMENTS (constants
        # would ship ~0.5 GB in the remote compile request -> HTTP 413);
        # mirrors solvers/ilu.py _apply_form incl. the U-form reversal
        @jax.jit
        def _iluloop(eps, DL, LL, DU, LU, b0):
            def body(i, carry):
                bc, acc = carry
                r = jnp.pad(bc[:, None], ((0, padL_), (0, 0)))
                y_ = _win_inv(DL, LL, r, lF.nb, lF.nblk * lF.nb, lF.WL)[: lF.m, 0]
                r2 = jnp.pad(y_[::-1][:, None], ((0, padU_), (0, 0)))
                x_ = _win_inv(DU, LU, r2, uF.nb, uF.nblk * uF.nb, uF.WL)[: uF.m, 0][::-1]
                return (b0 + eps * x_, acc + x_[0])

            _, acc = jax.lax.fori_loop(0, 20, body, (b0, jnp.float32(0.0)))
            return acc

        t = chain_min(
            lambda: _iluloop(jnp.float32(1e-7), DinvL, lF.Lval, DinvU, uF.Lval, bI),
            iters_per=2,
            chunks=4,
        ) / 20
        gb_ilu = ((m + 1 + nnz) * 4 + 2.0 * nnz * 4) / 1e9
        results.append(
            {
                "metric": "ilu0_apply",
                "value": round(gb_ilu / t, 2),
                "unit": "GB/s(csrilu0_gbyte,amortized)",
                "extra": {
                    "t_apply_us": round(t * 1e6, 1),
                    "factor_native_ms": round(t_factor_native * 1e3, 1),
                    "factor_total_ms": round(t_factor * 1e3, 1),
                    "m": m,
                    "nnz": nnz,
                },
            }
        )
    except Exception as e:
        results.append({"metric": "ilu0_apply", "error": repr(e)[:200]})

    # ---- fused preconditioned GMRES (one dispatch per restart cycle set) ----
    try:
        from aoclsparse_tpu.solvers.fused import pgmres_solve

        mG = 65536
        pG, iG, vG = banded(rng, mG, mG, 16, 9, diag_boost=32.0)
        AG = ast.create_csr(mG, mG, pG, iG, vG)
        bG = rng.standard_normal(mG).astype(np.float32)
        xG, itG, rnG = pgmres_solve(AG, bG, rtol=1e-5, maxit=100, restart=20, precond="ilu0")

        def run_pg():
            xr, it, rn = pgmres_solve(
                AG, bG, rtol=1e-5, maxit=100, restart=20, precond="ilu0"
            )
            return xr

        t = chain_min(run_pg, iters_per=1, chunks=3)
        # per-iteration slope between two fixed budgets (same artifact as
        # the pcg row: the fused solve is one dispatch, so total/iters at
        # small counts reports the tunnel floor)
        slope_g = None
        try:
            ts_g = {}
            for mx in (6, 12):
                xs, it, _ = pgmres_solve(
                    AG, bG, rtol=0.0, atol=0.0, maxit=mx, restart=20, precond="ilu0"
                )
                best = float("inf")
                for _ in range(3):
                    t0s = time.perf_counter()
                    xs, it, _ = pgmres_solve(
                        AG, bG, rtol=0.0, atol=0.0, maxit=mx, restart=20, precond="ilu0"
                    )
                    best = min(best, time.perf_counter() - t0s)
                ts_g[mx] = (best, int(it))
            (tl, il), (th, ih) = ts_g[6], ts_g[12]
            if ih > il:
                slope_g = (th - tl) * 1e3 / (ih - il)
        except Exception:
            slope_g = None
        results.append(
            {
                "metric": "pgmres_ilu0_solve",
                "value": round(t * 1e3 / max(itG, 1), 3),
                "unit": "ms/iter(total/iters: includes the one-dispatch tunnel floor)",
                "extra": {
                    "iters": itG,
                    "t_solve_ms": round(t * 1e3, 1),
                    "resid": float(rnG),
                    "m": mG,
                    "ms_per_iter_slope": None if slope_g is None else round(slope_g, 3),
                },
            }
        )
    except Exception as e:
        results.append({"metric": "pgmres_ilu0_solve", "error": repr(e)[:200]})

    # every row already printed on append (incremental emission)


if __name__ == "__main__":
    main()
